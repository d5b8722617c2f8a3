"""Test bootstrap: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); the real-chip path is exercised by bench.py.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

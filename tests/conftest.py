"""Test bootstrap: force CPU with an 8-device virtual mesh.

Multi-chip sharding is validated on a virtual CPU mesh (no multi-chip TPU
hardware in CI); the real-chip path is exercised by bench.py and the
TPU-gated tests.

Note: this sandbox's sitecustomize registers an `axon` TPU PJRT plugin and
pins JAX_PLATFORMS=axon *before* conftest runs, so plain os.environ edits
are too late — jax.config.update is authoritative as long as no backend has
been initialized yet.
"""

import os

if os.environ.get("GSDF_TEST_TPU") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")

    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}; "
        "run with PYTHONPATH= to disable the axon sitecustomize if this fails"
    )

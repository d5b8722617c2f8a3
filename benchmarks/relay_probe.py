#!/usr/bin/env python3
"""Probe the per-RPC costs of this sandbox's TPU relay.

Quantifies what each small host<->device crossing costs so the mapper's
per-step host work can be budgeted from measurements, not guesses:
  h2d_small     — jnp.asarray of a tiny scalar (what per-step traced
                  scalars like `iteration` pay)
  d2h_scalar    — blocking fetch of a device scalar (what the per-step
                  metrics read pays on top of step completion)
  dispatch      — enqueue cost of an already-compiled trivial jit call
  step_chained  — a mid-size jitted step, states chained, no host fetch
  step_fetched  — same step + a per-step blocking scalar fetch

    python benchmarks/relay_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def timeit(fn, n=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"platform={dev.platform} device={dev}")

    # tiny H2D: a fresh int32 scalar each call (values differ to defeat
    # any constant caching)
    counter = [0]

    def h2d():
        counter[0] += 1
        jnp.int32(counter[0]).block_until_ready()

    t = timeit(h2d)
    print(f"h2d_small: {t * 1e3:.2f} ms")

    x = jnp.float32(1.5)
    jax.block_until_ready(x)

    def d2h():
        np.asarray(x).item()

    t = timeit(d2h)
    print(f"d2h_scalar: {t * 1e3:.2f} ms")

    f = jax.jit(lambda a: a + 1.0)
    y = f(x)
    jax.block_until_ready(y)

    def dispatch():
        f(x)  # no fetch

    t = timeit(dispatch, n=50)
    print(f"dispatch (no fetch): {t * 1e3:.2f} ms")

    # mid-size chained step: [4096, 4096] matmul-ish body
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def step(m):
        return m @ m * 1e-4 + m

    a = step(a)
    jax.block_until_ready(a)

    def chained():
        nonlocal a
        a = step(a)

    t0 = time.perf_counter()
    for _ in range(30):
        chained()
    jax.block_until_ready(a)
    t_chain = (time.perf_counter() - t0) / 30
    print(f"step_chained: {t_chain * 1e3:.2f} ms")

    def fetched():
        nonlocal a
        a = step(a)
        np.asarray(a[0, 0]).item()

    t = timeit(fetched, n=20)
    print(f"step_fetched: {t * 1e3:.2f} ms")

    # async-copy pipeline: dispatch k+1 before reading k's scalar
    def pipelined():
        nonlocal a
        prev = a[0, 0]
        try:
            prev.copy_to_host_async()
        except Exception:
            pass
        a = step(a)
        np.asarray(prev).item()

    t = timeit(pipelined, n=20)
    print(f"step_pipelined_fetch: {t * 1e3:.2f} ms")


def more():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    big = rng.uniform(0, 1, (680, 1200, 3)).astype(np.float32)

    def h2d_big():
        jnp.asarray(big).block_until_ready()
        big[0, 0, 0] += 1e-6  # defeat caching

    t = timeit(h2d_big, n=10)
    print(f"h2d_10MB: {t * 1e3:.2f} ms")

    # depth-2 pipeline: fetch k-2's scalar while k-1, k are in flight
    a = jnp.ones((2048, 2048), jnp.float32)

    @jax.jit
    def step(m):
        return m @ m * 1e-4 + m

    a = step(a)
    jax.block_until_ready(a)
    pend = []

    def pipelined2():
        nonlocal a
        a = step(a)
        s = a[0, 0]
        try:
            s.copy_to_host_async()
        except Exception:
            pass
        pend.append(s)
        if len(pend) > 2:
            np.asarray(pend.pop(0)).item()

    t = timeit(pipelined2, n=40)
    print(f"step_pipelined2_fetch: {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
    more()

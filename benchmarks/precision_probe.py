"""Matmul-pass reduction probe for the grouped blend kernels (round 4).

Hypothesis (docs/PERF.md r3: kernels sit at "DMA+loop floor (1.5 ms) +
matmul issue (~2.8 ms)"): the per-chunk MXU time is dominated by ISSUE
count, and every production matmul runs at Precision.HIGHEST = 6 bf16
passes even though ONE operand of every single contraction is exactly
representable in bf16 (the 0/1 one-hot `oh`, the 0/1 segmented-triangular
`useg`, or products with the 0/1 `applied` mask). Splitting only the f32
operand into hi/mid/lo bf16 terms (24 = 3x8 mantissa bits, an exact
decomposition for normals) gives the SAME f32-exact product in 3 passes;
`eq = oh^T oh` (0/1 x 0/1, integer sums <= 8) is exact in ONE default
pass.

fwd pass count: 48 -> 22;  bwd: 72 -> 34.

Usage: python benchmarks/precision_probe.py [fwd|bwd ...]
"""

from __future__ import annotations

import functools
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchmarks.kernel_probe import (
    build_inputs, chain_bwd, chain_fwd, run_bwd_variant, run_fwd_variant,
    timed,
)
from gsdf_slam_tpu.ops.blend import PIX_PER_TILE
from gsdf_slam_tpu.ops.pallas_blend import PACK, _triu
from gsdf_slam_tpu.ops.pallas_blend_grouped import (
    LOG_T_EPS, _chunk_geom, _onehot, _run_bwd, _run_fwd,
)


def _split3(a):
    """Exact 3-way bf16 split of an f32 array: a == hi + mid + lo."""
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _mm3(a_split, b, dims):
    """f32-exact matmul in 3 MXU passes: a (pre-split f32) x b (exactly
    bf16-representable 0/1 matrix). Products bf16 x bf16 are exact in f32;
    accumulation is f32 on the MXU; lo-to-hi summation order."""
    bh = b.astype(jnp.bfloat16)
    d = lambda x: jax.lax.dot_general(
        x, bh, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    hi, mid, lo = a_split
    return d(lo) + d(mid) + d(hi)


def _mm1(a, b, dims):
    """Single-pass matmul for 0/1 x 0/1 operands (integer-exact in bf16)."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), (dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


D10 = (((1,), (0,)),)[0]
D11 = (((1,), (1,)),)[0]


def _fwd_kernel_p3(ranges_ref, pairs_hbm, accum_ref, teff_ref, traw_ref,
                   ndone_ref, buf_ref, sem, *, grid_w, chunk, group):
    """Production fwd math with 3-pass split matmuls (22 passes/chunk)."""
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = pl.cdiv(n, chunk)
    triu = _triu(chunk)

    def _dma(c_idx, slot):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, chunk)], buf_ref.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _dma(0, 0).start()

    def cond(carry):
        c_idx, log_raw, _, _ = carry
        return jnp.logical_and(c_idx < n_chunks, jnp.max(log_raw) >= LOG_T_EPS)

    def body(carry):
        c_idx, log_raw, log_eff, acc = carry
        slot_i = jax.lax.rem(c_idx, 2)

        @pl.when(c_idx + 1 < n_chunks)
        def _prefetch():
            _dma(c_idx + 1, 1 - slot_i).start()

        _dma(c_idx, slot_i).wait()
        buf = buf_ref[slot_i]
        alpha, _, _, _, _, slot = _chunk_geom(
            buf, g_idx, grid_w, group, c_idx * chunk, n
        )
        oh = _onehot(slot, group, chunk)  # [G, C] 0/1
        eq = _mm1(oh, oh, (((0,), (0,)),)[0])  # [C, C] 0/1
        useg = triu * eq
        log1m = jnp.log1p(-alpha)
        l1m_s = _split3(log1m)  # reused by incl + log_raw + log_eff
        lr_s = _split3(log_raw)
        incl = _mm3(l1m_s, useg, D10)  # [256, C]
        carry_cols = _mm3(lr_s, oh, D10)  # [256, C]
        t_excl = jnp.exp(carry_cols + (incl - log1m))
        applied = (carry_cols + incl >= LOG_T_EPS).astype(jnp.float32)
        w = alpha * t_excl * applied
        col = buf[6:9, :]
        adds = [
            _mm3(_split3(w * col[ch:ch + 1, :]), oh, D11)[:, :, None]
            for ch in range(3)
        ]
        acc = acc + jnp.concatenate(adds, axis=2)
        log_raw = log_raw + _mm3(l1m_s, oh, D11)
        # exact: applied is 0/1, so hi/mid/lo of (log1m*applied) are the
        # split terms of log1m masked by `applied` (masking commutes with
        # the exact split)
        la_s = tuple(t * applied.astype(t.dtype) for t in l1m_s)
        log_eff = log_eff + _mm3(la_s, oh, D11)
        return c_idx + 1, log_raw, log_eff, acc

    init = (
        jnp.int32(0),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group), jnp.float32),
        jnp.zeros((PIX_PER_TILE, group, 3), jnp.float32),
    )
    c_done, log_raw, log_eff, acc = jax.lax.while_loop(cond, body, init)

    @pl.when(c_done < n_chunks)
    def _drain():
        _dma(c_done, jax.lax.rem(c_done, 2)).wait()

    accum_ref[0] = acc
    teff_ref[0] = log_eff
    traw_ref[0] = log_raw
    ndone_ref[0] = jnp.full((1, 1), c_done, jnp.int32)


def _bwd_kernel_p3(ranges_ref, pairs_hbm, traw_ref, ct_acc_ref, ct_teff_ref,
                   zeros_hbm, grads_hbm, done_ref, buf_ref, gbuf_ref, in_sem,
                   out_sem, *, grid_w, chunk, group):
    """Production bwd math with 3-pass split matmuls (34 passes/chunk)."""
    g_idx = pl.program_id(0)
    start = ranges_ref[0, g_idx]
    n = ranges_ref[1, g_idx]
    n_chunks = ranges_ref[2, g_idx]
    triu = _triu(chunk)
    ct_acc = ct_acc_ref[0]  # [256, G, 3]
    ct_eff = ct_teff_ref[0]  # [256, G]
    # loop-invariant splits hoisted out of the chunk loop
    ct_acc_s = [_split3(ct_acc[:, :, ch]) for ch in range(3)]
    ct_eff_s = _split3(ct_eff)

    def _off(i):
        return pl.multiple_of(start + (n_chunks - 1 - i) * chunk, chunk)

    def _in_dma(i, slot):
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(_off(i), chunk)], buf_ref.at[slot], in_sem.at[slot]
        )

    def _out_dma(i, slot):
        return pltpu.make_async_copy(
            gbuf_ref.at[slot], grads_hbm.at[:, pl.ds(_off(i), chunk)], out_sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _prologue():
        _in_dma(0, 0).start()

    def body(i, carry):
        c_idx = n_chunks - 1 - i
        slot_i = jax.lax.rem(i, 2)
        log_end, suffix = carry

        @pl.when(i + 1 < n_chunks)
        def _prefetch():
            _in_dma(i + 1, 1 - slot_i).start()

        _in_dma(i, slot_i).wait()
        buf = buf_ref[slot_i]
        alpha, g_exp, dx, dy, (a, b, c, op), slot = _chunk_geom(
            buf, g_idx, grid_w, group, c_idx * chunk, n
        )
        oh = _onehot(slot, group, chunk)
        eq = _mm1(oh, oh, (((0,), (0,)),)[0])
        useg = triu * eq
        log1m = jnp.log1p(-alpha)
        l1m_s = _split3(log1m)
        log_start = log_end - _mm3(l1m_s, oh, D11)
        incl = _mm3(l1m_s, useg, D10)
        carry_cols = _mm3(_split3(log_start), oh, D10)
        t_excl = jnp.exp(carry_cols + (incl - log1m))
        applied = jnp.where(
            (carry_cols + incl >= LOG_T_EPS) & (alpha > 0.0), 1.0, 0.0
        )
        w = alpha * t_excl * applied

        col = buf[6:9, :]
        ct_cols = [_mm3(ct_acc_s[ch], oh, D10) for ch in range(3)]
        dot_c = (
            col[0:1, :] * ct_cols[0]
            + col[1:2, :] * ct_cols[1]
            + col[2:3, :] * ct_cols[2]
        )
        wc = w * dot_c
        wc_s = _split3(wc)
        per_tile_wc = _mm3(wc_s, oh, D11)  # [256, G]
        seg_total_cols = _mm3(_split3(per_tile_wc), oh, D10)  # [256, C]
        incl_wc = _mm3(wc_s, useg, D10)
        sfx = (seg_total_cols - incl_wc) + _mm3(_split3(suffix), oh, D10)

        inv1m = 1.0 / (1.0 - alpha)
        ct_eff_cols = _mm3(ct_eff_s, oh, D10)
        dl_dalpha = applied * (t_excl * dot_c - (sfx + ct_eff_cols) * inv1m)
        dl_dg = op * dl_dalpha
        gdx = g_exp * dx
        gdy = g_exp * dy
        d_mx = jnp.sum(dl_dg * (-gdx * a - gdy * b), axis=0, keepdims=True)
        d_my = jnp.sum(dl_dg * (-gdy * c - gdx * b), axis=0, keepdims=True)
        d_a = jnp.sum(dl_dg * (-0.5 * g_exp * dx * dx), axis=0, keepdims=True)
        d_b = jnp.sum(dl_dg * (-g_exp * dx * dy), axis=0, keepdims=True)
        d_c = jnp.sum(dl_dg * (-0.5 * g_exp * dy * dy), axis=0, keepdims=True)
        d_op = jnp.sum(g_exp * dl_dalpha, axis=0, keepdims=True)
        d_col = jnp.concatenate(
            [jnp.sum(w * ct_cols[ch], axis=0, keepdims=True) for ch in range(3)],
            axis=0,
        )
        zeros7 = jnp.zeros((PACK - 9, chunk), jnp.float32)

        @pl.when(i >= 2)
        def _drain_prev():
            _out_dma(i - 2, slot_i).wait()

        gbuf_ref[slot_i] = jnp.concatenate(
            [d_mx, d_my, d_a, d_b, d_c, d_op, d_col, zeros7], axis=0
        )
        _out_dma(i, slot_i).start()
        return log_start, suffix + per_tile_wc

    init = (traw_ref[0], ct_eff * 0.0)
    jax.lax.fori_loop(0, n_chunks, body, init)

    @pl.when(n_chunks > 1)
    def _drain_m2():
        _out_dma(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

    @pl.when(n_chunks > 0)
    def _drain_m1():
        _out_dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()

    done_ref[0] = jnp.ones((1, 1), jnp.int32)


def main(names):
    ranges, pairs, ng, gw = build_inputs()
    mpa = pairs.shape[1]
    want = lambda n: not names or n in names
    results = {}

    ref_fwd = jax.jit(
        functools.partial(_run_fwd, ng=ng, grid_w=gw, chunk=128, group=8)
    )(ranges, pairs)

    if want("fwd"):
        run_p3 = functools.partial(run_fwd_variant, _fwd_kernel_p3)
        got = jax.jit(
            functools.partial(run_p3, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges, pairs)
        for nm, r, g in zip(("accum", "teff", "traw", "ndone"), ref_fwd, got):
            d = float(jnp.max(jnp.abs(r.astype(jnp.float32) - g.astype(jnp.float32))))
            print(f"  fwd_p3 parity {nm}: max|d| = {d:.3e}")
        results["fwd"] = timed(
            "fwd (production HIGHEST)", chain_fwd(_run_fwd, ranges, pairs, ng, gw),
            pairs,
        )
        results["fwd_p3"] = timed(
            "fwd_p3 (3-pass split)", chain_fwd(run_p3, ranges, pairs, ng, gw),
            pairs,
        )
    if want("bwd"):
        accum, teff, traw, ndone = ref_fwd
        ranges3 = jnp.concatenate([ranges, ndone[:, 0, 0][None, :]], axis=0)
        rng = np.random.default_rng(0)
        ct_acc = jnp.asarray(rng.standard_normal(accum.shape).astype(np.float32))
        ct_te = jnp.asarray(rng.standard_normal(teff.shape).astype(np.float32))
        run_bp3 = functools.partial(run_bwd_variant, _bwd_kernel_p3)
        ref = jax.jit(
            functools.partial(_run_bwd, mpa=mpa, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges3, pairs, traw, ct_acc, ct_te)
        got = jax.jit(
            functools.partial(run_bp3, mpa=mpa, ng=ng, grid_w=gw, chunk=128, group=8)
        )(ranges3, pairs, traw, ct_acc, ct_te)
        rel = float(jnp.max(jnp.abs(ref - got)) / (jnp.max(jnp.abs(ref)) + 1e-30))
        print(f"  bwd_p3 parity: max rel {rel:.3e}")
        results["bwd"] = timed(
            "bwd (production HIGHEST)",
            chain_bwd(_run_bwd, ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, gw),
            pairs,
        )
        results["bwd_p3"] = timed(
            "bwd_p3 (3-pass split)",
            chain_bwd(run_bp3, ranges3, pairs, traw, ct_acc, ct_te, mpa, ng, gw),
            pairs,
        )
    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main(sys.argv[1:])

"""Fixed-capacity Gaussian model state and densification machinery.

TPU-native redesign of GaussianModel (include/gaussian_model.h:57-175,
src/gaussian_model.cpp). The reference reallocates CUDA tensors whenever the
point set grows or shrinks; under XLA every shape is static, so the model
lives in **capacity-padded [CAP, ...] arrays with a live-prefix invariant**:
slots [0, count) are alive, the rest are dead padding that the rasterizer
culls via the `alive` mask. Densify/clone/split/prune become masked
gather/scatter ("compaction") instead of reallocation — the whole training
step including surgery stays inside one jit.

Parity notes (all cite gaussian_model.cpp):
  * activations exp/normalize/sigmoid (:48-71)
  * createFromPcd computes voxel-dedup indices but DISCARDS the result
    (:146-147, upstream bug) — faithfully kept: no dedup on the first cloud;
  * increasePcd dedups new points against existing voxel hashes with primes
    73856093/19349663/83492791 at 0.05 m (:207-235);
  * scale init log(sqrt(clamp(knn3, 1e-7))), opacity inv_sigmoid(0.1),
    identity quaternions (:165-173);
  * densify clone/split/prune thresholds and the split's N(0, scale) sampling
    with scale/(0.8*N) shrink (:571-665);
  * densificationPostfix zeroes grad-accum/denom/max_radii for ALL points and
    zeroes Adam moments only for the new rows (:492-568);
  * opacity reset min(opacity, 0.01) + moment zeroing (:399-429).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops.knn import knn_mean_dist2_auto
from ..ops.sh import rgb_to_sh
from ..ops.transforms import inverse_sigmoid, quat_to_rotmat
from .optimizer import PARAM_GROUPS, AdamState

VOXEL_SIZE = 0.05  # gaussian_model.cpp:135
_HASH_PRIMES = (73856093, 19349663, 83492791)  # :138-140


@struct.dataclass
class GaussianState:
    """The six trainable tensors + bookkeeping, all [CAP, ...]."""

    xyz: jnp.ndarray  # [C, 3]
    f_dc: jnp.ndarray  # [C, 1, 3]
    f_rest: jnp.ndarray  # [C, R, 3]; R = (sh_degree+1)^2 - 1 (15 at deg 3)
    opacity: jnp.ndarray  # [C, 1] raw (pre-sigmoid)
    scaling: jnp.ndarray  # [C, 3] raw (log)
    rotation: jnp.ndarray  # [C, 4] raw (unnormalized wxyz)
    count: jnp.ndarray  # [] int32 live prefix length
    exist_since_iter: jnp.ndarray  # [C] int32
    max_radii2d: jnp.ndarray  # [C] f32
    xyz_grad_accum: jnp.ndarray  # [C] f32
    denom: jnp.ndarray  # [C] f32

    # -- derived -----------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def alive(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.count

    def scaling_act(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def rotation_act(self) -> jnp.ndarray:
        # eps inside the rsqrt: norm's VJP at exactly 0 is NaN even under a
        # zero cotangent (see ops/sh.py) — keeps dead-slot grads finite.
        n2 = jnp.sum(self.rotation * self.rotation, axis=-1, keepdims=True)
        return self.rotation * jax.lax.rsqrt(n2 + 1e-24)

    def opacity_act(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def params(self) -> dict[str, jnp.ndarray]:
        return {
            "xyz": self.xyz,
            "f_dc": self.f_dc,
            "f_rest": self.f_rest,
            "opacity": self.opacity,
            "scaling": self.scaling,
            "rotation": self.rotation,
        }

    def with_params(self, p: dict[str, jnp.ndarray]) -> "GaussianState":
        return self.replace(
            xyz=p["xyz"],
            f_dc=p["f_dc"],
            f_rest=p["f_rest"],
            opacity=p["opacity"],
            scaling=p["scaling"],
            rotation=p["rotation"],
        )


class SurgeryAux(NamedTuple):
    dropped_for_capacity: jnp.ndarray  # [] int32 appended rows lost to overflow


def voxel_hash(points: jnp.ndarray) -> jnp.ndarray:
    """Spatial hash (gaussian_model.cpp:136-140).

    The reference hashes in int64; JAX defaults to 32-bit, so the products
    wrap — still a valid hash, with a ~1e-3 collision rate at 1e6 voxels
    (a collision only means one new point is wrongly deduped)."""
    vi = jnp.floor(points / VOXEL_SIZE).astype(jnp.int32)
    return (
        vi[:, 0] * _HASH_PRIMES[0]
        + vi[:, 1] * _HASH_PRIMES[1]
        + vi[:, 2] * _HASH_PRIMES[2]
    )


def _isin(query: jnp.ndarray, table: jnp.ndarray, table_valid: jnp.ndarray) -> jnp.ndarray:
    """torch::isin equivalent: membership of query in masked table."""
    sentinel = jnp.int32(0x7FFFFFFF)
    tbl = jnp.sort(jnp.where(table_valid, table, sentinel))
    idx = jnp.searchsorted(tbl, query)
    idx_c = jnp.minimum(idx, tbl.shape[0] - 1)
    return (tbl[idx_c] == query) & (idx < tbl.shape[0])


def _new_point_params(points, colors, valid, iteration, n_rest: int = 15):
    """Shared init for createFromPcd/increasePcd (gaussian_model.cpp:150-196,
    248-297): SH-dc from RGB, zero rest, knn scales, identity rot, 0.1 op.

    `n_rest` sizes features_rest by the configured SH degree like the
    reference ((sh_degree+1)^2-1 rows, gaussian_model.cpp:150-163) — a
    degree-1 model trains/stores 3 rest coefficients, not 15."""
    n = points.shape[0]
    # Exact 3-NN on the host at ingest; windowed Morton approximation under
    # tracing (PARITY D2 closed for the eager path).
    dist2 = jnp.maximum(knn_mean_dist2_auto(points, valid), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    return {
        "xyz": points.astype(jnp.float32),
        "f_dc": rgb_to_sh(colors.astype(jnp.float32))[:, None, :],
        "f_rest": jnp.zeros((n, n_rest, 3), jnp.float32),
        "opacity": opac,
        "scaling": scales,
        "rotation": rots,
    }, jnp.full((n,), iteration, jnp.int32)


def create_from_pcd(
    points: jnp.ndarray,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    capacity: int,
    n_rest: int = 15,
) -> GaussianState:
    """Initialize from the first colorized cloud (createFromPcd :130-199).

    The reference computes voxel-dedup keep_indices but discards them
    (:146-147) — kept faithfully: every valid input point becomes a Gaussian.
    `points`/`colors` are [M, ...] with a validity mask; if more than
    `capacity` points are valid, the excess is dropped (fixed-capacity
    semantics — the host grows capacity and re-ingests if that matters).
    """
    m = points.shape[0]
    # Compact valid points to a prefix (host-free, in-jit).
    order = jnp.argsort(~valid)  # stable: valid first, original order kept
    pts = points[order]
    cols = colors[order]
    vmask = valid[order]
    n = jnp.minimum(jnp.sum(valid), capacity).astype(jnp.int32)
    if m > capacity:
        pts, cols, vmask = pts[:capacity], cols[:capacity], vmask[:capacity]
        m = capacity

    p, exist = _new_point_params(pts, cols, vmask, 0, n_rest=n_rest)

    def pad(a):
        return jnp.zeros((capacity,) + a.shape[1:], a.dtype).at[:m].set(a)

    state = GaussianState(
        xyz=pad(p["xyz"]),
        f_dc=pad(p["f_dc"]),
        f_rest=pad(p["f_rest"]),
        opacity=pad(p["opacity"]),
        scaling=pad(p["scaling"]),
        rotation=pad(p["rotation"]).at[:, 0].set(1.0),
        count=n,
        exist_since_iter=jnp.zeros((capacity,), jnp.int32),
        max_radii2d=jnp.zeros((capacity,), jnp.float32),
        xyz_grad_accum=jnp.zeros((capacity,), jnp.float32),
        denom=jnp.zeros((capacity,), jnp.float32),
    )
    del exist
    return state


def _append(
    state: GaussianState,
    adam: AdamState,
    new_params: dict[str, jnp.ndarray],
    new_exist: jnp.ndarray,
    valid_new: jnp.ndarray,
) -> tuple[GaussianState, AdamState, SurgeryAux]:
    """densificationPostfix (:492-568): scatter new rows after the live
    prefix, zero their Adam moments, reset densification stats for ALL."""
    cap = state.capacity
    rank = jnp.cumsum(valid_new) - 1
    dest = jnp.where(valid_new, state.count + rank, cap)
    dropped = jnp.sum(valid_new & (dest >= cap)).astype(jnp.int32)
    dest = jnp.where(dest >= cap, cap, dest)  # OOB rows -> dropped by XLA

    p = state.params()
    new_p = {
        k: p[k].at[dest].set(new_params[k], mode="drop") for k in PARAM_GROUPS
    }
    m = {k: adam.m[k].at[dest].set(jnp.zeros_like(new_params[k]), mode="drop") for k in PARAM_GROUPS}
    v = {k: adam.v[k].at[dest].set(jnp.zeros_like(new_params[k]), mode="drop") for k in PARAM_GROUPS}
    n_added = jnp.sum(valid_new).astype(jnp.int32) - dropped
    state = state.with_params(new_p).replace(
        count=state.count + n_added,
        exist_since_iter=state.exist_since_iter.at[dest].set(new_exist, mode="drop"),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        denom=jnp.zeros_like(state.denom),
    )
    return state, AdamState(m=m, v=v, step=adam.step), SurgeryAux(dropped)


def _prune(
    state: GaussianState, adam: AdamState, drop: jnp.ndarray
) -> tuple[GaussianState, AdamState]:
    """prunePoints (:431-490): stable compaction of kept rows; Adam moments
    travel with their rows; stats gathered likewise."""
    keep = state.alive & ~drop
    order = jnp.argsort(~keep)  # stable: kept rows first, original order
    n = jnp.sum(keep).astype(jnp.int32)

    def g(a):
        return a[order]

    p = {k: g(v_) for k, v_ in state.params().items()}
    adam = AdamState(
        m={k: g(adam.m[k]) for k in PARAM_GROUPS},
        v={k: g(adam.v[k]) for k in PARAM_GROUPS},
        step=adam.step,
    )
    state = state.with_params(p).replace(
        count=n,
        exist_since_iter=g(state.exist_since_iter),
        max_radii2d=g(state.max_radii2d),
        xyz_grad_accum=g(state.xyz_grad_accum),
        denom=g(state.denom),
    )
    return state, adam


def densify_and_prune(
    state: GaussianState,
    adam: AdamState,
    key: jnp.ndarray,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: int,
    percent_dense: float = 0.01,
    split_n: int = 2,
) -> tuple[GaussianState, AdamState, SurgeryAux]:
    """densifyAndPrune (:644-665): clone + split + prune in one jit.

    Matches the reference sequencing: clone appends first, split appends then
    prunes its originals, finally the opacity/size prune runs over the result.
    """
    alive = state.alive
    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / state.denom, 0.0)
    max_scale = jnp.max(state.scaling_act(), axis=1)

    # --- clone (:614-642): small Gaussians with large view-space gradient.
    sel_clone = alive & (grads >= max_grad) & (max_scale <= percent_dense * extent)
    state, adam, aux1 = _append(
        state, adam, state.params(), state.exist_since_iter, sel_clone
    )

    # --- split (:571-612): large Gaussians with large gradient; N samples
    # from N(0, scale) rotated into world, scale shrunk by 0.8*N.
    alive = state.alive
    grads2 = jnp.where(state.denom > 0, state.xyz_grad_accum / state.denom, 0.0)
    # NOTE: _append zeroed the stats, so grads2 is 0 — the reference has the
    # same property: densifyAndSplit reuses the grads tensor computed BEFORE
    # cloning (padded with zeros for the new clones, :577-581). Replicate by
    # padding the pre-clone grads to the current count.
    del grads2
    max_scale2 = jnp.max(state.scaling_act(), axis=1)
    padded_grads = jnp.where(
        jnp.arange(state.capacity) < (state.count - jnp.sum(sel_clone)), grads, 0.0
    )
    sel_split = alive & (padded_grads >= max_grad) & (
        max_scale2 > percent_dense * extent
    )

    stds = state.scaling_act()  # [C, 3]
    rot = quat_to_rotmat(state.rotation_act())  # [C, 3, 3]
    aux_drop = aux1.dropped_for_capacity
    for i in range(split_n):
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, stds.shape) * stds
        new_xyz = jnp.einsum("nij,nj->ni", rot, eps, precision="highest") + state.xyz
        new_p = {
            "xyz": new_xyz,
            "f_dc": state.f_dc,
            "f_rest": state.f_rest,
            "opacity": state.opacity,
            "scaling": jnp.log(state.scaling_act() / (0.8 * split_n)),
            "rotation": state.rotation,
        }
        state, adam, aux_i = _append(
            state, adam, new_p, state.exist_since_iter, sel_split
        )
        aux_drop = aux_drop + aux_i.dropped_for_capacity
    state, adam = _prune(state, adam, sel_split)

    # --- prune (:655-662): transparent, huge-on-screen, huge-in-world.
    prune_mask = state.alive & (state.opacity_act()[:, 0] < min_opacity)
    if max_screen_size:
        big_vs = state.max_radii2d > max_screen_size
        big_ws = jnp.max(state.scaling_act(), axis=1) > 0.1 * extent
        prune_mask = prune_mask | (state.alive & (big_vs | big_ws))
    state, adam = _prune(state, adam, prune_mask)
    return state, adam, SurgeryAux(aux_drop)


def increase_pcd(
    state: GaussianState,
    adam: AdamState,
    points: jnp.ndarray,
    colors: jnp.ndarray,
    valid: jnp.ndarray,
    iteration: jnp.ndarray,
) -> tuple[GaussianState, AdamState, SurgeryAux]:
    """increasePcd (:207-317): voxel-hash dedup vs existing Gaussians, then
    append with fresh scale/opacity init."""
    new_hash = voxel_hash(points)
    exists = _isin(new_hash, voxel_hash(state.xyz), state.alive)
    keep = valid & ~exists
    new_p, exist = _new_point_params(
        points, colors, keep, iteration, n_rest=state.f_rest.shape[1]
    )
    return _append(state, adam, new_p, exist, keep)


@jax.jit
def prune_young(
    state: GaussianState,
    adam: AdamState,
    iteration: jnp.ndarray,
    stable_num_iter: jnp.ndarray,
) -> tuple[GaussianState, AdamState]:
    """Loop-closure-era existence pruning: drop Gaussians younger than
    `stable_num_iter` iterations.

    The reference tracks creation iteration in exist_since_iter_
    (include/gaussian_model.h:151) and carries the stable_num_iter_existence_
    gate (include/gaussian_mapper.h:275, Mapper.stable_num_iter_existence in
    every SLAM config); after a large pose correction the not-yet-stable
    Gaussians were optimized against now-wrong poses and are removed.
    """
    young = state.alive & (
        state.exist_since_iter > iteration - stable_num_iter
    )
    return _prune(state, adam, young)


def reset_opacity(
    state: GaussianState, adam: AdamState
) -> tuple[GaussianState, AdamState]:
    """resetOpacity (:399-408) + replaceTensorToOptimizer (:410-429)."""
    new_op = inverse_sigmoid(jnp.minimum(state.opacity_act(), 0.01))
    new_op = jnp.where(state.alive[:, None], new_op, state.opacity)
    adam = AdamState(
        m={**adam.m, "opacity": jnp.zeros_like(adam.m["opacity"])},
        v={**adam.v, "opacity": jnp.zeros_like(adam.v["opacity"])},
        step=adam.step,
    )
    return state.replace(opacity=new_op), adam


def add_densification_stats(
    state: GaussianState,
    means2d_grad: jnp.ndarray,  # [C, 2] pixel-space grad from the rasterizer
    radii: jnp.ndarray,  # [C] int32
    width: int,
    height: int,
) -> GaussianState:
    """addDensificationStats (:667-681) + max_radii2D update
    (gaussian_mapper.cpp:443-447).

    The reference accumulates the norm of the NDC-convention screen gradient
    (backward.cu multiplies the pixel-space gradient by 0.5*W / 0.5*H before
    storing, backward.cu:552-555 ddelx_dx); our rasterizer reports pixel-space
    gradients, so the scaling happens here.
    """
    visible = radii > 0
    g = means2d_grad * jnp.array([0.5 * width, 0.5 * height], jnp.float32)
    norm = jnp.linalg.norm(g, axis=-1)
    return state.replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(visible, norm, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(
            visible,
            jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d,
        ),
    )


def with_capacity(state: GaussianState, adam: AdamState, new_cap: int):
    """Host-side re-capacity (grow the padded buffers; triggers recompile)."""
    def grow(a):
        pad = [(0, new_cap - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, pad)

    p = {k: grow(v) for k, v in state.params().items()}
    state = state.with_params(p).replace(
        exist_since_iter=grow(state.exist_since_iter),
        max_radii2d=grow(state.max_radii2d),
        xyz_grad_accum=grow(state.xyz_grad_accum),
        denom=grow(state.denom),
    )
    adam = AdamState(
        m={k: grow(v) for k, v in adam.m.items()},
        v={k: grow(v) for k, v in adam.v.items()},
        step=adam.step,
    )
    return state, adam

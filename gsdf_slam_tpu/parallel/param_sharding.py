"""Multi-chip training: SHARDING the Gaussian buffer across a device mesh.

The third parallelism axis — the SURVEY §2.3 TP row ("shard the Gaussian
buffer dim over chips if >HBM; gather-by-tile at render"). Where
`parallel/sharding.py` replicates the state and shards VIEWS (throughput)
and `parallel/tile_sharding.py` replicates the state and shards TILES
(latency), this shards the STATE: chip d owns Gaussian rows
[d*C/n, (d+1)*C/n) of every parameter, optimizer-moment, and stats array.

Why it exists: the per-Gaussian training footprint is ~3x the parameters
(param + Adam m + v = 59*3 f32 ≈ 708 B/Gaussian, plus stats) — replicated,
a 10M-Gaussian city-scale map (KITTI mode) costs ~7 GB/chip of pure state.
Sharded, each chip holds 1/n of that; what gets replicated at render time
is only the compact screen-space payload (`ops.projection.Preprocessed` +
activated opacity: 16 f32 = 64 B/Gaussian), which is also all a render
READS. The reference cannot express this at all (single GPU, realloc'd
torch tensors, include/gaussian_model.h:142-151).

Mechanics (one `shard_map`, XLA collectives over ICI):
  1. chip d runs activations + `preprocess` on its LOCAL shard (elementwise
     per Gaussian — embarrassingly parallel, n-times less work per chip),
  2. `all_gather` the per-shard Preprocessed payload into the full
     [C, 16-f32] table (tiled on the Gaussian dim),
  3. render its tile-row band of the frame from the full payload
     (ops.rasterize.render_preprocessed + band_view — compute ALSO divides
     by n), `all_gather` the bands, take the exact full-frame loss,
  4. backward: the image-gather transpose routes each band's cotangent to
     its producer; the payload-gather transpose (psum_scatter) routes every
     band's payload cotangents back to the OWNING shard — so each chip ends
     holding the full-frame gradient of exactly its own rows, no extra
     collective,
  5. Adam runs on the local shard (ZeRO-style: optimizer state never
     replicated); densification stats accumulate on local rows.

Under `shard_map(check_vma=False)` psum/pmean transpose to psum, so every
device's (identical) loss contributes a full-scale cotangent and the
local-row gradients arrive exactly n_dev-fold — one division restores the
exact single-chip gradient (asserted bit-near by test_param_sharding.py;
same subtlety as parallel/tile_sharding.py).

Surgery (densify/prune/ingest) is a rare host-gated event; do it via
`gather_state` -> single-logical-device ops -> `shard_state_to_mesh`
(the mapper's cadence is every `densification_interval` iterations, so the
gather cost amortizes to noise).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OptimizationParams
from ..models.gaussian_model import GaussianState, add_densification_stats
from ..models.optimizer import AdamState, adam_step, group_lrs
from ..ops.losses import mapper_loss
from ..ops.projection import Preprocessed, preprocess
from ..ops.rasterize import RasterizeConfig, render_preprocessed
from ..ops.transforms import CameraMatrices

try:  # JAX >= 0.7 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore


def _row_sharded_specs(tree: Any, capacity: int, axis: str):
    """P(axis) for [capacity, ...] leaves, replicated P() otherwise."""
    return jax.tree.map(
        lambda x: P(axis)
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == capacity
        else P(),
        tree,
    )


def shard_state_to_mesh(mesh: Mesh, tree: Any, capacity: int, axis: str = "dp"):
    """Place a GaussianState/AdamState pytree row-sharded on the mesh.

    Every [capacity, ...] leaf splits along the Gaussian dim; scalars
    (count, Adam step) replicate. `capacity` must divide by the mesh size.
    """
    n = mesh.devices.size
    if capacity % n != 0:
        raise ValueError(f"capacity {capacity} not divisible by mesh size {n}")
    specs = _row_sharded_specs(tree, capacity, axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def gather_state(tree: Any) -> Any:
    """Bring a sharded pytree back to single-logical-device (for surgery)."""
    return jax.tree.map(lambda x: jnp.asarray(jax.device_get(x)), tree)


def make_param_sharded_train_step(
    mesh: Mesh,
    cfg: RasterizeConfig,
    opt: OptimizationParams,
    capacity: int,
    axis: str = "dp",
    accumulate_stats: bool = True,
):
    """Build a jitted Gaussian-sharded train step over `mesh` (1-D).

    Call signature of the returned function matches
    parallel/tile_sharding.make_tile_sharded_train_step:
      step(state, adam, cam, gt_image, mask, bg, iteration,
           spatial_lr_scale, live=None, active_sh_degree=None)
    with `state`/`adam` row-sharded via `shard_state_to_mesh`. Returns
    (state, adam, StepMetrics) with the outputs sharded the same way;
    metrics.total_pairs is the largest band's pair count (cfg.max_pairs is
    the per-band capacity, as in tile_sharding).
    """
    from ..engine.train import LiveOptValues, StepMetrics  # noqa: F401
    from ..ops.losses import psnr as psnr_fn

    n_dev = mesh.devices.size
    if capacity % n_dev != 0:
        raise ValueError(f"capacity {capacity} not divisible by {n_dev}")
    shard = capacity // n_dev
    gw, gh = cfg.grid
    tb = -(-gh // n_dev)  # tile rows per band (ceil); last bands may be void

    def per_device(state, adam, cam, gt, mask, bg, iteration, spatial, live, ash):
        d = jax.lax.axis_index(axis)
        ty0 = (d * tb).astype(jnp.int32)
        # global liveness of the LOCAL rows (state.alive would use local
        # indices: the property can't know this shard starts at row d*shard)
        alive_loc = (d * shard + jnp.arange(shard)) < state.count
        lambda_dssim = opt.lambda_dssim if live is None else live.lambda_dssim
        gather = lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True)

        def loss_fn(params, m2d_loc):
            st = state.with_params(params)
            op_loc = st.opacity_act()[:, 0]
            pre_loc = preprocess(
                st.xyz, st.scaling_act(), st.rotation_act(), op_loc,
                st.f_dc, st.f_rest, alive_loc, cam,
                width=cfg.width, height=cfg.height, sh_degree=cfg.sh_degree,
                scale_modifier=cfg.scale_modifier, means2d_offset=m2d_loc,
                active_sh_degree=ash,
            )
            # shard payloads -> the full [C, ~16 f32] table on every chip
            pre_full = Preprocessed(*(gather(x) for x in pre_loc))
            out = render_preprocessed(
                pre_full, gather(op_loc), bg, cfg, tile_row_band=(ty0, tb)
            )
            full = jax.lax.all_gather(out.image, axis, axis=0, tiled=True)
            img = full[: cfg.height]
            loss = mapper_loss(img, gt, mask, lambda_dssim)
            return jax.lax.pmean(loss, axis), (out, img, pre_loc)

        m2d0 = jnp.zeros((shard, 2), jnp.float32)
        (loss, (out, img, pre_loc)), (g_params, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params(), m2d0)

        # The payload-gather transpose (psum_scatter) already summed every
        # band's contribution to the local rows; the only correction left is
        # the n_dev-fold cotangent fan-in of the replicated loss (module
        # docstring) — a scalar divide, NOT a collective.
        g_params = jax.tree.map(lambda g: g / n_dev, g_params)
        g_m2d = g_m2d / n_dev
        view_psnr = psnr_fn(img, gt)  # replicated
        if accumulate_stats:
            # local rows only: pre_loc.radii is full-image visibility of the
            # shard (band_view never touched it), g_m2d the full-frame
            # screen gradient of the shard
            state = add_densification_stats(
                state, g_m2d, pre_loc.radii, cfg.width, cfg.height
            )
        lrs = group_lrs(opt, 1.0, iteration, live=live)
        lrs["xyz"] = lrs["xyz"] * spatial
        new_params, adam = adam_step(state.params(), g_params, adam, lrs)
        state = state.with_params(new_params)
        pairs = jax.lax.pmax(out.total_pairs, axis)
        metrics = StepMetrics(
            loss=loss, psnr=view_psnr, count=state.count, total_pairs=pairs
        )
        return state, adam, metrics

    # build spec trees from shape skeletons (leaves only need .ndim/.shape)
    class _Skel:
        def __init__(self, shape):
            self.shape = shape
            self.ndim = len(shape)

    def _skel_state():
        r = 15  # any rest width: only shape[0] matters for the spec choice
        return GaussianState(
            xyz=_Skel((capacity, 3)), f_dc=_Skel((capacity, 1, 3)),
            f_rest=_Skel((capacity, r, 3)), opacity=_Skel((capacity, 1)),
            scaling=_Skel((capacity, 3)), rotation=_Skel((capacity, 4)),
            count=_Skel(()), exist_since_iter=_Skel((capacity,)),
            max_radii2d=_Skel((capacity,)), xyz_grad_accum=_Skel((capacity,)),
            denom=_Skel((capacity,)),
        )

    state_specs = _row_sharded_specs(_skel_state(), capacity, axis)
    adam_param_specs = _row_sharded_specs(_skel_state().params(), capacity, axis)
    adam_specs = AdamState(m=adam_param_specs, v=adam_param_specs, step=P())

    fn = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(
            state_specs, adam_specs, P(), P(), P(), P(), P(), P(), P(), P(),
        ),
        out_specs=(state_specs, adam_specs, P()),
        check_vma=False,
    )

    @jax.jit
    def step(
        state: GaussianState,
        adam: AdamState,
        cam: CameraMatrices,
        gt_image: jnp.ndarray,
        mask: jnp.ndarray | None,
        bg: jnp.ndarray,
        iteration: jnp.ndarray,
        spatial_lr_scale: jnp.ndarray,
        live=None,
        active_sh_degree: jnp.ndarray | None = None,
    ):
        if mask is None:
            mask = jnp.ones((1, 1), jnp.float32)
        return fn(
            state, adam, cam, gt_image, mask, bg, iteration,
            spatial_lr_scale, live, active_sh_degree,
        )

    return step, n_dev

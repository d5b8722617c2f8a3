"""GaussianMapper: the streaming training orchestrator.

Host-side re-design of GaussianMapper (include/gaussian_mapper.h:102-177,
src/gaussian_mapper.cpp). The division of labor is the TPU-native one: all
per-iteration math lives in jitted XLA programs (engine/train.py,
models/gaussian_model.py); the mapper owns policy and IO —

  * the streaming `run()` loop (gaussian_mapper.cpp:160-333): per frame,
    ingest the colorized cloud (create/increase), register a keyframe whose
    pose is the inverse of the loader's camera pose, then train once;
  * shuffled times-of-use keyframe sampling (:503-606);
  * Gaussian-pyramid level scheduling (:351-369) — each level gets its own
    compiled train step (static shapes per resolution);
  * densify / opacity-reset cadence (:449-461) with host-side capacity
    growth (the XLA replacement for CUDA tensor reallocation);
  * sky masking: a precomputed mask image or an optional ONNX skyseg
    session (:221-272) — gated, since onnxruntime is optional;
  * results: 3DGS-format PLY + cameras.json + cfg_args (:659-775).
"""

from __future__ import annotations

import json
import math
import random
from collections import OrderedDict
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OptimizationParams
from ..data.loader import DataLoader, FrameData
from ..io.ply import (
    gaussians_to_ply_dict,
    ply_dict_to_gaussians,
    read_ply,
    write_ply,
    write_sparse_points_ply,
)
from ..models.gaussian_model import (
    GaussianState,
    create_from_pcd,
    densify_and_prune,
    increase_pcd,
    prune_young,
    reset_opacity,
    with_capacity,
)
from ..models.optimizer import AdamState
from ..ops.rasterize import RasterizeConfig
from ..ops.transforms import CameraMatrices
from .keyframe import Camera, Keyframe, rot_to_quat_wxyz
from .scene import Scene
from .settings import MapperSettings
from .train import LiveOptValues, render_depth_state, render_state, train_step

# Sentinel returned by _single_step_phase when the step was dispatched but
# its metrics are still in flight (settings.metrics_pipeline_depth > 0).
_PENDING = object()


class GaussianMapper:
    def __init__(
        self,
        settings: MapperSettings | None = None,
        dataloader: DataLoader | None = None,
        result_dir: str | Path | None = None,
        capacity: int = 1 << 18,
        max_pairs: int = 1 << 20,
        ingest_capacity: int = 1 << 16,
        seed: int = 0,
        sky_mask: np.ndarray | None = None,
        mesh=None,
        mesh_axis: str = "view",  # "view" (throughput) | "tile" (latency)
        backend: str = "auto",  # RasterizeConfig.backend ("xla"/"pallas")
    ):
        if mesh_axis not in ("view", "tile", "view_tile"):
            raise ValueError(
                "mesh_axis must be 'view', 'tile' or 'view_tile', "
                f"got {mesh_axis!r}"
            )
        if mesh_axis == "view_tile" and mesh is not None and (
            getattr(mesh, "axis_names", None) != ("dp", "tile")
        ):
            raise ValueError(
                "mesh_axis='view_tile' needs a 2-D mesh with axes "
                "('dp', 'tile') — build one with "
                f"parallel.make_view_tile_mesh; got {mesh.axis_names!r}"
            )
        self.backend = backend
        self.settings = settings or MapperSettings()
        self.dataloader = dataloader
        self.result_dir = Path(result_dir) if result_dir else None
        self.capacity = capacity
        self.max_pairs = max_pairs
        self.ingest_capacity = ingest_capacity
        # Pre-sizing from config (see MapperSettings): start at the expected
        # working-set size instead of growing through recompiles.
        if self.settings.presize_capacity:
            while self.capacity < self.settings.presize_capacity:
                self.capacity *= 2
        if self.settings.presize_max_pairs:
            grain = 1 << 14
            self.max_pairs = max(
                grain,
                (self.settings.presize_max_pairs + grain - 1) // grain * grain,
            )
        self.sky_mask = sky_mask  # [H, W] bool, True = sky (blacked out)
        # Live sky-segmentation inference (gaussian_mapper.cpp:57-66,
        # 221-272) through the in-repo ONNX executor; the precomputed
        # sky_mask above takes precedence when both are configured.
        self.sky_segmenter = None
        if self.settings.skyseg_onnx_path:
            from ..skyseg import SkySegmenter

            self.sky_segmenter = SkySegmenter(self.settings.skyseg_onnx_path)

        self.scene = Scene()
        self.state: GaussianState | None = None
        self.adam: AdamState | None = None
        self.iteration = 0
        self.initial_mapped = False
        self.ema_loss = 0.0
        self.spatial_lr_scale = 1.0
        self._rng = random.Random(seed)
        self._key = jax.random.PRNGKey(seed)
        self._kfid_shuffle: list[int] = []
        self._kfid_shuffle_idx = 0
        self.kfs_used_times: dict[int, int] = {}
        # Device-resident image cache (gt + masks), byte-budgeted LRU: the
        # relay uploads ~14 MB/s (benchmarks/relay_probe.py), so re-uploading
        # an evicted full-res gt costs ~0.7 s — far more than holding every
        # (keyframe, level) image on-chip. Keyed (kind, fid, level); images
        # are immutable after ingest.
        self._img_cache: OrderedDict[tuple, jnp.ndarray] = OrderedDict()
        self._img_cache_nbytes = 0
        # Cached device scalars (each fresh tiny upload costs ~0.4 ms over
        # the relay; these change rarely or never within a run).
        self._live_dev = None
        self._live_key = None
        self._static_opt_cache: dict = {}
        self._bg_dev: dict[bool, jnp.ndarray] = {}
        self._ones_mask_dev: dict[tuple[int, int], jnp.ndarray] = {}
        self._slr_dev = None
        self._slr_key = None
        self._ash_dev = None
        self._ash_key = None
        # Pipelined metrics fetch (settings.metrics_pipeline_depth): records
        # of dispatched-but-unresolved train steps, oldest first. _state_gen
        # counts out-of-stream state mutations (ingest/densify/reset/pose/
        # loads): an overflow replay restores a record's pre-step state, so
        # it is only sound while the generation is unchanged since dispatch.
        self._pending: list[dict] = []
        self._last_resolved: dict | None = None
        self._state_gen = 0
        self._stopped = False
        self.auto_size_pairs = bool(self.settings.auto_size_pairs_setting)
        # seed the high-water from the presize so autosizing doesn't
        # immediately shrink a configured budget back down
        self._pairs_high_water = (
            int(self.max_pairs / 1.15) if self.settings.presize_max_pairs else 0
        )
        # cross-step binning persistence: (fid, level) -> entry dict (see
        # _single_step_phase). Entries freeze a pair permutation; any
        # live-set / capacity / pose change invalidates (staleness is then
        # bounded to sub-pixel optimizer drift within rebin_interval uses).
        self._bin_cache: dict = {}
        # setShDegree/oneUpShDegree (gaussian_model.cpp:103-112). The
        # reference's run() forces the max degree every iteration
        # (gaussian_mapper.cpp:375); None means "max" here too.
        self.active_sh_degree: int | None = None
        # Sparse tracker-point accumulator for saveSparsePointsPly
        # (sparse_points_xyz_/color_, include/gaussian_model.h:164-165; the
        # accumulation the reference comments out at gaussian_model.cpp:
        # 237-246 — kept live here, fed only from the SLAM keyframe feed).
        self.sparse_points_xyz: list[np.ndarray] = []
        self.sparse_points_color: list[np.ndarray] = []
        # Monocular inactive-geo densify depth cache (depth_cached_/
        # depth_cache_points_/depth_cache_colors_, include/gaussian_mapper.h:
        # 259-262): pseudo-depth point clouds pooled across keyframes and
        # flushed into increase_pcd every max_depth_cached keyframes.
        self.depth_cached = 0
        self.depth_cache_points: list[np.ndarray] = []
        self.depth_cache_colors: list[np.ndarray] = []
        # Per-camera undistortion (undistort_mask_ maps, gaussian_mapper.cpp:
        # 172-204), built lazily at ingest when distortion is present.
        self._undistorters: dict[int, object] = {}
        self._feed_intrinsics = None  # intrinsics passed via feed_keyframe
        # Multi-chip mode: a jax.sharding.Mesh plus an axis choice.
        # mesh_axis="view" (throughput): every iteration is a view-parallel
        # batched step (n_devices keyframes, pmean'd grads over ICI —
        # parallel/sharding.py). mesh_axis="tile" (latency): the reference's
        # exact 1-view-per-iteration schedule, but each render is split into
        # tile-row bands across the chips (parallel/tile_sharding.py).
        # mesh_axis="view_tile" (both): a 2-D ("dp","tile") mesh — one
        # keyframe per view row, each render banded across the tile axis
        # (parallel/view_tile_sharding.py). Densify/prune and capacity
        # growth run on the replicated state in all modes. SURVEY §5.8
        # design extension.
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self._sharded_steps: dict = {}
        self._tile_steps: dict = {}
        from ..utils.observability import PhaseTimer

        self.timer = PhaseTimer()
        # Compile observability: each fresh jit signature costs minutes over
        # a TPU relay, and they dominated early end-to-end runs (r2's
        # quality run spent ~18x the steady-state step time on recompiles).
        # The report surfaces count + wall share so regressions are visible.
        import time as _time

        self.compile_count = 0
        self.compile_wall = 0.0
        self._wall_start = _time.perf_counter()
        # Background AOT prewarm of the step variants this config will need
        # (fresh/export/cached x accumulate on/off): the first compile of a
        # signature still blocks, but the later variants compile CONCURRENT
        # with training through the persistent XLA cache instead of
        # serially stalling the run at densify_until_iter (E2E.json r3:
        # 82% of cold wall was 4 sequential relay compiles). Disable with
        # GSDF_PREWARM=0.
        import os as _os

        self._prewarm_enabled = _os.environ.get("GSDF_PREWARM", "1") != "0"
        self._prewarm_pool = None
        self._prewarm_futs: dict = {}
        self._prewarm_done: set = set()
        # observability: variants the background prewarm actually compiled,
        # and failure classes already reported (log once per class — a
        # silent `except: pass` here cost r3's cold-start fix its proof,
        # VERDICT r4 item 3)
        self._prewarm_compiled: list = []
        self._prewarm_failed: set = set()

    # ------------------------------------------------------------------ run
    def run(self) -> None:
        """Streaming mapping over the whole dataset (run(), :160-333)."""
        assert self.dataloader is not None, "run() needs a dataloader"
        n = len(self.dataloader)
        for i in range(n):
            if self._stopped:
                break
            frame = self.dataloader.get_item(i)
            self.ingest_frame(i, frame)
            self.train_for_one_iteration()
        self.flush_metrics()

    def signal_stop(self) -> None:
        self._stopped = True

    # --------------------------------------------------------------- ingest
    def ingest_frame(self, fid: int, frame: FrameData) -> Keyframe:
        """Register camera+keyframe and grow the model from the new cloud.

        Deliberately does NOT flush in-flight pipelined steps: in the
        streaming 1-iteration-per-frame mode this host-side work (undistort,
        pyramid, colorize, dedup) overlaps the previous step's device time.
        An in-flight overflow that would need a replay across this mutation
        is detected via _state_gen and accepted lossily instead."""
        intr = self.dataloader.frames.intrinsics if self.dataloader else None
        if intr is None:
            intr = self._feed_intrinsics
        h, w = frame.image.shape[:2]
        if intr is not None:
            cam = Camera(fid, intr.fx, intr.fy, intr.cx, intr.cy, w, h)
        else:
            cam = Camera(fid, w / 2.0, w / 2.0, w / 2.0, h / 2.0, w, h)
        self.scene.add_camera(cam)

        image = frame.image
        mask = None

        # Undistortion (gaussian_mapper.cpp:172-204, camera.h:72-105): when
        # the camera carries distortion, build remap maps + the white-image
        # mask once per camera, train on the undistorted image, and mask the
        # black remap edges out of the loss (:415-417).
        dist = getattr(intr, "dist", None) if intr is not None else None
        cam_model = getattr(intr, "model", "pinhole") if intr is not None else "pinhole"
        if dist is not None and np.any(np.asarray(dist) != 0):
            # cache key = the actual camera geometry (camera_id is the
            # per-frame fid here, which would rebuild the maps every frame)
            key = (cam.fx, cam.fy, cam.cx, cam.cy, w, h, cam_model,
                   np.asarray(dist, np.float64).tobytes())
            und = self._undistorters.get(key)
            if und is None:
                from .camera_undistort import UndistortRectifier

                k = np.array(
                    [[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1]],
                    np.float64,
                )
                und = UndistortRectifier(
                    k, np.asarray(dist, np.float64), w, h, model=cam_model
                )
                self._undistorters[key] = und
            image = und.undistort(image).astype(np.float32)
            mask = und.mask

        sky = None
        if self.sky_mask is not None:
            sky = self.sky_mask
        elif self.sky_segmenter is not None:
            sky = self.sky_segmenter(image)
        if sky is not None:
            if sky.shape[:2] != image.shape[:2]:
                import cv2

                sky = cv2.resize(
                    sky.astype(np.uint8), (image.shape[1], image.shape[0]),
                    interpolation=cv2.INTER_NEAREST,
                ).astype(bool)
            image = np.where(sky[..., None], 0.0, image).astype(np.float32)
            # KITTI-mode quirk (gaussian_mapper.cpp:273-275): the training
            # mask is the masked image itself, tested as mask > 0.
            sky_keep = (~sky).astype(np.float32)
            mask = sky_keep if mask is None else mask * sky_keep

        t_cw = np.linalg.inv(frame.cam_pose.astype(np.float64)).astype(np.float32)
        kf = Keyframe(
            fid=fid,
            camera=cam,
            t_cw=t_cw,
            image=image,
            mask=mask,
            created_at_iter=self.iteration,
            remaining_times_of_use=self.settings.new_keyframe_times_of_use,
        )
        if self.settings.do_gaus_pyramid_training:
            import cv2

            nl = self.settings.num_gaus_pyramid_sub_levels
            kf.pyramid_times_of_use = [
                self.settings.gaus_pyramid_sub_level_times_of_use
            ] * nl
            for lvl in range(nl):
                f = 0.5 ** (nl - lvl)
                lw, lh = int(w * f), int(h * f)
                kf.pyramid_images.append(
                    cv2.resize(image, (lw, lh)).astype(np.float32)
                )
                if mask is not None:
                    # gaus_pyramid_undistort_mask_ (camera.h:103-105): the
                    # loss mask exists at every pyramid level, not just
                    # full resolution.
                    kf.pyramid_masks.append(
                        cv2.resize(
                            mask, (lw, lh), interpolation=cv2.INTER_NEAREST
                        ).astype(np.float32)
                    )
        self.scene.add_keyframe(kf)
        self._kfid_shuffle = []  # re-shuffle on next sample

        pts, cols, valid = self._pad_cloud(frame.points, frame.colors)
        if not self.initial_mapped:
            _, self.scene.cameras_extent = self.scene.nerfpp_norm()
            self.spatial_lr_scale = max(self.scene.cameras_extent, 1e-6)
            n_rest = (self.settings.model.sh_degree + 1) ** 2 - 1
            self.state = create_from_pcd(
                pts, cols, valid, self.capacity, n_rest=n_rest
            )
            self.adam = AdamState.init(self.state.params())
            self.initial_mapped = True
        else:
            self._ensure_capacity(int(np.sum(np.asarray(valid))))
            self.state, self.adam, aux = increase_pcd(
                self.state, self.adam, pts, cols, valid, jnp.int32(self.iteration)
            )
        self._invalidate_binning_caches()
        return kf

    def _pad_cloud(self, points: np.ndarray, colors: np.ndarray):
        cap = self.ingest_capacity
        m = min(len(points), cap)
        p = np.zeros((cap, 3), np.float32)
        c = np.zeros((cap, 3), np.float32)
        v = np.zeros((cap,), bool)
        p[:m], c[:m], v[:m] = points[:m], colors[:m], True
        return jnp.asarray(p), jnp.asarray(c), jnp.asarray(v)

    def _ensure_capacity(self, incoming: int) -> None:
        count = int(self.state.count)
        while count + incoming > self.state.capacity:
            new_cap = self.state.capacity * 2
            self.state, self.adam = with_capacity(self.state, self.adam, new_cap)
            self.capacity = new_cap
            self._invalidate_binning_caches()

    def _invalidate_binning_caches(self, fid: int | None = None) -> None:
        """Drop frozen pair permutations. Called on every live-set mutation
        (densify/prune/ingest/opacity-reset/capacity/loads) or, with `fid`,
        on a single keyframe's pose update — staleness inside a surviving
        cache is then only per-step optimizer drift."""
        self._state_gen += 1  # see _pending: disallows overflow replays
        if fid is None:
            self._bin_cache.clear()
        else:
            for k in [k for k in self._bin_cache if k[0] == fid]:
                del self._bin_cache[k]

    # ------------------------------------------------------------- sampling
    def _use_one_random_sliding_window_keyframe(self) -> Keyframe | None:
        """useOneRandomSlidingWindowKeyframe (:526-575)."""
        kfs = self.scene.keyframes
        if not kfs:
            return None
        ids = sorted(kfs)
        if not self._kfid_shuffle:
            self._kfid_shuffle = list(range(len(ids)))
            self._rng.shuffle(self._kfid_shuffle)
            self._kfid_shuffle_idx = 0
        start = self._kfid_shuffle_idx
        while True:
            self._kfid_shuffle_idx = (self._kfid_shuffle_idx + 1) % len(
                self._kfid_shuffle
            )
            if self._kfid_shuffle_idx == start:
                for kf in kfs.values():
                    kf.remaining_times_of_use += 1
            kf = kfs[ids[self._kfid_shuffle[self._kfid_shuffle_idx]]]
            if kf.remaining_times_of_use > 0:
                break
        self.kfs_used_times[kf.fid] = self.kfs_used_times.get(kf.fid, 0) + 1
        kf.remaining_times_of_use -= 1
        return kf

    # ------------------------------------------------------------- training
    def _raster_cfg(self, h: int, w: int) -> RasterizeConfig:
        return RasterizeConfig(
            height=h, width=w, sh_degree=self.settings.model.sh_degree,
            max_pairs=self.max_pairs, backend=self.backend,
        )

    # ------------------------------------------------- compile prewarm
    def _variant_plan(self) -> list:
        """(accumulate_stats, binning mode) pairs this config's schedule
        will dispatch (see _dispatch_train_step's staging logic)."""
        s = self.settings
        rebin_d = s.rebin_interval
        rebin_a = s.rebin_interval_after_densify or rebin_d
        plan = []
        plan += (
            [(True, "export"), (True, "cached")] if rebin_d > 1
            else [(True, "fresh")]
        )
        plan += (
            [(False, "export"), (False, "cached")] if rebin_a > 1
            else [(False, "fresh")]
        )
        return plan

    def _abstract_cache(self, cfg: RasterizeConfig):
        """ShapeDtypeStruct skeleton of the BinningCache the cached-step
        variant takes (shapes must match ops/pallas_binning exactly)."""
        import jax

        from ..ops.pallas_binning import mpa_for
        from ..ops.pallas_blend_grouped import BinningCache, compact_cache_len
        from ..ops.projection import tile_grid

        gw, gh = tile_grid(cfg.width, cfg.height)
        ng = -(-(gw * gh) // cfg.pallas_group)
        if cfg.cache_prune_margin and cfg.cache_prune_capacity_factor:
            mpa = compact_cache_len(
                cfg.max_pairs, ng, cfg.pallas_chunk,
                cfg.cache_prune_capacity_factor,
            )
        else:
            mpa = mpa_for(cfg.max_pairs, ng, cfg.pallas_chunk)
        p = self.state.capacity
        i32, f32 = jnp.int32, jnp.float32
        sds = jax.ShapeDtypeStruct
        return BinningCache(
            ranges=sds((2, ng), i32), gid=sds((mpa,), i32),
            slot=sds((mpa,), f32), total_pairs=sds((), i32),
            kept_bounds=sds((p,), i32), compact_overflow=sds((), i32),
        )

    def _launch_prewarm(self, args, kwargs, cfg, current_variant) -> None:
        """AOT-compile the step variants this signature will need later,
        in background daemon threads, so they land in the persistent XLA
        cache while training proceeds (VERDICT r3 item 5: 82% of cold wall
        was sequential relay compiles). The foreground dispatcher waits on
        a variant's in-flight prewarm instead of duplicating the compile."""
        if not self._prewarm_enabled or self.mesh is not None:
            return
        if not (cfg.use_pallas() and cfg.pallas_group > 1):
            return
        import jax as _jax

        if _jax.default_backend() == "cpu":
            # CPU has no persistent cache here (see __init__.py) — a
            # prewarmed executable would be thrown away, pure waste
            return
        sig = (cfg.height, cfg.width, self.state.capacity, cfg.max_pairs)
        if sig in self._prewarm_done:
            return
        self._prewarm_done.add(sig)
        import threading

        import jax

        def _abs(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return jax.ShapeDtypeStruct(x.shape, x.dtype)
            return x

        a_abs = tuple(jax.tree.map(_abs, a) for a in args)
        k_abs = {k: jax.tree.map(_abs, v) for k, v in kwargs.items()}
        abs_cache = self._abstract_cache(cfg)
        sem = getattr(self, "_prewarm_sem", None)
        if sem is None:
            sem = self._prewarm_sem = threading.Semaphore(2)

        def _compile(acc, mode, ev):
            try:
                with sem:
                    kw = dict(k_abs)
                    kw["accumulate_stats"] = acc
                    kw["binning_cache"] = abs_cache if mode == "cached" else None
                    kw["export_binning_cache"] = mode == "export"
                    train_step.lower(*a_abs, **kw).compile()
                    self._prewarm_compiled.append(sig + (acc, mode))
            except Exception as exc:
                # fg compiles normally on a failed/missing prewarm, but a
                # systematically failing prewarm silently reintroduces the
                # serial cold start — surface each failure class once
                cls = type(exc).__name__
                if cls not in self._prewarm_failed:
                    self._prewarm_failed.add(cls)
                    import sys

                    print(
                        f"[gsdf] prewarm({mode}, acc={acc}) failed "
                        f"[{cls}]: {exc}",
                        file=sys.stderr,
                    )
            finally:
                ev.set()

        for acc, mode in self._variant_plan():
            if (acc, mode) == current_variant:
                continue
            key = sig + (acc, mode)
            if key in self._prewarm_futs:
                continue
            ev = threading.Event()
            self._prewarm_futs[key] = ev
            threading.Thread(
                target=_compile, args=(acc, mode, ev), daemon=True,
                name=f"gsdf-prewarm-{mode}",
            ).start()

    def _autosize_pairs(self, observed_total: int) -> None:
        """Right-size the pair capacity: every binning/blend stage scales
        with MAX_PAIRS, so an oversized capacity wastes most of the frame
        (the reference's equivalent knob is the dynamically resized
        binningBuffer, rasterize_points.cu:28-36). Grows eagerly on
        overflow-risk, shrinks lazily; 16k-granular sizes bound recompiles
        to a few dozen over a run while keeping slack ~1.15x (overflow is
        detected on the per-step metrics fetch and the step redone, so the
        slack only absorbs between-frame variation; it is not needed for
        correctness — every mp-sized stage of the pipeline pays ~12 ns/row,
        so tighter slack is a direct throughput win)."""
        if not self.auto_size_pairs:
            return
        self._pairs_high_water = max(self._pairs_high_water, observed_total)
        need = int(self._pairs_high_water * 1.15) + 1
        step = 1 << 14
        size = max(1 << 14, (need + step - 1) // step * step)
        if size > self.max_pairs or size * 2 < self.max_pairs:
            self.max_pairs = size

    def _img_device(self, kind: str, fid: int, level: int, img) -> jnp.ndarray:
        """Byte-budgeted LRU device cache for per-keyframe images."""
        key = (kind, fid, level)
        hit = self._img_cache.get(key)
        if hit is not None:
            self._img_cache.move_to_end(key)
            return hit
        arr = jnp.asarray(img)
        self._img_cache[key] = arr
        self._img_cache_nbytes += arr.nbytes
        budget = self.settings.gt_cache_bytes
        while budget and self._img_cache_nbytes > budget and len(self._img_cache) > 1:
            _, old = self._img_cache.popitem(last=False)
            self._img_cache_nbytes -= old.nbytes
        return arr

    def _gt_device(self, kf: Keyframe, level: int, n_levels: int) -> jnp.ndarray:
        img = kf.image if level >= n_levels else kf.pyramid_images[level]
        return self._img_device("gt", kf.fid, level, img)

    def _mask_device(self, kf: Keyframe, level: int, n_levels: int):
        """Level-appropriate undistort/sky mask on device, or None
        (gaus_pyramid_undistort_mask_, camera.h:103-105)."""
        if level >= n_levels or not kf.pyramid_images:
            src = kf.mask
        elif kf.pyramid_masks:
            src = kf.pyramid_masks[level]
        else:
            src = None
        if src is None:
            return None
        return self._img_device("mask", kf.fid, level, src)

    def _ones_mask_device(self, h: int, w: int) -> jnp.ndarray:
        key = (h, w)
        if key not in self._ones_mask_dev:
            self._ones_mask_dev[key] = jnp.ones((h, w), jnp.float32)
        return self._ones_mask_dev[key]

    def _live_device(self) -> LiveOptValues:
        o = self.settings.opt
        key = (
            o.position_lr_init, o.feature_lr, o.opacity_lr,
            o.scaling_lr, o.rotation_lr, o.lambda_dssim,
        )
        if key != self._live_key:
            self._live_dev = LiveOptValues.from_opt(o)
            self._live_key = key
        return self._live_dev

    def _bg_device(self) -> jnp.ndarray:
        white = bool(self.settings.model.white_background)
        if white not in self._bg_dev:
            self._bg_dev[white] = jnp.ones(3) if white else jnp.zeros(3)
        return self._bg_dev[white]

    def _slr_device(self) -> jnp.ndarray:
        if self._slr_key != self.spatial_lr_scale:
            self._slr_dev = jnp.float32(self.spatial_lr_scale)
            self._slr_key = self.spatial_lr_scale
        return self._slr_dev

    def _ash_device(self):
        if self.active_sh_degree is None:
            return None
        if self._ash_key != self.active_sh_degree:
            self._ash_dev = jnp.int32(self.active_sh_degree)
            self._ash_key = self.active_sh_degree
        return self._ash_dev

    def train_for_one_iteration(self) -> dict | None:
        """trainForOneIteration (:335-468), with densify cadence host-side.

        In mesh mode (mesh_axis="view") the one "iteration" is a
        view-parallel batched step (n_devices keyframes at once, identical
        per-view math); with mesh_axis="tile" it keeps the reference's
        1-view schedule but bands the render across the mesh."""
        if not self.initial_mapped:
            return None
        if self.mesh is not None and self.mesh_axis in ("view", "view_tile"):
            res = self._sharded_step_phase()
        else:
            res = self._single_step_phase()
        if res is None:
            # No keyframe to train on. Drain any in-flight pipelined steps
            # so a caller's "None = stream done" loop can't exit with
            # unresolved metrics (or an unreplayed overflow) in flight.
            self.flush_metrics()
            return None
        if res is _PENDING:
            # Pipelined path: metrics resolve later (FIFO). State-mutating
            # cadence still fires at ITS iteration — but only after draining
            # the pipeline, because an in-flight overflow replay restores a
            # pre-step state and would silently discard the surgery.
            if self._cadence_due(self.iteration):
                self.flush_metrics()
                self._cadence_phase(self.iteration)
            # A step WAS dispatched — never return None (None means "no
            # keyframe to train on"). Before the first resolve, report a
            # pending placeholder.
            if self._last_resolved is not None:
                return self._last_resolved
            return {
                "loss": float("nan"), "psnr": float("nan"),
                "count": -1, "total_pairs": -1, "pending": True,
            }
        loss, psnr_v, count_v, total_pairs = res
        return self._post_step_phase(loss, psnr_v, count_v, total_pairs)

    def _single_step_phase(self):
        kf = self._use_one_random_sliding_window_keyframe()
        if kf is None:
            return None
        self.iteration += 1
        s = self.settings
        # mesh_axis="tile": same 1-view schedule, render banded across the
        # mesh (parallel/tile_sharding.py); binning persistence is
        # full-frame-tile-keyed and therefore disabled in this mode.
        tile_mode = self.mesh is not None and self.mesh_axis == "tile"

        n_levels = s.num_gaus_pyramid_sub_levels
        level = n_levels
        if s.do_gaus_pyramid_training:
            level = kf.current_pyramid_level()
        if level >= n_levels or not kf.pyramid_images:
            h, w = kf.image.shape[:2]
        else:
            h, w = kf.pyramid_images[level].shape[:2]
        gt = self._gt_device(kf, level, n_levels)
        mask = self._mask_device(kf, level, n_levels)
        self._last_kf = kf

        if not tile_mode and s.metrics_pipeline_depth > 0:
            rec = self._dispatch_train_step(
                kf, level, h, w, gt, mask, self.iteration
            )
            # Optimistic binning-cache commit: an overflow surfacing at
            # resolve time replays + invalidates, so a bad entry never
            # survives a resolve.
            self._commit_bin_cache(rec)
            self._pending.append(rec)
            while len(self._pending) > int(s.metrics_pipeline_depth):
                self._resolve_one_pending()
            return _PENDING
        return self._sync_step(kf, level, h, w, gt, mask, tile_mode, self.iteration)

    def _sync_step(self, kf, level, h, w, gt, mask, tile_mode, iteration):
        """Dispatch + blocking metrics fetch, with the lossless overflow
        redo loop: total_pairs > max_pairs means binning DROPPED pairs this
        step (sentinel overflow design, ops/binning.py) — the frame and its
        gradients are wrong, so grow the capacity and redo the step from
        the pre-step state (the reference reallocates its binning buffer
        instead, rasterize_points.cu:28-36)."""
        prev_state, prev_adam = self.state, self.adam
        for _attempt in range(3):
            if tile_mode:
                (loss, psnr_v, count_v, total_pairs), cfg = self._tile_dispatch(
                    kf, gt, mask, h, w, iteration
                )
            else:
                rec = self._dispatch_train_step(kf, level, h, w, gt, mask, iteration)
                cfg = rec["cfg"]
                loss, psnr_v, count_v, total_pairs = self._fetch_metrics(
                    rec["metrics"]
                )
            self._autosize_pairs(total_pairs)
            if total_pairs <= cfg.max_pairs:
                if not tile_mode:
                    self._commit_bin_cache(rec)
                break
            if self.max_pairs <= cfg.max_pairs:
                # capacity cannot grow (autosizing disabled or already at
                # size): keep the frame but say so — its pairs were dropped
                print(
                    f"[mapper] WARNING: pair overflow at iter "
                    f"{iteration} ({total_pairs} > {cfg.max_pairs}) "
                    "with pair autosizing disabled; frame rendered with "
                    "dropped splats"
                )
                break
            print(
                f"[mapper] WARNING: pair overflow at iter {iteration} "
                f"({total_pairs} > {cfg.max_pairs}); growing to "
                f"{self.max_pairs} and re-rendering"
            )
            self.state, self.adam = prev_state, prev_adam
        return loss, psnr_v, count_v, total_pairs

    def _dispatch_train_step(self, kf, level, h, w, gt, mask, iteration) -> dict:
        """Dispatch ONE single-device train step (no host fetch) and return
        its in-flight record. Shared by the synchronous and pipelined paths."""
        import time as _time

        s = self.settings
        cfg = self._raster_cfg(h, w)
        rk = (kf.fid, level)
        # Cross-step binning persistence: reuse this (keyframe, level)'s
        # frozen pair permutation for up to rebin_interval-1 re-renders;
        # rebuild (and snapshot) otherwise. Pallas-path-only; rebuilt
        # whenever capacity/pair-budget/resolution changed underneath.
        use_cache, export_cache = None, False
        rebin = s.rebin_interval
        if s.rebin_interval_after_densify and iteration >= s.opt.densify_until_iter:
            # Staged persistence: post-densification the gaussian set is
            # frozen and drift is one small Adam step per use, so frozen
            # permutations stay accurate far longer (settings.py).
            rebin = s.rebin_interval_after_densify
        if rebin > 1 and cfg.use_pallas() and cfg.pallas_group > 1:
            ent = self._bin_cache.get(rk)
            if (
                ent is not None
                and ent["uses"] < rebin - 1
                and ent["capacity"] == self.state.capacity
                and ent["max_pairs"] == cfg.max_pairs
                and ent["hw"] == (h, w)
            ):
                use_cache = ent["cache"]
            else:
                export_cache = True

        accumulate = iteration < s.opt.densify_until_iter
        static_opt, live = self._static_opt_and_live()
        prev_state, prev_adam = self.state, self.adam
        variant = (
            accumulate,
            "cached" if use_cache is not None
            else ("export" if export_cache else "fresh"),
        )
        _pre_sz = getattr(train_step, "_cache_size", lambda: -1)()
        _t0 = _time.perf_counter()
        # If this variant's AOT prewarm is in flight, wait for it rather
        # than racing a duplicate relay compile; the jit call below then
        # hits the persistent cache. Counted as compile wall either way.
        _ev = self._prewarm_futs.get(
            (cfg.height, cfg.width, prev_state.capacity, cfg.max_pairs)
            + variant
        )
        if _ev is not None and not _ev.is_set():
            _ev.wait()
        _args = (
            prev_state,
            prev_adam,
            kf.camera_matrices(s.z_near, s.z_far),
            gt,
            mask,
            self._bg_device(),
            jnp.int32(iteration),
            self._slr_device(),
            cfg,
            static_opt,
        )
        _kwargs = dict(
            accumulate_stats=accumulate,
            active_sh_degree=self._ash_device(),
            live=live,
            binning_cache=use_cache,
            export_binning_cache=export_cache,
        )
        with self.timer.phase("train_step"):
            res = train_step(*_args, **_kwargs)
        built_cache = None
        if export_cache:
            self.state, self.adam, metrics, built_cache = res
        else:
            self.state, self.adam, metrics = res
        if getattr(train_step, "_cache_size", lambda: -1)() > _pre_sz:
            self.compile_count += 1
            self.compile_wall += _time.perf_counter() - _t0
            self._launch_prewarm(_args, _kwargs, cfg, variant)
        # Start the D2H of this step's metrics now so a later (pipelined)
        # read finds them already landed: a blocking read of an in-flight
        # scalar costs ~30 ms of relay round-trip, of a landed one ~0.01 ms
        # (benchmarks/relay_probe.py).
        for x in (metrics.loss, metrics.psnr, metrics.count, metrics.total_pairs):
            try:
                x.copy_to_host_async()
            except Exception:  # backends without async host copies
                pass
        return {
            "kf": kf, "level": level, "h": h, "w": w, "gt": gt, "mask": mask,
            "cfg": cfg, "rk": rk, "iteration": iteration,
            "pre_state": prev_state, "pre_adam": prev_adam,
            "export_cache": export_cache, "used_cache": use_cache is not None,
            "built_cache": built_cache, "capacity": self.state.capacity,
            "metrics": metrics, "gen": self._state_gen,
        }

    def _tile_dispatch(self, kf, gt, mask, h, w, iteration):
        """One tile-banded (mesh_axis='tile') step + blocking fetch."""
        import time as _time

        s = self.settings
        cfg = self._raster_cfg(h, w)
        accumulate = iteration < s.opt.densify_until_iter
        static_opt, live = self._static_opt_and_live()
        skey = (cfg, static_opt, accumulate)
        stepper = self._tile_steps.get(skey)
        if stepper is None:
            from ..parallel.tile_sharding import make_tile_sharded_train_step

            stepper, _ = make_tile_sharded_train_step(
                self.mesh, cfg, static_opt,
                axis=self.mesh.axis_names[0],
                accumulate_stats=accumulate,
            )
            self._tile_steps[skey] = stepper
        _pre_sz = getattr(stepper, "_cache_size", lambda: -1)()
        _t0 = _time.perf_counter()
        with self.timer.phase("train_step"):
            self.state, self.adam, metrics = stepper(
                self.state,
                self.adam,
                kf.camera_matrices(s.z_near, s.z_far),
                gt,
                mask,
                self._bg_device(),
                jnp.int32(iteration),
                self._slr_device(),
                live,
                self._ash_device(),
            )
        if getattr(stepper, "_cache_size", lambda: -1)() > _pre_sz:
            self.compile_count += 1
            self.compile_wall += _time.perf_counter() - _t0
        return self._fetch_metrics(metrics), cfg

    def _commit_bin_cache(self, rec: dict) -> None:
        if rec["export_cache"] and rec["built_cache"] is not None:
            # a compacted pruned cache that couldn't fit its live pairs is
            # unusable (clamped counts = missing splats) — drop it and let
            # the block re-bin fresh (build_pruned_cache)
            ov = getattr(rec["built_cache"], "compact_overflow", None)
            if ov is not None and int(ov):
                if not getattr(self, "_warned_cache_overflow", False):
                    self._warned_cache_overflow = True
                    print(
                        "[mapper] compacted binning cache overflowed its "
                        "reduced capacity; falling back to fresh binning "
                        "for this block (raise RasterizeConfig."
                        "cache_prune_capacity_factor if this persists)"
                    )
                return
            self._bin_cache[rec["rk"]] = {
                "cache": rec["built_cache"],
                "uses": 0,
                "capacity": rec["capacity"],
                "max_pairs": rec["cfg"].max_pairs,
                "hw": (rec["h"], rec["w"]),
            }
            while len(self._bin_cache) > 32:  # bound HBM held by caches
                self._bin_cache.pop(next(iter(self._bin_cache)))
        elif rec["used_cache"]:
            ent = self._bin_cache.get(rec["rk"])
            if ent is not None:
                ent["uses"] += 1

    @staticmethod
    def _fetch_metrics(metrics):
        return tuple(
            np.asarray(x).item()
            for x in jax.device_get(
                (metrics.loss, metrics.psnr, metrics.count, metrics.total_pairs)
            )
        )

    def _resolve_one_pending(self) -> None:
        """Resolve the oldest in-flight step: fetch its metrics, autosize,
        and — on a pair overflow — restore its pre-step state and replay it
        plus every later in-flight step synchronously (the same lossless
        semantics as the synchronous redo loop, one resolve later)."""
        rec = self._pending.pop(0)
        loss, psnr_v, count_v, total_pairs = self._fetch_metrics(rec["metrics"])
        self._autosize_pairs(total_pairs)
        mp = rec["cfg"].max_pairs
        if total_pairs > mp:
            self._bin_cache.pop(rec["rk"], None)  # built from dropped pairs
            if self.max_pairs > mp and rec["gen"] != self._state_gen:
                # State was mutated out-of-stream (ingest/densify/pose)
                # after this dispatch: restoring its pre-step state would
                # discard that mutation. Accept the dropped-pairs frame —
                # the grown pair budget protects the following steps.
                print(
                    f"[mapper] WARNING: pair overflow at iter "
                    f"{rec['iteration']} ({total_pairs} > {mp}) resolved "
                    "after a state mutation; frame kept with dropped "
                    f"splats, budget grown to {self.max_pairs}"
                )
            elif self.max_pairs > mp:
                later = list(self._pending)
                self._pending = []
                print(
                    f"[mapper] WARNING: pair overflow at iter "
                    f"{rec['iteration']} ({total_pairs} > {mp}); growing to "
                    f"{self.max_pairs} and replaying {1 + len(later)} "
                    "in-flight steps"
                )
                self.state, self.adam = rec["pre_state"], rec["pre_adam"]
                self._invalidate_binning_caches()
                for r in [rec] + later:
                    out = self._sync_step(
                        r["kf"], r["level"], r["h"], r["w"], r["gt"],
                        r["mask"], False, r["iteration"],
                    )
                    self._consume_metrics(r["iteration"], *out, kf=r["kf"])
                return
            else:
                print(
                    f"[mapper] WARNING: pair overflow at iter "
                    f"{rec['iteration']} ({total_pairs} > {mp}) with pair "
                    "autosizing disabled; frame rendered with dropped splats"
                )
        self._consume_metrics(
            rec["iteration"], loss, psnr_v, count_v, total_pairs, kf=rec["kf"]
        )

    def flush_metrics(self) -> None:
        """Resolve every in-flight pipelined step (metrics_pipeline_depth).
        Called before any host action that reads or mutates the model state
        (densify cadence, ingest, pose updates, checkpointing, loads)."""
        while self._pending:
            self._resolve_one_pending()

    def _static_opt_and_live(self):
        """Live-mutable hyperparameters travel as traced scalars; the static
        `opt` key has them normalized to 0.0 so viewer slider edits never
        change the jit cache key (no ~100s+ recompile per drag)."""
        import dataclasses as _dc

        s = self.settings
        live = self._live_device()
        static_opt = self._static_opt_cache.get(id(s.opt))
        if static_opt is None:
            static_opt = _dc.replace(
                s.opt,
                position_lr_init=0.0, feature_lr=0.0, opacity_lr=0.0,
                scaling_lr=0.0, rotation_lr=0.0, lambda_dssim=0.0,
            )
            if len(self._static_opt_cache) > 8:
                self._static_opt_cache.clear()
            self._static_opt_cache[id(s.opt)] = static_opt
        return static_opt, live

    def _sharded_step_phase(self):
        """View-parallel batched step: n_devices keyframes per iteration.

        Pyramid sub-level scheduling is batch-uniform here: SPMD needs one
        static shape per step, so the whole batch trains at the level the
        FIRST sampled keyframe's scheduler picks (each other view's budget
        at that level is consumed too, when it has any left). The aggregate
        low-res-first cadence of getCurrentGausPyramidLevel
        (gaussian_keyframe.cpp:234-246) is preserved; per-view level
        divergence is not — a per-view policy cannot batch across a mesh."""
        from ..parallel.sharding import batch_cameras, make_sharded_train_step
        from ..parallel.view_tile_sharding import (
            make_view_tile_sharded_train_step,
        )

        s = self.settings
        # mesh_axis="view_tile": the batch is one keyframe per VIEW ROW of
        # the 2-D mesh; each view's render is additionally banded across
        # the tile axis (parallel/view_tile_sharding.py).
        two_d = self.mesh_axis == "view_tile"
        n_dev = int(self.mesh.shape["dp"] if two_d else self.mesh.devices.size)
        kfs = []
        for _ in range(n_dev):
            kf = self._use_one_random_sliding_window_keyframe()
            if kf is None:
                break
            kfs.append(kf)
        if not kfs:
            return None
        # If the sliding window ran dry mid-batch, pad by repeating sampled
        # keyframes: the per-view math is identical and the pmean gradient
        # stays correct (a repeated view just gets extra weight), whereas
        # aborting here would silently discard the times-of-use already
        # consumed for the earlier slots.
        n0 = len(kfs)
        for i in range(n_dev - n0):
            kfs.append(kfs[i % n0])
        self.iteration += 1

        n_levels = s.num_gaus_pyramid_sub_levels
        level = n_levels
        if s.do_gaus_pyramid_training and all(kf.pyramid_images for kf in kfs):
            level = kfs[0].current_pyramid_level()
            if level < n_levels:
                # consume each distinct other view's budget at this level
                # (padding repeats keyframe objects; don't double-charge)
                seen = {id(kfs[0])}
                for kf in kfs[1:]:
                    if id(kf) in seen:
                        continue
                    seen.add(id(kf))
                    if (
                        level < len(kf.pyramid_times_of_use)
                        and kf.pyramid_times_of_use[level] > 0
                    ):
                        kf.pyramid_times_of_use[level] -= 1
        if level >= n_levels:
            h, w = kfs[0].image.shape[:2]
            imgs_hw = [kf.image.shape[:2] for kf in kfs]
        else:
            h, w = kfs[0].pyramid_images[level].shape[:2]
            imgs_hw = [kf.pyramid_images[level].shape[:2] for kf in kfs]
        assert all(hw == (h, w) for hw in imgs_hw), (
            "mesh mode requires uniform keyframe resolution"
        )
        gt = jnp.stack([self._gt_device(kf, level, n_levels) for kf in kfs])
        masks = None
        if level < n_levels:
            if any(kf.pyramid_masks for kf in kfs):
                # level-appropriate undistort/sky masks
                # (gaus_pyramid_undistort_mask_, camera.h:103-105)
                masks = jnp.stack(
                    [
                        self._mask_device(kf, level, n_levels)
                        if kf.pyramid_masks
                        else self._ones_mask_device(h, w)
                        for kf in kfs
                    ]
                )
        elif any(kf.mask is not None for kf in kfs):
            masks = jnp.stack(
                [
                    self._mask_device(kf, level, n_levels)
                    if kf.mask is not None
                    else self._ones_mask_device(h, w)
                    for kf in kfs
                ]
            )
        bg = self._bg_device()
        accumulate = self.iteration < s.opt.densify_until_iter
        static_opt, live = self._static_opt_and_live()
        ash = self._ash_device()
        cams = batch_cameras(
            [kf.camera_matrices(s.z_near, s.z_far) for kf in kfs]
        )

        prev_state, prev_adam = self.state, self.adam
        for _attempt in range(3):
            import time as _time

            cfg = self._raster_cfg(h, w)
            key = (cfg, static_opt, accumulate)
            step = self._sharded_steps.get(key)
            if step is None:
                builder = (
                    make_view_tile_sharded_train_step
                    if two_d
                    else make_sharded_train_step
                )
                step, _ = builder(
                    self.mesh, cfg, static_opt, accumulate_stats=accumulate
                )
                self._sharded_steps[key] = step
            _pre_sz = getattr(step, "_cache_size", lambda: -1)()
            _t0 = _time.perf_counter()
            with self.timer.phase("train_step"):
                self.state, self.adam, metrics = step(
                    prev_state,
                    prev_adam,
                    cams,
                    gt,
                    masks,
                    bg,
                    jnp.int32(self.iteration),
                    self._slr_device(),
                    live,
                    ash,
                )
            if getattr(step, "_cache_size", lambda: -1)() > _pre_sz:
                self.compile_count += 1
                self.compile_wall += _time.perf_counter() - _t0
            loss, psnr_v, count_v, total_pairs = (
                np.asarray(x).item()
                for x in jax.device_get(
                    (metrics.loss, metrics.psnr, metrics.count, metrics.total_pairs)
                )
            )
            self._autosize_pairs(total_pairs)
            if total_pairs <= cfg.max_pairs:
                break
            if self.max_pairs <= cfg.max_pairs:
                print(
                    f"[mapper] WARNING: pair overflow at iter "
                    f"{self.iteration} ({total_pairs} > {cfg.max_pairs}) "
                    "with pair autosizing disabled; frame rendered with "
                    "dropped splats"
                )
                break
            print(
                f"[mapper] WARNING: pair overflow at iter {self.iteration} "
                f"({total_pairs} > {cfg.max_pairs}); growing to "
                f"{self.max_pairs} and re-rendering"
            )
        self._last_kf = kfs[0]
        return loss, psnr_v, count_v, total_pairs

    def _post_step_phase(self, loss, psnr_v, count_v, total_pairs) -> dict:
        self._cadence_phase(self.iteration)
        return self._consume_metrics(
            self.iteration, loss, psnr_v, count_v, total_pairs
        )

    def _cadence_due(self, iteration: int) -> bool:
        """Would _cadence_phase mutate state at this iteration?"""
        s = self.settings
        if iteration >= s.opt.densify_until_iter:
            return False
        if (
            iteration > s.opt.densify_from_iter
            and s.opt.densification_interval
            and iteration % s.opt.densification_interval == 0
        ):
            return True
        return (
            s.opt.opacity_reset_interval
            and iteration % s.opt.opacity_reset_interval == 0
        ) or (
            s.model.white_background and iteration == s.opt.densify_from_iter
        )

    def _cadence_phase(self, iteration: int) -> None:
        """State-mutating per-iteration cadence: densify/prune surgery and
        opacity reset (trainForOneIteration :449-461). Depends only on the
        iteration number, never on that step's metrics."""
        s = self.settings
        if iteration < s.opt.densify_until_iter:
            if (
                iteration > s.opt.densify_from_iter
                and s.opt.densification_interval
                and iteration % s.opt.densification_interval == 0
            ):
                size_threshold = (
                    20 if iteration > s.prune_big_point_after_iter else 0
                )
                self._ensure_capacity(int(self.state.count) // 2)
                # Lossless surgery like the reference's dynamic realloc:
                # if the fixed capacity drops appendees, GROW and REDO the
                # surgery from the pre-surgery state (growing afterwards
                # cannot recover rows already dropped).
                for _surgery_attempt in range(4):
                    self._key, sub = jax.random.split(self._key)
                    new_state, new_adam, aux = densify_and_prune(
                        self.state,
                        self.adam,
                        sub,
                        max_grad=s.opt.densify_grad_threshold,
                        min_opacity=s.densify_min_opacity,
                        extent=self.scene.cameras_extent,
                        max_screen_size=size_threshold,
                        percent_dense=s.opt.percent_dense,
                    )
                    dropped = int(aux.dropped_for_capacity)
                    if dropped == 0:
                        break
                    if _surgery_attempt == 3:
                        print(
                            f"[mapper] WARNING: densify still dropped "
                            f"{dropped} gaussians after repeated capacity "
                            f"growth at iter {iteration}; accepting "
                            "the lossy surgery"
                        )
                        break
                    print(
                        f"[mapper] WARNING: densify needs {dropped} more "
                        f"slots at iter {iteration}; growing capacity "
                        "and redoing the surgery"
                    )
                    target = self.state.capacity + dropped
                    while self.state.capacity < target:
                        self.state, self.adam = with_capacity(
                            self.state, self.adam, self.state.capacity * 2
                        )
                self.state, self.adam = new_state, new_adam
                self.capacity = self.state.capacity
                self._invalidate_binning_caches()
            # resetOpacity cadence (gaussian_mapper.cpp:460): also fires for
            # white-background runs exactly when iteration == densify_from.
            if (
                s.opt.opacity_reset_interval
                and iteration % s.opt.opacity_reset_interval == 0
            ) or (
                s.model.white_background
                and iteration == s.opt.densify_from_iter
            ):
                self.state, self.adam = reset_opacity(self.state, self.adam)
                self._invalidate_binning_caches()

    def _consume_metrics(
        self, iteration, loss, psnr_v, count_v, total_pairs, kf=None
    ) -> dict:
        """Metrics-side post-step work (ema, report, image recording).
        Runs immediately in synchronous mode; at resolve time — in step
        order — when pipelined."""
        s = self.settings
        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
        if s.training_report_interval and (
            iteration % s.training_report_interval == 0
        ):
            import time as _time

            wall = max(_time.perf_counter() - self._wall_start, 1e-9)
            print(
                f"[mapper] iter {iteration}: ema_loss {self.ema_loss:.5f} "
                f"points {count_v} pairs {total_pairs} "
                f"compiles {self.compile_count} "
                f"({self.compile_wall:.1f}s, {100 * self.compile_wall / wall:.0f}% of wall) "
                f"[{self.timer.report()}]"
            )
        if (
            self.result_dir
            and s.keyframe_record_interval
            and iteration % s.keyframe_record_interval == 0
        ):
            self._record_keyframe_images(kf or self._last_kf)
        self._last_resolved = {
            "loss": loss,
            "psnr": psnr_v,
            "count": int(count_v),
            "total_pairs": int(total_pairs),
        }
        return self._last_resolved

    # ------------------------------------------------------- SLAM-mode feed
    def feed_keyframe(
        self,
        fid: int,
        t_wc: np.ndarray,
        image: np.ndarray,
        points: np.ndarray | None = None,
        colors: np.ndarray | None = None,
        depth: np.ndarray | None = None,
        intrinsics=None,
    ) -> Keyframe:
        """Tracking-fed keyframe ingestion (Photo-SLAM operating mode).

        The reference receives keyframes+poses from an ORB-SLAM3 tracker
        (SURVEY.md §3.6); here any host-side tracker pushes (pose, image,
        and either a sparse map-point cloud, an RGB-D depth image, or
        nothing for pure monocular). Returns the registered keyframe;
        call train_for_one_iteration() to optimize.
        """
        if intrinsics is not None:
            self._feed_intrinsics = intrinsics
        is_mono = depth is None
        if points is not None and len(points):
            # Tracker map points: accumulate for input.ply
            # (saveSparsePointsPly, gaussian_model.cpp:955-996).
            self.sparse_points_xyz.append(np.asarray(points, np.float32))
            self.sparse_points_color.append(
                np.asarray(colors, np.float32)
                if colors is not None
                else np.zeros_like(np.asarray(points, np.float32))
            )
        if depth is not None and points is None:
            from ..data.replica import backproject_depth

            intr = intrinsics or self._intr_from_image(image)
            dist_raw = getattr(intr, "dist", None)
            dist = np.asarray(() if dist_raw is None else dist_raw)
            if dist.size and np.any(dist != 0):
                # Distorted camera: backproject through the distortion model
                # so the seed cloud projects consistently onto the
                # undistorted training image (see UndistortRectifier.
                # backproject_depth). Colors stay sampled from the raw image
                # at the raw pixels — same physical ray, no resampling.
                from .camera_undistort import UndistortRectifier

                k = np.array(
                    [[intr.fx, 0, intr.cx], [0, intr.fy, intr.cy], [0, 0, 1]],
                    np.float64,
                )
                h0, w0 = depth.shape[:2]
                cam_model = getattr(intr, "model", "pinhole")
                key = (intr.fx, intr.fy, intr.cx, intr.cy, w0, h0, cam_model,
                       dist.astype(np.float64).tobytes())
                und = self._undistorters.get(key)
                if und is None:
                    und = UndistortRectifier(
                        k, dist.astype(np.float64), w0, h0, model=cam_model
                    )
                    self._undistorters[key] = und
                pts_cam = und.backproject_depth(depth, stride=4)
            else:
                pts_cam = backproject_depth(depth, intr, stride=4)
            t = np.asarray(t_wc, np.float64)
            points = (pts_cam @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
            ys, xs = np.meshgrid(
                np.arange(0, depth.shape[0], 4), np.arange(0, depth.shape[1], 4),
                indexing="ij",
            )
            colors = image[ys, xs][depth[ys, xs] > 0].astype(np.float32)
        if points is None:
            points = np.zeros((0, 3), np.float32)
            colors = np.zeros((0, 3), np.float32)
        frame = FrameData(
            cam_pose=np.asarray(t_wc, np.float32),
            points=points,
            colors=colors if colors is not None else np.zeros_like(points),
            image=np.asarray(image, np.float32),
        )
        kf = self.ingest_frame(fid, frame)
        if is_mono and self.settings.do_inactive_geo_densify:
            self._inactive_geo_densify(
                kf, sparse_world=points if len(points) else None
            )
        return kf

    # ----------------------------------------- inactive-geometry densify
    def _inactive_geo_densify(
        self, kf: Keyframe, sparse_world: np.ndarray | None = None
    ) -> None:
        """Monocular inactive-geometry densification.

        The fork retains only the machinery members for this Photo-SLAM
        operating mode (include/gaussian_mapper.h:252-262:
        monocular_inactive_geo_densify_max_pixel_dist_, inactive_geo_densify_,
        depth_cached_/max_depth_cached_, depth_cache_points_/colors_) — the
        implementation left with the ORB-SLAM3 integration. This rebuild
        reconstructs the behavior: grow geometry for a mono keyframe from a
        pseudo-depth image assembled from

          (a) the tracker's sparse map-point depths, propagated to nearby
              pixels within max_pixel_dist,
          (b) the model's own rendered expected depth where it has coverage
              (the "inactive geometry" — structure mapped from earlier
              keyframes), and
          (c) a flat bootstrap prior when neither exists yet,

        cached across max_depth_cached keyframes, then flushed through
        increasePcd whose voxel-hash dedup drops re-observations.
        """
        s = self.settings
        h, w = kf.image.shape[:2]
        stride = max(4, min(h, w) // 60)
        ys, xs = np.mgrid[stride // 2 : h : stride, stride // 2 : w : stride]
        gy = ys.reshape(-1).astype(np.int64)
        gx = xs.reshape(-1).astype(np.int64)
        depth = np.full(gy.shape, np.nan, np.float32)
        cam = kf.camera

        if sparse_world is not None and len(sparse_world):
            t = kf.t_cw.astype(np.float64)
            pc = np.asarray(sparse_world, np.float64) @ t[:3, :3].T + t[:3, 3]
            z = pc[:, 2]
            ok = z > 0.2
            with np.errstate(divide="ignore", invalid="ignore"):
                u = cam.fx * pc[:, 0] / z + cam.cx
                v = cam.fy * pc[:, 1] / z + cam.cy
            ok &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
            su, sv, sz = u[ok], v[ok], z[ok]
            if len(sz):
                d2 = (gx[:, None] - su[None, :]) ** 2 + (
                    gy[:, None] - sv[None, :]
                ) ** 2
                j = np.argmin(d2, axis=1)
                dmin = d2[np.arange(len(gx)), j]
                near = dmin <= s.inactive_geo_densify_max_pixel_dist**2
                depth[near] = sz[j[near]].astype(np.float32)

        todo = ~np.isfinite(depth)
        if np.any(todo) and self.initial_mapped and int(self.state.count) > 0:
            dep, cov = render_depth_state(
                self.state,
                kf.camera_matrices(s.z_near, s.z_far),
                self._raster_cfg(h, w),
            )
            dep, cov = np.asarray(dep), np.asarray(cov)
            dsel = dep[gy[todo], gx[todo]]
            csel = cov[gy[todo], gx[todo]]
            good = (csel > 0.5) & (dsel > 0.2)
            idx = np.where(todo)[0][good]
            depth[idx] = dsel[good]

        if not np.any(np.isfinite(depth)):
            depth[:] = s.monocular_init_depth

        ok = np.isfinite(depth) & (depth > 0.2)
        if not np.any(ok):
            return
        zc = depth[ok].astype(np.float64)
        xc = (gx[ok] - cam.cx) / cam.fx * zc
        yc = (gy[ok] - cam.cy) / cam.fy * zc
        pts_cam = np.stack([xc, yc, zc], axis=-1)
        c2w = np.linalg.inv(kf.t_cw.astype(np.float64))
        pts_w = (pts_cam @ c2w[:3, :3].T + c2w[:3, 3]).astype(np.float32)
        cols = kf.image[gy[ok], gx[ok]].astype(np.float32)

        self.depth_cache_points.append(pts_w)
        self.depth_cache_colors.append(cols)
        self.depth_cached += 1
        if self.depth_cached >= max(1, s.max_depth_cached):
            pts = np.concatenate(self.depth_cache_points, axis=0)
            cs = np.concatenate(self.depth_cache_colors, axis=0)
            self.depth_cache_points = []
            self.depth_cache_colors = []
            self.depth_cached = 0
            self._ingest_points(pts, cs)

    def _ingest_points(self, points: np.ndarray, colors: np.ndarray) -> None:
        """Grow the model from host arrays, chunked through the padded
        ingest buffer (increasePcd path, voxel-hash dedup applies)."""
        for i in range(0, len(points), self.ingest_capacity):
            pts, cols, valid = self._pad_cloud(
                points[i : i + self.ingest_capacity],
                colors[i : i + self.ingest_capacity],
            )
            self._ensure_capacity(int(np.sum(np.asarray(valid))))
            self.state, self.adam, _ = increase_pcd(
                self.state, self.adam, pts, cols, valid, jnp.int32(self.iteration)
            )
        self._invalidate_binning_caches()

    # ------------------------------------------------ tracker pose updates
    def update_keyframe_pose(self, fid: int, t_wc: np.ndarray) -> None:
        """Apply a tracker pose correction (local BA / loop closure).

        When the correction is large (large_rot_th_/large_trans_th_,
        gaussian_mapper.cpp:17-18, Mapper.large_{rotation,translation}_
        threshold in the SLAM configs, rotation in degrees), Gaussians
        younger than stable_num_iter_existence were trained against poses
        that just moved and are pruned (include/gaussian_mapper.h:275).
        """
        kf = self.scene.keyframes.get(fid)
        if kf is None:
            return
        from ..utils import rotation_angle

        new_tcw = np.linalg.inv(np.asarray(t_wc, np.float64)).astype(np.float32)
        rel_r = new_tcw[:3, :3].astype(np.float64) @ kf.t_cw[:3, :3].astype(np.float64).T
        ang_deg = math.degrees(rotation_angle(rel_r))
        dtr = float(
            np.linalg.norm(
                np.asarray(t_wc, np.float64)[:3, 3]
                - np.linalg.inv(kf.t_cw.astype(np.float64))[:3, 3]
            )
        )
        kf.t_cw = new_tcw
        kf._cam_matrices = None  # gt images are pose-independent; keep cache
        self._invalidate_binning_caches(fid)
        s = self.settings
        if (
            ang_deg > s.large_rotation_threshold
            or dtr > s.large_translation_threshold
        ):
            self.on_large_pose_change()

    def on_large_pose_change(self) -> None:
        """Existence pruning after a big pose update (loop closure)."""
        s = self.settings
        if s.stable_num_iter_existence > 0 and self.initial_mapped:
            self.state, self.adam = prune_young(
                self.state,
                self.adam,
                jnp.int32(self.iteration),
                jnp.int32(s.stable_num_iter_existence),
            )
            self._invalidate_binning_caches()

    def _intr_from_image(self, image: np.ndarray):
        from ..data import CameraIntrinsics

        cam0 = next(iter(self.scene.cameras.values()), None)
        h, w = image.shape[:2]
        if cam0 is not None:
            return CameraIntrinsics(cam0.fx, cam0.fy, cam0.cx, cam0.cy, w, h)
        return CameraIntrinsics(w / 2.0, w / 2.0, (w - 1) / 2.0, (h - 1) / 2.0, w, h)

    # ----------------------------------------------- live parameter channel
    def get_variable_parameters(self):
        """getVaribleParameters (gaussian_mapper.cpp:941-960)."""
        from .variable_params import VariableParameters

        s = self.settings
        return VariableParameters(
            position_lr_init=s.opt.position_lr_init,
            feature_lr=s.opt.feature_lr,
            opacity_lr=s.opt.opacity_lr,
            scaling_lr=s.opt.scaling_lr,
            rotation_lr=s.opt.rotation_lr,
            percent_dense=s.opt.percent_dense,
            lambda_dssim=s.opt.lambda_dssim,
            opacity_reset_interval=s.opt.opacity_reset_interval,
            densify_grad_th=s.opt.densify_grad_threshold,
            densify_interval=s.opt.densification_interval,
            new_kf_times_of_use=s.new_keyframe_times_of_use,
            keep_training=not self._stopped,
            do_gaus_pyramid_training=s.do_gaus_pyramid_training,
            do_inactive_geo_densify=s.do_inactive_geo_densify,
            stable_num_iter_existence=s.stable_num_iter_existence,
        )

    def set_variable_parameters(self, p) -> None:
        """setVaribleParameters (gaussian_mapper.cpp:962-982). No recompiles:
        every mutated value is a traced input of the jitted train step."""
        import dataclasses as _dc

        s = self.settings
        self.settings = _dc.replace(
            s,
            opt=_dc.replace(
                s.opt,
                position_lr_init=p.position_lr_init,
                feature_lr=p.feature_lr,
                opacity_lr=p.opacity_lr,
                scaling_lr=p.scaling_lr,
                rotation_lr=p.rotation_lr,
                percent_dense=p.percent_dense,
                lambda_dssim=p.lambda_dssim,
                opacity_reset_interval=p.opacity_reset_interval,
                densify_grad_threshold=p.densify_grad_th,
                densification_interval=p.densify_interval,
            ),
            new_keyframe_times_of_use=p.new_kf_times_of_use,
            do_gaus_pyramid_training=p.do_gaus_pyramid_training,
            do_inactive_geo_densify=p.do_inactive_geo_densify,
            stable_num_iter_existence=p.stable_num_iter_existence,
        )
        if not p.keep_training:
            self.signal_stop()

    # ---------------------------------------------------------- checkpoints
    def save_checkpoint(self, path: str | Path) -> None:
        """Full training checkpoint: parameters AND optimizer state AND
        iteration counter — a deliberate capability extension over the
        reference, whose PLY checkpoints drop Adam moments and the iteration
        (gaussian_model.cpp:861-954; loadPly resumes view-only)."""
        self.flush_metrics()  # an in-flight overflow replay must land first
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        blobs = {f"state.{k}": np.asarray(v) for k, v in self.state.params().items()}
        blobs.update(
            {
                "state.count": np.asarray(self.state.count),
                "state.exist_since_iter": np.asarray(self.state.exist_since_iter),
                "state.max_radii2d": np.asarray(self.state.max_radii2d),
                "state.xyz_grad_accum": np.asarray(self.state.xyz_grad_accum),
                "state.denom": np.asarray(self.state.denom),
                "adam.step": np.asarray(self.adam.step),
                "iteration": np.asarray(self.iteration),
                "spatial_lr_scale": np.asarray(self.spatial_lr_scale),
                "cameras_extent": np.asarray(self.scene.cameras_extent),
                # pair-capacity tuning state: a resume must not re-learn
                # max_pairs through overflow warnings and recompiles
                "max_pairs": np.asarray(self.max_pairs),
                "pairs_high_water": np.asarray(self._pairs_high_water),
            }
        )
        for k, v in self.adam.m.items():
            blobs[f"adam.m.{k}"] = np.asarray(v)
        for k, v in self.adam.v.items():
            blobs[f"adam.v.{k}"] = np.asarray(v)
        np.savez_compressed(path, **blobs)

    def load_checkpoint(self, path: str | Path) -> None:
        self.flush_metrics()
        z = np.load(path)
        params = {k.split(".", 1)[1]: jnp.asarray(z[k]) for k in z.files if k.startswith("state.") and k.split(".", 1)[1] in ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation")}
        cap = params["xyz"].shape[0]
        self.state = GaussianState(
            **params,
            count=jnp.asarray(z["state.count"]),
            exist_since_iter=jnp.asarray(z["state.exist_since_iter"]),
            max_radii2d=jnp.asarray(z["state.max_radii2d"]),
            xyz_grad_accum=jnp.asarray(z["state.xyz_grad_accum"]),
            denom=jnp.asarray(z["state.denom"]),
        )
        self.adam = AdamState(
            m={k.split(".", 2)[2]: jnp.asarray(z[k]) for k in z.files if k.startswith("adam.m.")},
            v={k.split(".", 2)[2]: jnp.asarray(z[k]) for k in z.files if k.startswith("adam.v.")},
            step=jnp.asarray(z["adam.step"]),
        )
        self.capacity = cap
        self.iteration = int(z["iteration"])
        self.spatial_lr_scale = float(z["spatial_lr_scale"])
        self.scene.cameras_extent = float(z["cameras_extent"])
        if "max_pairs" in z.files:  # older checkpoints predate these
            self.max_pairs = int(z["max_pairs"])
            self._pairs_high_water = int(z["pairs_high_water"])
        self.initial_mapped = True
        self._invalidate_binning_caches()

    def set_sh_degree(self, degree: int | None) -> None:
        """setShDegree (gaussian_model.cpp:109-112); None = max degree."""
        if degree is not None:
            degree = min(degree, self.settings.model.sh_degree)
        self.active_sh_degree = degree

    def one_up_sh_degree(self) -> None:
        """oneUpShDegree (gaussian_model.cpp:103-107): the classic 3DGS
        1000-iteration SH ramp step. Traced, so ramping never recompiles."""
        cur = self.active_sh_degree
        if cur is None:
            return
        self.active_sh_degree = min(cur + 1, self.settings.model.sh_degree)

    # ------------------------------------------------------------ rendering
    def render_from_pose(
        self, t_cw: np.ndarray, width: int, height: int, fovx=None, fovy=None
    ) -> np.ndarray:
        """renderFromPose (:608-657) for viewers/eval."""
        cam0 = next(iter(self.scene.cameras.values()), None)
        if fovx is None:
            fovx = cam0.fovx if cam0 else math.pi / 2
        if fovy is None:
            fovy = cam0.fovy if cam0 else math.pi / 2
        q = rot_to_quat_wxyz(t_cw[:3, :3])
        cm = CameraMatrices.from_pose(
            q, t_cw[:3, 3], fovx, fovy, self.settings.z_near, self.settings.z_far
        )
        bg = jnp.ones(3) if self.settings.model.white_background else jnp.zeros(3)
        out = render_state(self.state, cm, bg, self._raster_cfg(height, width))
        return np.asarray(out.image)

    # -------------------------------------------------------------- results
    def save_ply(self, out_dir: str | Path | None = None) -> Path:
        """savePly (:659-755): point_cloud/iteration_N/point_cloud.ply +
        cameras.json + cfg_args, 3DGS-viewer compatible."""
        self.flush_metrics()  # an in-flight overflow replay must land first
        base = Path(out_dir or self.result_dir)
        it_dir = base / "point_cloud" / f"iteration_{self.iteration}"
        n = int(self.state.count)
        props = gaussians_to_ply_dict(
            np.asarray(self.state.xyz[:n]),
            np.asarray(self.state.f_dc[:n]),
            np.asarray(self.state.f_rest[:n]),
            np.asarray(self.state.opacity[:n]),
            np.asarray(self.state.scaling[:n]),
            np.asarray(self.state.rotation[:n]),
        )
        write_ply(it_dir / "point_cloud.ply", props)

        cams = []
        for kf in self.scene.keyframes.values():
            c2w = np.linalg.inv(kf.t_cw.astype(np.float64))
            cams.append(
                {
                    "id": kf.fid,
                    "img_name": str(kf.fid),
                    "width": kf.camera.width,
                    "height": kf.camera.height,
                    "position": c2w[:3, 3].tolist(),
                    "rotation": c2w[:3, :3].tolist(),
                    "fx": kf.camera.fx,
                    "fy": kf.camera.fy,
                }
            )
        base.mkdir(parents=True, exist_ok=True)
        if self.sparse_points_xyz:
            write_sparse_points_ply(
                base / "input.ply",
                np.concatenate(self.sparse_points_xyz, axis=0),
                np.concatenate(self.sparse_points_color, axis=0),
            )
        (base / "cameras.json").write_text(json.dumps(cams))
        (base / "cfg_args").write_text(
            "Namespace(eval=False, images='images', model_path='{}', "
            "resolution=-1, sh_degree={}, source_path='', white_background={})".format(
                base, self.settings.model.sh_degree,
                self.settings.model.white_background,
            )
        )
        self._write_keyframe_used_times(base)
        return it_dir / "point_cloud.ply"

    def _record_keyframe_images(self, kf: Keyframe) -> None:
        """Record.keyframe_record_interval behavior (gaussian_mapper.cpp:
        keyframe image recording): rendered + gt images per interval."""
        import cv2

        out = Path(self.result_dir) / "record"
        out.mkdir(parents=True, exist_ok=True)
        img = self.render_from_pose(
            kf.t_cw, kf.camera.width, kf.camera.height, kf.camera.fovx, kf.camera.fovy
        )
        for name, arr in (("rendered", img), ("gt", kf.image)):
            cv2.imwrite(
                str(out / f"iter{self.iteration}_kf{kf.fid}_{name}.png"),
                cv2.cvtColor(
                    (np.clip(arr, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
                ),
            )

    def _write_keyframe_used_times(self, base: Path) -> None:
        """keyframe_used_times log (:757-775)."""
        lines = [f"{fid} {times}" for fid, times in sorted(self.kfs_used_times.items())]
        (base / f"keyframe_used_times_{self.iteration}.txt").write_text(
            "\n".join(lines) + "\n"
        )

    def load_ply(self, ply_path: str | Path) -> None:
        """loadPly (:984-1059): view-only restore (no optimizer state, like
        the reference)."""
        self.flush_metrics()
        xyz, dc, rest, opacity, scaling, rotation = ply_dict_to_gaussians(
            read_ply(ply_path)
        )
        n = len(xyz)
        cap = max(self.capacity, 1 << (n - 1).bit_length())

        def pad(a):
            return jnp.zeros((cap,) + a.shape[1:], jnp.float32).at[:n].set(a)

        self.state = GaussianState(
            xyz=pad(xyz),
            f_dc=pad(dc),
            f_rest=pad(rest),
            opacity=pad(opacity),
            scaling=pad(scaling),
            rotation=pad(rotation).at[:, 0].set(
                jnp.concatenate([jnp.asarray(rotation[:, 0]), jnp.ones(cap - n)])
            ),
            count=jnp.int32(n),
            exist_since_iter=jnp.zeros((cap,), jnp.int32),
            max_radii2d=jnp.zeros((cap,), jnp.float32),
            xyz_grad_accum=jnp.zeros((cap,), jnp.float32),
            denom=jnp.zeros((cap,), jnp.float32),
        )
        self.adam = AdamState.init(self.state.params())
        self.capacity = cap
        self.initial_mapped = True
        self._invalidate_binning_caches()

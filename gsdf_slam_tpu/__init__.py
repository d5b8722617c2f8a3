"""gsdf_slam_tpu — a TPU-native online 3D Gaussian Splatting SLAM-mapping framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of GSDF-SLAM (a
Photo-SLAM fork with a LiDAR+camera KITTI pipeline and a Taming-3DGS style
rasterizer). The compute path is pure-functional JAX with fixed-capacity
Gaussian buffers; hot kernels are Pallas; orchestration is host Python.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  ops/       — math core + rasterizer (projection, binning, tile blend, SH,
               knn, colorization, losses)
  models/    — GaussianModel state pytree, multi-group Adam, densification
  engine/    — mapper orchestration, keyframes, scene, cameras
  data/      — dataset parsers (KITTI, TUM, Replica, EuRoC, Oxford-Spires)
  parallel/  — device-mesh sharding of the render/train step
  io/        — 3DGS-format PLY checkpointing
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    Fresh jit signatures cost minutes over a TPU relay; the mapper's
    streaming runs pay that for every pyramid level and capacity size. The
    cache makes reruns skip straight to execution. Opt out with
    GSDF_COMPILATION_CACHE=0; relocate with GSDF_COMPILATION_CACHE_DIR.
    (An extension over the reference, which recompiles nothing — CUDA
    kernels are AOT — but also amortizes nothing across configs.)
    """
    import os

    if os.environ.get("GSDF_COMPILATION_CACHE", "1") == "0":
        return
    # CPU runs: compiles are already fast, and XLA:CPU AOT cache entries are
    # machine-feature-pinned (cross-feature loads warn about possible
    # SIGILL) — the cache is a TPU-relay amortization, keep it there.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    path = os.environ.get("GSDF_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "gsdf_slam_tpu", "xla_cache"
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache every entry: even small programs cost a relay round-trip
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:  # never block import on cache plumbing
        pass


_enable_compilation_cache()

"""Mean squared 3-nearest-neighbor distance for Gaussian scale init.

TPU-native replacement for simple-knn (submodules/simple-knn/simple_knn.cu,
`distCUDA2` spatial.cu:15-26): used only to initialize log-scales from point
spacing (gaussian_model.cpp:165-168).

Design: the CUDA version Morton-sorts points, builds per-1024 AABBs and does
a box-pruned exact pass. On TPU we keep the Morton sort but replace box
pruning with a fixed +-WINDOW candidate scan over the sorted order — fully
vectorized (one [N, 2*WINDOW] distance matrix, a small sort), no
data-dependent control flow. This is approximate for adversarial point sets
but statistically indistinguishable for scale init (validated against brute
force in tests/test_components.py); the CUDA version's candidate pass (simple_knn.cu
:148-183) is itself windowed before box refinement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _expand_bits(v: jnp.ndarray) -> jnp.ndarray:
    """Spread 10 bits to every 3rd bit (simple_knn.cu Morton layout).

    Masks wrapped in uint32: bare Python ints above 2^31 overflow JAX's
    weak-typed int32 promotion."""
    u = jnp.uint32
    v = (v * u(0x00010001)) & u(0xFF0000FF)
    v = (v * u(0x00000101)) & u(0x0F00F00F)
    v = (v * u(0x00000011)) & u(0xC30C30C3)
    v = (v * u(0x00000005)) & u(0x49249249)
    return v


def morton_codes(points: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton codes of points normalized to their valid-bbox."""
    big = jnp.float32(3.4e38)
    pv = jnp.where(valid[:, None], points, big)
    mn = jnp.min(pv, axis=0)
    pv_max = jnp.where(valid[:, None], points, -big)
    mx = jnp.max(pv_max, axis=0)
    span = jnp.maximum(mx - mn, 1e-12)
    q = jnp.clip(((points - mn) / span) * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    code = (
        _expand_bits(q[:, 0])
        | (_expand_bits(q[:, 1]) << 1)
        | (_expand_bits(q[:, 2]) << 2)
    )
    return jnp.where(valid, code, jnp.uint32(0xFFFFFFFF))


def knn_mean_dist2(
    points: jnp.ndarray,
    valid: jnp.ndarray,
    k: int = 3,
    window: int = 16,
) -> jnp.ndarray:
    """Mean squared distance to the k nearest neighbors per point.

    Args:
      points: [N, 3] (capacity-padded).
      valid:  [N] liveness mask; invalid rows get 0 output and never appear
              as neighbors.
    """
    n = points.shape[0]
    order = jnp.argsort(morton_codes(points, valid))
    sorted_pts = points[order]
    sorted_valid = valid[order]

    big = jnp.float32(3.4e38)
    padded = jnp.concatenate(
        [
            jnp.full((window, 3), big, jnp.float32),
            jnp.where(sorted_valid[:, None], sorted_pts, big),
            jnp.full((window, 3), big, jnp.float32),
        ]
    )
    # Static window slices: candidate j for point i is sorted index i+off.
    cands = jnp.stack(
        [padded[off : off + n] for off in range(2 * window + 1) if off != window],
        axis=1,
    )  # [N, 2*window, 3]
    diff = cands - sorted_pts[:, None, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    d2 = jnp.where(jnp.isfinite(d2), d2, big)
    smallest = -jax.lax.top_k(-d2, k)[0]  # [N, k]
    mean_d2 = jnp.mean(smallest, axis=-1)
    mean_d2 = jnp.where(sorted_valid, mean_d2, 0.0)

    out = jnp.zeros((n,), jnp.float32).at[order].set(mean_d2)
    return out


def knn_mean_dist2_exact(
    points: np.ndarray, valid: np.ndarray, k: int = 3
) -> np.ndarray:
    """EXACT mean squared k-NN distance (host-side KD-tree).

    Matches the reference's box-pruned exact pass (simple_knn.cu:148-183 /
    distCUDA2, spatial.cu:15-26) bit-for-what-it-computes: the true k
    nearest neighbors, not the +-window approximation. Used at ingest time
    (create_from_pcd/increasePcd run eagerly on the host), where a KD-tree
    over <= ingest-capacity points costs milliseconds."""
    from scipy.spatial import cKDTree

    points = np.asarray(points, np.float32)
    valid = np.asarray(valid, bool)
    out = np.zeros(len(points), np.float32)
    idx = np.flatnonzero(valid)
    if len(idx) > k:
        pts = points[idx].astype(np.float64)
        d, _ = cKDTree(pts).query(pts, k=k + 1, workers=-1)
        out[idx] = (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)
    return out


def knn_mean_dist2_auto(
    points: jnp.ndarray, valid: jnp.ndarray, k: int = 3, window: int = 16
) -> jnp.ndarray:
    """Exact k-NN when running eagerly on concrete host data; the windowed
    Morton approximation under tracing (jit/vmap), where host round-trips
    are impossible. Both never *underestimate* is no longer needed: exact
    is simply correct; the approximation remains the traced fallback."""
    if isinstance(points, jax.core.Tracer) or isinstance(valid, jax.core.Tracer):
        return knn_mean_dist2(points, valid, k=k, window=window)
    try:
        return jnp.asarray(knn_mean_dist2_exact(np.asarray(points), np.asarray(valid), k=k))
    except ImportError:  # scipy unavailable: keep the traced path working
        return knn_mean_dist2(points, valid, k=k, window=window)

"""Gaussian model state, optimizer, and densification."""

from .gaussian_model import (  # noqa: F401
    GaussianState,
    add_densification_stats,
    create_from_pcd,
    densify_and_prune,
    increase_pcd,
    reset_opacity,
    voxel_hash,
    with_capacity,
)
from .optimizer import AdamState, adam_step, expon_lr, group_lrs  # noqa: F401

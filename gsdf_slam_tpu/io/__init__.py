"""Host IO: PLY checkpoints, point-cloud readers."""

from .ply import (  # noqa: F401
    gaussians_to_ply_dict,
    ply_dict_to_gaussians,
    read_ply,
    write_ply,
)

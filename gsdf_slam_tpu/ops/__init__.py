"""Compute ops: rasterizer pipeline, SH, transforms, knn, losses."""

from .rasterize import RasterizeConfig, RenderOutput, render, render_dense_reference  # noqa: F401
from .transforms import CameraMatrices  # noqa: F401

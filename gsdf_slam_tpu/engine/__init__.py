"""Training orchestration: train step, mapper, keyframes, scene."""

from .keyframe import Camera, Keyframe  # noqa: F401
from .mapper import GaussianMapper  # noqa: F401
from .scene import Scene  # noqa: F401
from .settings import MapperSettings  # noqa: F401
from .train import StepMetrics, render_state, train_step  # noqa: F401

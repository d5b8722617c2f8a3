"""Training orchestration: train step, mapper, keyframes, scene."""

from .train import StepMetrics, render_state, train_step  # noqa: F401

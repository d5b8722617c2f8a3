"""Host utilities: SE(3) algebra, coordinate conversions, observability."""

from .coordinates import change_world_system, convert_points, convert_pose  # noqa: F401
from .lie import SE3, SO3, RxSO3, Sim3, interpolate  # noqa: F401
from .se3 import (  # noqa: F401
    rotation_angle,
    se3_exp,
    se3_inverse,
    se3_log,
    so3_exp,
    so3_log,
)

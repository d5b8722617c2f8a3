"""Camera undistortion maps + masks.

Equivalent of Camera::initUndistortRectifyMapAndMask (include/camera.h:
72-105): builds cv2 remap maps for a distorted pinhole camera plus the
white-image undistortion mask whose black edges the training loss masks out
(gaussian_mapper.cpp:415-417). Pyramid-level masks are resized copies, like
the reference's gaus_pyramid_undistort_mask_.
"""

from __future__ import annotations

import numpy as np


class UndistortRectifier:
    def __init__(
        self,
        k: np.ndarray,  # [3,3] intrinsics
        dist: np.ndarray,  # distortion coefficients (radtan)
        width: int,
        height: int,
        new_k: np.ndarray | None = None,
    ):
        import cv2

        self.k = np.asarray(k, np.float64)
        self.dist = np.asarray(dist, np.float64)
        self.size = (width, height)
        self.new_k = self.k if new_k is None else np.asarray(new_k, np.float64)
        self.maps = cv2.initUndistortRectifyMap(
            self.k, self.dist, None, self.new_k, self.size, cv2.CV_32FC1
        )
        white = np.full((height, width), 255, np.uint8)
        self.mask = (
            cv2.remap(white, *self.maps, cv2.INTER_LINEAR) > 0
        ).astype(np.float32)

    def undistort(self, image: np.ndarray) -> np.ndarray:
        import cv2

        return cv2.remap(image, *self.maps, cv2.INTER_LINEAR)

    def pyramid_masks(self, factors) -> list[np.ndarray]:
        import cv2

        out = []
        for f in factors:
            w = int(self.size[0] * f)
            h = int(self.size[1] * f)
            out.append(cv2.resize(self.mask, (w, h), interpolation=cv2.INTER_NEAREST))
        return out

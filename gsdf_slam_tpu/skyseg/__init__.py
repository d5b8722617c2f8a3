"""Sky segmentation pre-pass (KITTI outdoor mode).

Replicates the reference's ONNX sky-segmentation inference
(/root/reference/src/gaussian_mapper.cpp:221-272) on top of the in-repo
minimal ONNX executor (onnx_rt.py), since onnxruntime is absent here:

  1. resize the float RGB image to 320x320,
  2. per-channel ImageNet normalization (x - mean)/std applied to the image
     channels IN STORED ORDER — the reference loads BGR via OpenCV and still
     applies the RGB constants (quirk, gaussian_mapper.cpp:226-228 vs
     data_loader.cpp:129-135); our loader stores RGB so the constants land
     on their proper channels,
  3. run the network (input [1,3,320,320], first output used),
  4. min-max normalize the raw logits to [0,1], scale to uint8,
  5. nearest-resize back to the image size; sky = mask > 32,
  6. black out sky pixels; the training mask is `masked image > 0`
     (the reference overwrites undistort_mask_ with the masked image,
     gaussian_mapper.cpp:273-275).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .onnx_rt import OnnxExecutor, load_model

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class SkySegmenter:
    """Callable sky-mask predictor honoring `settings.skyseg_onnx_path`."""

    def __init__(self, onnx_path: str | Path):
        self.executor = OnnxExecutor(load_model(onnx_path))
        self.graph = self.executor.graph

    def __call__(self, image: np.ndarray) -> np.ndarray:
        """image: [H, W, 3] float RGB in [0,1]. Returns [H, W] bool, True=sky."""
        import cv2

        h, w = image.shape[:2]
        img = cv2.resize(image.astype(np.float32), (320, 320))
        img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
        x = img.transpose(2, 0, 1)[None]  # [1, 3, 320, 320]
        feed_name = self.graph.inputs[0]
        out = self.executor.run({feed_name: x})
        raw_out = np.asarray(out[self.graph.outputs[0]], np.float32)
        if raw_out.size % (320 * 320) != 0:
            raise ValueError(
                "skyseg: unexpected network output shape "
                f"{raw_out.shape} — expected planes of 320x320 (the "
                "reference reads the first plane as cv::Mat(320,320,"
                "CV_32FC1), gaussian_mapper.cpp:254-259)"
            )
        # Take the FIRST 320x320 plane: a two-class head ([1,2,320,320])
        # degrades to its first channel exactly like the reference's
        # cv::Mat(320,320,CV_32FC1,data) view of the output buffer.
        raw = raw_out.reshape(-1, 320, 320)[0]
        lo, hi = float(raw.min()), float(raw.max())
        norm = (raw - lo) / (hi - lo) if hi > lo else np.zeros_like(raw)
        u8 = (norm * 255.0).astype(np.uint8)
        mask = cv2.resize(u8, (w, h), interpolation=cv2.INTER_NEAREST)
        return mask > 32

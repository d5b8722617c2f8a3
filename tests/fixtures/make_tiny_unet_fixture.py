"""Regenerate the committed tiny U-Net skyseg fixture + torch golden.

Run from the repo root:  python tests/fixtures/make_tiny_unet_fixture.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from onnx_builder import tiny_unet_model, tiny_unet_torch, tiny_unet_weights

here = Path(__file__).resolve().parent
weights = tiny_unet_weights()
(here / "tiny_unet_skyseg.onnx").write_bytes(tiny_unet_model(weights))

rng = np.random.default_rng(0)
x = rng.uniform(-2.2, 2.6, (1, 3, 320, 320)).astype(np.float32)
y = tiny_unet_torch(weights, x)
np.savez_compressed(here / "tiny_unet_golden.npz", x=x, y=y)
print("wrote", here / "tiny_unet_skyseg.onnx", y.shape, float(y.mean()))

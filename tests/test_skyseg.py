"""Sky-segmentation tests: the minimal ONNX executor vs torch goldens, and
the mapper wiring of skyseg_onnx_path (gaussian_mapper.cpp:57-66, 221-272).

The fixtures are ONNX files built by a local protobuf wire-format encoder
(the inverse of gsdf_slam_tpu/skyseg/onnx_rt.py's decoder), so no onnx
package is needed.
"""


import numpy as np
import pytest

from gsdf_slam_tpu.skyseg import SkySegmenter
from gsdf_slam_tpu.skyseg.onnx_rt import OnnxExecutor, load_model

from onnx_builder import (  # noqa: E402  (shared with the fixture generator)
    attr, model_bytes, node, tensor_proto,
)

# ------------------------------------------------------------------ tests


def test_onnx_executor_unet_block_matches_torch(tmp_path):
    """Conv(+pads) -> BN -> LeakyRelu -> MaxPool -> Upsample -> Concat ->
    Conv 1x1 -> Sigmoid, verified against torch eager ops."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    w1 = rng.normal(size=(4, 3, 3, 3)).astype(np.float32) * 0.3
    b1 = rng.normal(size=(4,)).astype(np.float32)
    bn_s = rng.uniform(0.5, 1.5, (4,)).astype(np.float32)
    bn_b = rng.normal(size=(4,)).astype(np.float32)
    bn_m = rng.normal(size=(4,)).astype(np.float32) * 0.1
    bn_v = rng.uniform(0.5, 2.0, (4,)).astype(np.float32)
    w2 = rng.normal(size=(1, 7, 1, 1)).astype(np.float32)

    nodes = [
        node("Conv", ["x", "w1", "b1"], ["c1"], kernel_shape=[3, 3],
             pads=[1, 1, 1, 1], strides=[1, 1]),
        node("BatchNormalization", ["c1", "bn_s", "bn_b", "bn_m", "bn_v"],
             ["bn"], epsilon=1e-5),
        node("LeakyRelu", ["bn"], ["lr"], alpha=0.1),
        node("MaxPool", ["lr"], ["mp"], kernel_shape=[2, 2], strides=[2, 2]),
        node("Upsample", ["mp"], ["up"], mode="nearest",
             scales=[1.0, 1.0, 2.0, 2.0]),
        node("Concat", ["up", "x"], ["cat"], axis=1),
        node("Conv", ["cat", "w2"], ["c2"], kernel_shape=[1, 1]),
        node("Sigmoid", ["c2"], ["y"]),
    ]
    inits = {"w1": w1, "b1": b1, "bn_s": bn_s, "bn_b": bn_b, "bn_m": bn_m,
             "bn_v": bn_v, "w2": w2}
    p = tmp_path / "block.onnx"
    p.write_bytes(model_bytes(nodes, inits, ["x"], ["y"]))

    ex = OnnxExecutor(load_model(p))
    got = ex.run({"x": x})["y"]

    t = torch.from_numpy
    c1 = F.conv2d(t(x), t(w1), t(b1), padding=1)
    bn = F.batch_norm(c1, t(bn_m), t(bn_v), t(bn_s), t(bn_b), eps=1e-5)
    lr = F.leaky_relu(bn, 0.1)
    mp = F.max_pool2d(lr, 2)
    up = F.interpolate(mp, scale_factor=2, mode="nearest")
    cat = torch.cat([up, t(x)], dim=1)
    want = torch.sigmoid(F.conv2d(cat, t(w2))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_onnx_executor_convtranspose_and_resize_linear(tmp_path):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
    w = rng.normal(size=(2, 3, 2, 2)).astype(np.float32)

    nodes = [
        node("ConvTranspose", ["x", "w"], ["ct"], kernel_shape=[2, 2],
             strides=[2, 2]),
        node("Resize", ["ct", "", "scales"], ["y"], mode="linear",
             coordinate_transformation_mode="half_pixel"),
    ]
    inits = {"w": w, "scales": np.array([1, 1, 2, 2], np.float32)}
    p = tmp_path / "ct.onnx"
    p.write_bytes(model_bytes(nodes, inits, ["x"], ["y"]))
    got = OnnxExecutor(load_model(p)).run({"x": x})["y"]

    t = torch.from_numpy
    ct = F.conv_transpose2d(t(x), t(w), stride=2)
    want = F.interpolate(ct, scale_factor=2, mode="bilinear",
                         align_corners=False).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _write_brightness_net(path):
    """A 'sky detector': sky = bright pixels. Conv 1x1 with equal channel
    weights -> brightness logits; post-processing (min-max, >32) does the
    thresholding."""
    w = np.full((1, 3, 1, 1), 1.0 / 3.0, np.float32)
    nodes = [node("Conv", ["input", "w"], ["out"], kernel_shape=[1, 1])]
    path.write_bytes(model_bytes(nodes, {"w": w}, ["input"], ["out"]))


def test_sky_segmenter_masks_bright_sky(tmp_path):
    pytest.importorskip("cv2")
    p = tmp_path / "skyseg.onnx"
    _write_brightness_net(p)
    seg = SkySegmenter(p)
    img = np.zeros((48, 64, 3), np.float32)
    img[:20] = 0.9  # bright sky band
    img[20:] = 0.05  # dark ground
    mask = seg(img)
    assert mask.shape == (48, 64)
    assert mask[:18].mean() > 0.95  # sky masked
    assert mask[24:].mean() < 0.05  # ground kept


def test_mapper_skyseg_wiring(tmp_path):
    """skyseg_onnx_path configured -> ingest blacks out sky and builds the
    mask>0 training mask (gaussian_mapper.cpp:273-275 quirk)."""
    pytest.importorskip("cv2")
    import dataclasses

    from test_mapper import _mapper, make_frames

    p = tmp_path / "skyseg.onnx"
    _write_brightness_net(p)
    frames = make_frames(n=1)
    m = _mapper(frames)
    m.settings = dataclasses.replace(m.settings, skyseg_onnx_path=str(p))
    from gsdf_slam_tpu.skyseg import SkySegmenter as S

    m.sky_segmenter = S(p)

    img = np.full((32, 32, 3), 0.05, np.float32)
    img[:10] = 0.95
    kf = m.feed_keyframe(0, np.eye(4, dtype=np.float32), img,
                         depth=np.full((32, 32), 3.0, np.float32))
    assert np.all(kf.image[:8] == 0.0)  # sky blacked out
    assert np.all(kf.image[12:] > 0.0)
    assert kf.mask is not None
    assert np.all(kf.mask[:8] == 0.0) and np.all(kf.mask[12:] == 1.0)


def test_onnx_tiny_unet_fixture_matches_golden():
    """The COMMITTED real-architecture U-Net fixture (Conv+BN+ReLU encoder,
    grouped ConvTranspose decoder, skip Concat, sigmoid head at 320x320)
    runs through the executor and matches the committed torch golden."""
    from pathlib import Path

    fx = Path(__file__).parent / "fixtures"
    ex = OnnxExecutor(load_model(fx / "tiny_unet_skyseg.onnx"))
    g = np.load(fx / "tiny_unet_golden.npz")
    got = ex.run({"input": g["x"]})["prob"]
    assert got.shape == (1, 1, 320, 320)
    np.testing.assert_allclose(got, g["y"], rtol=1e-4, atol=1e-5)


def test_sky_segmenter_runs_real_unet_fixture():
    """SkySegmenter end-to-end over the committed U-Net: a [1,1,320,320]
    head reshapes through the first-plane path and yields a full-res mask."""
    pytest.importorskip("cv2")
    from pathlib import Path

    fx = Path(__file__).parent / "fixtures"
    seg = SkySegmenter(fx / "tiny_unet_skyseg.onnx")
    img = np.random.default_rng(3).uniform(0, 1, (96, 128, 3)).astype(np.float32)
    mask = seg(img)
    assert mask.shape == (96, 128)
    assert mask.dtype == bool


def test_onnx_segformer_export_matches_torch_golden():
    """A REAL torch.onnx export (opset 13) of a SegFormer-class network —
    the architecture family actual sky-seg releases ship — runs through the
    executor and matches the committed torch golden (VERDICT r3 item 7).

    Exercises the exporter-produced op set a production skyseg.onnx
    carries: LayerNorm decomposition (ReduceMean/Sub/Pow/Sqrt/Div),
    efficient attention (MatMul/Softmax + Shape/Gather/Unsqueeze/Concat
    shape machinery, 0-D-index Gather axis drops), GELU-as-Erf, depthwise
    conv, bilinear half_pixel Resize with runtime sizes (dynamic H/W
    axes), Slice, Cast, folded BatchNorm, two-class Softmax head. 705
    nodes / 23 distinct ops.
    Regenerate with tests/fixtures/make_segformer_fixture.py."""
    from pathlib import Path

    fx = Path(__file__).parent / "fixtures"
    ex = OnnxExecutor(load_model(fx / "segformer_skyseg.onnx"))
    g = np.load(fx / "segformer_golden.npz")
    got = ex.run({"input": g["x"].astype(np.float32)})["prob"]
    assert got.shape == (1, 2, 192, 192)
    # golden is stored f16; 1e-3 absolute covers its quantization plus
    # executor/torch conv-order float drift on [0,1] probabilities
    np.testing.assert_allclose(got, g["y"].astype(np.float32), atol=1e-3)


def test_sky_segmenter_runs_segformer_fixture():
    """SkySegmenter end-to-end over the SegFormer export: [1,2,H,W]
    two-class softmax heads select the sky plane and threshold to a mask."""
    pytest.importorskip("cv2")
    from pathlib import Path

    fx = Path(__file__).parent / "fixtures"
    seg = SkySegmenter(fx / "segformer_skyseg.onnx")
    img = np.random.default_rng(3).uniform(0, 1, (96, 128, 3)).astype(np.float32)
    mask = seg(img)
    assert mask.shape == (96, 128)
    assert mask.dtype == bool

"""Sky-segmentation tests: the minimal ONNX executor vs torch goldens, and
the mapper wiring of skyseg_onnx_path (gaussian_mapper.cpp:57-66, 221-272).

The fixtures are ONNX files built by a local protobuf wire-format encoder
(the inverse of gsdf_slam_tpu/skyseg/onnx_rt.py's decoder), so no onnx
package is needed.
"""

import struct

import numpy as np
import pytest

from gsdf_slam_tpu.skyseg import SkySegmenter
from gsdf_slam_tpu.skyseg.onnx_rt import OnnxExecutor, load_model

# ---------------------------------------------------------------- encoder


def _varint(v: int) -> bytes:
    out = b""
    v &= (1 << 64) - 1
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _tag(fnum: int, wtype: int) -> bytes:
    return _varint(fnum << 3 | wtype)


def _ld(fnum: int, payload: bytes) -> bytes:  # length-delimited
    return _tag(fnum, 2) + _varint(len(payload)) + payload


def _vi(fnum: int, v: int) -> bytes:  # varint field
    return _tag(fnum, 0) + _varint(v)


def _f32(fnum: int, v: float) -> bytes:  # fixed32 field
    return _tag(fnum, 5) + struct.pack("<f", v)


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    dt = {np.float32: 1, np.int64: 7}[arr.dtype.type]
    buf = b"".join(_vi(1, d) for d in arr.shape)
    buf += _vi(2, dt)
    buf += _ld(8, name.encode())
    buf += _ld(9, arr.tobytes())
    return buf


def attr(name: str, value) -> bytes:
    buf = _ld(1, name.encode())
    if isinstance(value, float):
        buf += _f32(2, value)
    elif isinstance(value, bool) or isinstance(value, int):
        buf += _vi(3, int(value))
    elif isinstance(value, str):
        buf += _ld(4, value.encode())
    elif isinstance(value, (list, tuple)) and all(
        isinstance(v, int) for v in value
    ):
        buf += b"".join(_vi(8, v) for v in value)
    elif isinstance(value, (list, tuple)):
        buf += b"".join(_f32(7, v) for v in value)
    elif isinstance(value, np.ndarray):
        buf += _ld(5, tensor_proto("", value))
    else:
        raise TypeError(type(value))
    return buf


def node(op: str, inputs, outputs, **attrs) -> bytes:
    buf = b"".join(_ld(1, i.encode()) for i in inputs)
    buf += b"".join(_ld(2, o.encode()) for o in outputs)
    buf += _ld(4, op.encode())
    buf += b"".join(_ld(5, attr(k, v)) for k, v in attrs.items())
    return buf


def model_bytes(nodes, initializers, inputs, outputs) -> bytes:
    g = b"".join(_ld(1, n) for n in nodes)
    g += b"".join(_ld(5, tensor_proto(k, v)) for k, v in initializers.items())
    g += b"".join(_ld(11, _ld(1, i.encode())) for i in inputs)
    g += b"".join(_ld(12, _ld(1, o.encode())) for o in outputs)
    return _vi(1, 7) + _ld(7, g)


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

"""Minimal ONNX runtime: wire-format parser + JAX/numpy executor.

The reference runs a sky-segmentation network through onnxruntime
(/root/reference/src/gaussian_mapper.cpp:57-66 creates the ORT session;
:221-272 is the 320x320 inference). onnxruntime is not available in this
environment, so this module is a self-contained replacement for the subset
of ONNX a segmentation CNN uses:

  * a generic protobuf wire-format decoder (ONNX files are protobuf; the
    field numbers below follow the public onnx.proto3 schema),
  * an executor with numpy semantics for shape machinery and jitted
    `jax.lax.conv_general_dilated` / reduce-window calls for the heavy ops
    (conv, pools), cached per shape signature.

Unsupported ops raise a clear error naming the op. Execution is eager and
topological; a 320x320 UNet evaluates in a few tens of ms on one chip.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import numpy as np

# --------------------------------------------------------------------------
# protobuf wire-format decoding
# --------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _decode_fields(buf: bytes) -> dict[int, list]:
    """Decode a message into {field_number: [raw values]} (wire-type aware)."""
    out: dict[int, list] = {}
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:  # 64-bit
            val = buf[pos : pos + 8]
            pos += 8
        elif wtype == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == 5:  # 32-bit
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        out.setdefault(fnum, []).append(val)
    return out


def _signed(v: int) -> int:
    """Interpret a 64-bit varint as two's-complement int64."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _packed_varints(vals: list) -> list[int]:
    """Repeated varint field: either packed bytes or one entry per value."""
    out = []
    for v in vals:
        if isinstance(v, (bytes, bytearray)):
            pos = 0
            while pos < len(v):
                x, pos = _read_varint(v, pos)
                out.append(_signed(x))
        else:
            out.append(_signed(v))
    return out


_ONNX_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _decode_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    """TensorProto: dims(1) data_type(2) float_data(4) int32_data(5)
    int64_data(7) name(8) raw_data(9) double_data(10)."""
    f = _decode_fields(buf)
    dims = _packed_varints(f.get(1, []))
    dtype = _ONNX_DTYPES[f.get(2, [1])[0]]
    name = f.get(8, [b""])[0].decode()
    if 9 in f:  # raw_data
        arr = np.frombuffer(f[9][0], dtype=dtype)
    elif 4 in f:  # float_data (packed or repeated fixed32)
        raw = b"".join(x if isinstance(x, bytes) else struct.pack("<f", x) for x in f[4])
        arr = np.frombuffer(raw, dtype=np.float32).astype(dtype)
    elif 7 in f:  # int64_data
        arr = np.array(_packed_varints(f[7]), dtype=np.int64).astype(dtype)
    elif 5 in f:  # int32_data
        arr = np.array(_packed_varints(f[5]), dtype=np.int32).astype(dtype)
    elif 10 in f:  # double_data
        raw = b"".join(x if isinstance(x, bytes) else struct.pack("<d", x) for x in f[10])
        arr = np.frombuffer(raw, dtype=np.float64).astype(dtype)
    else:
        arr = np.zeros(0, dtype=dtype)
    # dims == [] with one element is a legal 0-D scalar tensor — preserve
    # its rank (Gather with a 0-D index must DROP the axis, opset rules)
    return name, arr.reshape(dims) if dims or arr.size == 1 else arr


def _decode_attribute(buf: bytes):
    """AttributeProto: name(1) f(2) i(3) s(4) t(5) floats(7) ints(8)."""
    f = _decode_fields(buf)
    name = f[1][0].decode()
    if 5 in f:
        return name, _decode_tensor(f[5][0])[1]
    if 2 in f:
        return name, struct.unpack("<f", f[2][0])[0]
    if 3 in f:
        return name, _signed(f[3][0])
    if 7 in f:
        raw = b"".join(x if isinstance(x, bytes) else struct.pack("<f", x) for x in f[7])
        return name, np.frombuffer(raw, np.float32).tolist()
    if 8 in f:
        return name, _packed_varints(f[8])
    if 4 in f:
        return name, f[4][0].decode(errors="replace")
    return name, None


@dataclass
class OnnxNode:
    op_type: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict = field(default_factory=dict)


@dataclass
class OnnxGraph:
    nodes: list[OnnxNode]
    initializers: dict[str, np.ndarray]
    inputs: list[str]
    outputs: list[str]


def load_model(path: str | Path) -> OnnxGraph:
    """Parse ModelProto(graph=7) -> GraphProto(node=1, initializer=5,
    input=11, output=12); ValueInfoProto name is field 1."""
    data = Path(path).read_bytes()
    model = _decode_fields(data)
    graph = _decode_fields(model[7][0])
    nodes = []
    for nb in graph.get(1, []):
        nf = _decode_fields(nb)
        attrs = dict(_decode_attribute(ab) for ab in nf.get(5, []))
        nodes.append(
            OnnxNode(
                op_type=nf[4][0].decode(),
                inputs=[x.decode() for x in nf.get(1, [])],
                outputs=[x.decode() for x in nf.get(2, [])],
                attrs=attrs,
            )
        )
    inits = dict(_decode_tensor(tb) for tb in graph.get(5, []))
    ins = [
        _decode_fields(vb)[1][0].decode()
        for vb in graph.get(11, [])
    ]
    outs = [_decode_fields(vb)[1][0].decode() for vb in graph.get(12, [])]
    return OnnxGraph(nodes, inits, [i for i in ins if i not in inits], outs)


# --------------------------------------------------------------------------
# executor
# --------------------------------------------------------------------------


def _auto_pad_explicit(auto_pad, pads, kshape, strides, in_shape):
    """Resolve auto_pad/pads into per-spatial-dim (lo, hi) pairs."""
    nd = len(kshape)
    if auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        out = []
        for i in range(nd):
            osz = -(-in_shape[i] // strides[i])
            total = max(0, (osz - 1) * strides[i] + kshape[i] - in_shape[i])
            lo = total // 2 if auto_pad == "SAME_UPPER" else total - total // 2
            out.append((lo, total - lo))
        return out
    if pads is None:
        return [(0, 0)] * nd
    return [(pads[i], pads[i + nd]) for i in range(nd)]


def _jit_conv(x, w, strides, padding, dilations, groups):
    import jax

    @partial(jax.jit, static_argnums=(2, 3, 4, 5))
    def conv(x, w, strides, padding, dilations, groups):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            rhs_dilation=dilations, feature_group_count=groups,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )

    return np.asarray(conv(x, w, tuple(strides), tuple(map(tuple, padding)),
                           tuple(dilations), int(groups)))


def _pool(x, kshape, strides, padding, kind):
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnums=(1, 2, 3, 4))
    def pool(x, kshape, strides, padding, kind):
        dims = (1, 1) + tuple(kshape)
        strd = (1, 1) + tuple(strides)
        pad = ((0, 0), (0, 0)) + padding
        if kind == "max":
            return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strd, pad)
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strd, pad)
        c = jax.lax.reduce_window(jnp.ones_like(x), 0.0, jax.lax.add, dims, strd, pad)
        return s / c

    return np.asarray(pool(x, tuple(kshape), tuple(strides),
                           tuple(map(tuple, padding)), kind))


def _resize_nchw(x: np.ndarray, out_hw, mode: str, coord: str) -> np.ndarray:
    """Nearest / bilinear resize on the last two axes of NCHW."""
    n, c, h, w = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if mode.startswith("nearest"):
        # asymmetric: src = floor(dst * scale) — matches Upsample-v7 and
        # Resize(nearest, coordinate_transformation_mode=asymmetric)
        ys = np.minimum((np.arange(oh) * (h / oh)).astype(np.int64), h - 1)
        xs = np.minimum((np.arange(ow) * (w / ow)).astype(np.int64), w - 1)
        return x[:, :, ys[:, None], xs[None, :]]
    # (bi)linear
    if coord == "align_corners":
        ys = np.linspace(0, h - 1, oh) if oh > 1 else np.zeros(1)
        xs = np.linspace(0, w - 1, ow) if ow > 1 else np.zeros(1)
    else:  # half_pixel / pytorch_half_pixel / asymmetric approx
        ys = np.clip((np.arange(oh) + 0.5) * (h / oh) - 0.5, 0, h - 1)
        xs = np.clip((np.arange(ow) + 0.5) * (w / ow) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(x.dtype)[None, None, :, None]
    wx = (xs - x0).astype(x.dtype)[None, None, None, :]
    a = x[:, :, y0[:, None], x0[None, :]]
    b = x[:, :, y0[:, None], x1[None, :]]
    cc = x[:, :, y1[:, None], x0[None, :]]
    d = x[:, :, y1[:, None], x1[None, :]]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + cc * wy * (1 - wx) + d * wy * wx)


class OnnxExecutor:
    """Eager topological executor over numpy values."""

    def __init__(self, graph: OnnxGraph):
        self.graph = graph

    def run(self, feeds: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
        env: dict[str, np.ndarray] = dict(self.graph.initializers)
        env.update({k: np.asarray(v) for k, v in feeds.items()})
        for node in self.graph.nodes:
            self._exec(node, env)
        return {o: env[o] for o in self.graph.outputs}

    # -- op dispatch -------------------------------------------------------
    def _exec(self, node: OnnxNode, env: dict) -> None:
        op = node.op_type
        a = node.attrs
        x = [env[i] if i else None for i in node.inputs]
        out = node.outputs

        def put(*vals):
            for name, v in zip(out, vals):
                env[name] = v

        if op == "Conv":
            w = x[1]
            kshape = a.get("kernel_shape", list(w.shape[2:]))
            strides = a.get("strides", [1] * len(kshape))
            dil = a.get("dilations", [1] * len(kshape))
            eff_k = [(k - 1) * d + 1 for k, d in zip(kshape, dil)]
            pad = _auto_pad_explicit(a.get("auto_pad", "NOTSET"), a.get("pads"),
                                     eff_k, strides, x[0].shape[2:])
            y = _jit_conv(x[0].astype(np.float32), w.astype(np.float32),
                          strides, pad, dil, a.get("group", 1))
            if len(x) > 2 and x[2] is not None:
                y = y + x[2].reshape(1, -1, *([1] * (y.ndim - 2)))
            put(y)
        elif op == "ConvTranspose":
            import jax

            w = x[1]  # [C_in, C_out/groups, kH, kW]
            kshape = a.get("kernel_shape", list(w.shape[2:]))
            strides = a.get("strides", [1] * len(kshape))
            pads = a.get("pads", [0] * (2 * len(kshape)))
            out_pad = a.get("output_padding", [0] * len(kshape))
            groups = a.get("group", 1)
            # transpose conv = lhs-dilated conv with flipped, swapped kernel.
            # Grouped (common in U-Net decoders): ONNX weight is
            # [C_in, C_out/G, kh, kw] with C_in split into G groups; the
            # equivalent grouped forward conv wants OIHW = [C_out, C_in/G,
            # kh, kw] with the flip+swap applied PER GROUP.
            wf = np.flip(w, axis=tuple(range(2, w.ndim)))
            cin, cog = w.shape[0], w.shape[1]
            wt = (
                wf.reshape((groups, cin // groups, cog) + w.shape[2:])
                .swapaxes(1, 2)
                .reshape((groups * cog, cin // groups) + w.shape[2:])
            )
            pad = [
                (k - 1 - pads[i], k - 1 - pads[i + len(kshape)] + out_pad[i])
                for i, k in enumerate(kshape)
            ]
            y = np.asarray(
                jax.lax.conv_general_dilated(
                    x[0].astype(np.float32), wt.astype(np.float32),
                    window_strides=[1] * len(kshape), padding=pad,
                    lhs_dilation=strides,
                    dimension_numbers=("NCHW", "OIHW", "NCHW"),
                    feature_group_count=groups,
                )
            )
            if len(x) > 2 and x[2] is not None:
                y = y + x[2].reshape(1, -1, *([1] * (y.ndim - 2)))
            put(y)
        elif op in ("MaxPool", "AveragePool"):
            kshape = a["kernel_shape"]
            strides = a.get("strides", [1] * len(kshape))
            pad = _auto_pad_explicit(a.get("auto_pad", "NOTSET"), a.get("pads"),
                                     kshape, strides, x[0].shape[2:])
            put(_pool(x[0].astype(np.float32), kshape, strides, pad,
                      "max" if op == "MaxPool" else "avg"))
        elif op == "GlobalAveragePool":
            put(x[0].mean(axis=tuple(range(2, x[0].ndim)), keepdims=True))
        elif op == "BatchNormalization":
            scale, b, mean, var = x[1], x[2], x[3], x[4]
            eps = a.get("epsilon", 1e-5)
            shape = (1, -1) + (1,) * (x[0].ndim - 2)
            put(((x[0] - mean.reshape(shape)) / np.sqrt(var.reshape(shape) + eps)
                 * scale.reshape(shape) + b.reshape(shape)).astype(np.float32))
        elif op == "InstanceNormalization":
            eps = a.get("epsilon", 1e-5)
            ax = tuple(range(2, x[0].ndim))
            mu = x[0].mean(axis=ax, keepdims=True)
            var = x[0].var(axis=ax, keepdims=True)
            shape = (1, -1) + (1,) * (x[0].ndim - 2)
            put(((x[0] - mu) / np.sqrt(var + eps) * x[1].reshape(shape)
                 + x[2].reshape(shape)).astype(np.float32))
        elif op == "Relu":
            put(np.maximum(x[0], 0))
        elif op == "LeakyRelu":
            alpha = a.get("alpha", 0.01)
            put(np.where(x[0] > 0, x[0], alpha * x[0]).astype(np.float32))
        elif op == "PRelu":
            s = x[1].reshape((1, -1) + (1,) * (x[0].ndim - 2)) if x[1].ndim == 1 else x[1]
            put(np.where(x[0] > 0, x[0], s * x[0]).astype(np.float32))
        elif op == "Sigmoid":
            put(1.0 / (1.0 + np.exp(-x[0])))
        elif op == "Tanh":
            put(np.tanh(x[0]))
        elif op == "Softmax":
            ax = a.get("axis", -1)
            e = np.exp(x[0] - x[0].max(axis=ax, keepdims=True))
            put(e / e.sum(axis=ax, keepdims=True))
        elif op == "Clip":
            lo = x[1] if len(x) > 1 and x[1] is not None else a.get("min", -np.inf)
            hi = x[2] if len(x) > 2 and x[2] is not None else a.get("max", np.inf)
            put(np.clip(x[0], lo, hi))
        elif op in ("Add", "Sum"):
            y = x[0]
            for v in x[1:]:
                y = y + v
            put(y)
        elif op == "Sub":
            put(x[0] - x[1])
        elif op == "Mul":
            put(x[0] * x[1])
        elif op == "Div":
            put(x[0] / x[1])
        elif op == "Pow":
            put(np.power(x[0], x[1]))
        elif op == "Sqrt":
            put(np.sqrt(x[0]))
        elif op == "Exp":
            put(np.exp(x[0]))
        elif op == "Neg":
            put(-x[0])
        elif op == "Abs":
            put(np.abs(x[0]))
        elif op == "Min":
            put(np.minimum(x[0], x[1]))
        elif op == "Max":
            put(np.maximum(x[0], x[1]))
        elif op == "Concat":
            put(np.concatenate([v for v in x], axis=a.get("axis", 0)))
        elif op == "Flatten":
            ax = a.get("axis", 1)
            put(x[0].reshape(int(np.prod(x[0].shape[:ax] or (1,))), -1))
        elif op == "Reshape":
            shape = [int(s) for s in (x[1] if len(x) > 1 else a["shape"])]
            for i, s in enumerate(shape):
                if s == 0:
                    shape[i] = x[0].shape[i]
            put(x[0].reshape(shape))
        elif op == "Transpose":
            put(np.transpose(x[0], a.get("perm")))
        elif op == "Squeeze":
            axes = a.get("axes") or (x[1].tolist() if len(x) > 1 else None)
            put(np.squeeze(x[0], axis=tuple(axes) if axes else None))
        elif op == "Unsqueeze":
            axes = a.get("axes") or x[1].tolist()
            y = x[0]
            for ax in sorted(int(v) for v in axes):
                y = np.expand_dims(y, ax)
            put(y)
        elif op == "Shape":
            put(np.array(x[0].shape, np.int64))
        elif op == "Gather":
            put(np.take(x[0], x[1].astype(np.int64), axis=a.get("axis", 0)))
        elif op == "Cast":
            put(x[0].astype(_ONNX_DTYPES[a["to"]]))
        elif op == "Slice":
            if len(x) > 1:  # opset 10+: starts/ends/axes/steps as inputs
                starts, ends = x[1].tolist(), x[2].tolist()
                axes = x[3].tolist() if len(x) > 3 and x[3] is not None else list(range(len(starts)))
                steps = x[4].tolist() if len(x) > 4 and x[4] is not None else [1] * len(starts)
            else:
                starts, ends = a["starts"], a["ends"]
                axes = a.get("axes", list(range(len(starts))))
                steps = [1] * len(starts)
            sl = [slice(None)] * x[0].ndim
            for s, e, ax, st in zip(starts, ends, axes, steps):
                sl[int(ax)] = slice(int(s), None if e >= (1 << 62) else int(e), int(st))
            put(x[0][tuple(sl)])
        elif op == "Pad":
            mode = a.get("mode", "constant")
            pads = a.get("pads") or x[1].tolist()
            nd = x[0].ndim
            width = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
            if mode == "constant":
                cval = 0.0
                if len(x) > 2 and x[2] is not None and np.asarray(x[2]).size:
                    cval = float(np.asarray(x[2]).reshape(-1)[0])
                put(np.pad(x[0], width, mode="constant", constant_values=cval))
            else:
                put(np.pad(x[0], width,
                           mode="edge" if mode == "edge" else "reflect"))
        elif op == "Upsample":  # opset <= 9
            scales = a.get("scales") or x[1].reshape(-1).tolist()
            oh = int(x[0].shape[2] * scales[2])
            ow = int(x[0].shape[3] * scales[3])
            put(_resize_nchw(x[0], (oh, ow), a.get("mode", "nearest"), "asymmetric"))
        elif op == "Resize":  # opset 10+
            mode = a.get("mode", "nearest")
            coord = a.get("coordinate_transformation_mode", "half_pixel")
            if len(x) > 3 and x[3] is not None and x[3].size:
                oh, ow = int(x[3][-2]), int(x[3][-1])
            else:
                scales = x[2].reshape(-1) if len(x) > 2 and x[2] is not None else x[1].reshape(-1)
                oh = int(round(x[0].shape[2] * float(scales[-2])))
                ow = int(round(x[0].shape[3] * float(scales[-1])))
            put(_resize_nchw(x[0], (oh, ow), mode, coord))
        elif op == "Gemm":
            y = x[0]
            w = x[1]
            if a.get("transA"):
                y = y.T
            if a.get("transB"):
                w = w.T
            y = a.get("alpha", 1.0) * (y @ w)
            if len(x) > 2 and x[2] is not None:
                y = y + a.get("beta", 1.0) * x[2]
            put(y.astype(np.float32))
        elif op == "MatMul":
            put((x[0] @ x[1]).astype(np.float32))
        elif op == "ReduceMean":
            axes = a.get("axes")
            put(x[0].mean(axis=tuple(axes) if axes else None,
                          keepdims=bool(a.get("keepdims", 1))))
        elif op in ("Identity", "Dropout"):
            put(x[0])
        elif op == "Constant":
            if "value" in a:
                put(a["value"])
            elif "value_float" in a:
                put(np.float32(a["value_float"]))
            elif "value_int" in a:
                put(np.int64(a["value_int"]))
            elif "value_ints" in a:
                put(np.asarray(a["value_ints"], np.int64))
            elif "value_floats" in a:
                put(np.asarray(a["value_floats"], np.float32))
            else:
                raise NotImplementedError(
                    f"Constant node with attrs {sorted(a)} is not supported"
                )
        elif op == "Split":
            axis = a.get("axis", 0)
            if len(x) > 1 and x[1] is not None:  # opset 13+: sizes input
                secs = np.cumsum(np.asarray(x[1]).reshape(-1))[:-1]
            elif "split" in a:
                secs = np.cumsum(a["split"])[:-1]
            else:
                secs = len(out)
            put(*np.split(x[0], secs, axis=axis))
        elif op == "Erf":
            t = 1.0 / (1.0 + 0.3275911 * np.abs(x[0]))
            poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                    + t * (-1.453152027 + t * 1.061405429))))
            put(np.sign(x[0]) * (1.0 - poly * np.exp(-x[0] * x[0])))
        else:
            raise NotImplementedError(
                f"ONNX op '{op}' is not implemented by gsdf_slam_tpu.skyseg"
            )

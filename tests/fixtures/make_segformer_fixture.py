"""Regenerate the committed SegFormer-class skyseg fixture + torch golden.

The reference feeds an ARBITRARY user-supplied ONNX graph through
onnxruntime (src/gaussian_mapper.cpp:57-66, :221-272); the committed tiny
U-Net fixture only proves the Conv/BN/ReLU subset. This fixture is a real
torch.onnx EXPORT (opset 13) of a SegFormer-family segmentation network —
the architecture class actual sky-segmentation releases ship — so it
carries the exporter-produced op set a real `skyseg.onnx` would:
LayerNorm decomposition (ReduceMean/Sub/Pow/Sqrt/Div), efficient attention
(MatMul/Softmax/Transpose/Reshape driven by Shape/Gather/Unsqueeze/Concat
shape machinery), GELU-as-Erf, depthwise Conv, strided patch-embed Convs,
bilinear Resize (half_pixel, opset-13 sizes/scales inputs), all-MLP decode
head with Concat + BatchNorm + two-class Softmax.

Run from the repo root:  python tests/fixtures/make_segformer_fixture.py
(needs the baked-in CPU torch; the onnx pip package is NOT needed — the
TorchScript exporter only imports it for onnxscript custom functions,
which this graph has none of, so that hook is stubbed out).
"""

from pathlib import Path

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

HERE = Path(__file__).resolve().parent


class MixFFN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.fc1 = nn.Linear(c, c * 2)
        self.dw = nn.Conv2d(c * 2, c * 2, 3, padding=1, groups=c * 2)
        self.fc2 = nn.Linear(c * 2, c)

    def forward(self, x, h, w):
        b = x.shape[0]
        y = self.fc1(x)
        y = y.transpose(1, 2).reshape(b, -1, h, w)
        y = self.dw(y).flatten(2).transpose(1, 2)
        return self.fc2(F.gelu(y))


class EfficientAttn(nn.Module):
    """SegFormer attention: spatial-reduction conv on K/V, multi-head."""

    def __init__(self, c, heads=2, sr=2):
        super().__init__()
        self.h = heads
        self.q = nn.Linear(c, c)
        self.kv = nn.Linear(c, c * 2)
        self.proj = nn.Linear(c, c)
        self.sr = nn.Conv2d(c, c, sr, stride=sr)
        self.norm = nn.LayerNorm(c)

    def forward(self, x, h, w):
        b, n, c = x.shape
        q = self.q(x).reshape(b, n, self.h, c // self.h).permute(0, 2, 1, 3)
        xs = x.transpose(1, 2).reshape(b, c, h, w)
        xs = self.sr(xs).reshape(b, c, -1).transpose(1, 2)
        xs = self.norm(xs)
        kv = self.kv(xs).reshape(b, -1, 2, self.h, c // self.h)
        kv = kv.permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        att = (q @ k.transpose(-2, -1)) * (c // self.h) ** -0.5
        att = att.softmax(dim=-1)
        y = (att @ v).transpose(1, 2).reshape(b, n, c)
        return self.proj(y)


class Block(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.n1 = nn.LayerNorm(c)
        self.a = EfficientAttn(c)
        self.n2 = nn.LayerNorm(c)
        self.f = MixFFN(c)

    def forward(self, x, h, w):
        x = x + self.a(self.n1(x), h, w)
        x = x + self.f(self.n2(x), h, w)
        return x


class SegFormerTiny(nn.Module):
    def __init__(self):
        super().__init__()
        cs = [16, 32, 64]
        self.emb = nn.ModuleList([
            nn.Conv2d(3, cs[0], 7, stride=4, padding=3),
            nn.Conv2d(cs[0], cs[1], 3, stride=2, padding=1),
            nn.Conv2d(cs[1], cs[2], 3, stride=2, padding=1),
        ])
        self.enorm = nn.ModuleList([nn.LayerNorm(c) for c in cs])
        self.blocks = nn.ModuleList([Block(c) for c in cs])
        self.lin = nn.ModuleList([nn.Linear(c, 32) for c in cs])
        self.fuse = nn.Sequential(
            nn.Conv2d(96, 32, 1), nn.BatchNorm2d(32), nn.ReLU()
        )
        self.head = nn.Conv2d(32, 2, 1)

    def forward(self, x):
        b = x.shape[0]
        feats = []
        for emb, norm, blk in zip(self.emb, self.enorm, self.blocks):
            x = emb(x)
            h, w = x.shape[2], x.shape[3]
            t = x.flatten(2).transpose(1, 2)
            t = blk(norm(t), h, w)
            x = t.transpose(1, 2).reshape(b, -1, h, w)
            feats.append(x)
        h0, w0 = feats[0].shape[2], feats[0].shape[3]
        ups = []
        for f, lin in zip(feats, self.lin):
            t = lin(f.flatten(2).transpose(1, 2))
            f = t.transpose(1, 2).reshape(b, -1, f.shape[2], f.shape[3])
            ups.append(F.interpolate(
                f, size=(h0, w0), mode="bilinear", align_corners=False))
        y = self.fuse(torch.cat(ups[::-1], dim=1))
        y = self.head(y)
        y = F.interpolate(y, scale_factor=4.0, mode="bilinear",
                          align_corners=False)
        return y.softmax(dim=1)


def main():
    from torch.onnx._internal.torchscript_exporter import onnx_proto_utils

    # the exporter imports the onnx pip package only to inline onnxscript
    # custom functions; this graph has none, and onnx isn't in this image
    onnx_proto_utils._add_onnxscript_fn = lambda proto, custom_opsets: proto

    torch.manual_seed(0)
    m = SegFormerTiny().eval()
    x = torch.from_numpy(
        np.random.default_rng(0)
        .uniform(-2.2, 2.6, (1, 3, 192, 192))
        .astype(np.float16)
        .astype(np.float32)
    )
    with torch.no_grad():
        y = m(x)
    torch.onnx.export(
        m, x, str(HERE / "segformer_skyseg.onnx"), opset_version=13,
        input_names=["input"], output_names=["prob"], dynamo=False,
        # dynamic H/W like real segmentation releases: the exporter then
        # emits the full dynamic-shape machinery (Shape/Gather/Concat-driven
        # Reshapes, Resize with runtime sizes), and the graph accepts the
        # reference's fixed 320x320 skyseg feed (gaussian_mapper.cpp:221-272)
        # as well as this fixture's 192x192 golden
        dynamic_axes={"input": {2: "h", 3: "w"}, "prob": {2: "h", 3: "w"}},
    )
    np.savez_compressed(
        HERE / "segformer_golden.npz",
        x=x.numpy().astype(np.float16),
        y=y.numpy().astype(np.float16),
    )
    print("wrote", HERE / "segformer_skyseg.onnx", tuple(y.shape),
          float(y.mean()))


if __name__ == "__main__":
    main()

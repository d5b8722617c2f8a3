"""Tests for auxiliary components: SE3, coordinates, native IO, checkpoints,
variable parameters, SLAM feed, viewer endpoints, undistortion."""

import numpy as np
import pytest

from gsdf_slam_tpu.utils import (
    rotation_angle,
    se3_exp,
    se3_inverse,
    se3_log,
    so3_exp,
    so3_log,
)


def test_se3_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        xi = rng.normal(0, 0.8, 6)
        t = se3_exp(xi)
        np.testing.assert_allclose(se3_log(t), xi, atol=1e-8)
        np.testing.assert_allclose(t @ se3_inverse(t), np.eye(4), atol=1e-10)
    w = rng.normal(0, 1, 3)
    np.testing.assert_allclose(so3_log(so3_exp(w)), w, atol=1e-8)
    assert abs(rotation_angle(so3_exp([0.3, 0, 0])) - 0.3) < 1e-8


def test_coordinates_roundtrip():
    from gsdf_slam_tpu.utils import convert_points

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(5, 3))
    back = convert_points(convert_points(pts, "opencv", "kitti_lidar"), "kitti_lidar", "opencv")
    np.testing.assert_allclose(back, pts, atol=1e-12)
    # kitti lidar x-forward maps to opencv z-forward
    fwd = convert_points(np.array([[1.0, 0, 0]]), "kitti_lidar", "opencv")
    np.testing.assert_allclose(fwd, [[0, 0, 1]], atol=1e-12)


def test_native_io_matches_python(tmp_path):
    from gsdf_slam_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(2)
    # kitti bin
    pts = rng.normal(size=(100, 4)).astype(np.float32)
    f = tmp_path / "a.bin"
    pts.tofile(f)
    np.testing.assert_allclose(native_io.read_kitti_bin(f), pts[:, :3])
    # poses, all four formats
    from gsdf_slam_tpu.data.base_parser import load_poses

    m = rng.normal(size=(2, 4, 4))
    p1 = tmp_path / "p1.txt"
    p1.write_text("\n".join(" ".join(f"{v:.9f}" for v in row.reshape(-1)) for row in m))
    nat, _ = native_io.load_poses(p1, 1)
    py, _ = load_poses(p1, 1)
    np.testing.assert_allclose(nat, py, atol=1e-6)
    p3 = tmp_path / "p3.txt"
    p3.write_text("12.5 1 2 3 0.1 0.2 0.3 0.95\n")
    nat3, st3 = native_io.load_poses(p3, 3)
    py3, pst3 = load_poses(p3, 3)
    np.testing.assert_allclose(nat3, py3, atol=1e-6)
    assert st3[0] == pst3[0]
    # ply
    from gsdf_slam_tpu.io import write_ply

    f2 = tmp_path / "c.ply"
    write_ply(f2, {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]})
    np.testing.assert_allclose(native_io.read_ply_xyz(f2), pts[:, :3], atol=1e-7)


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    from test_mapper import _mapper, make_frames

    frames = make_frames(n=2)
    m = _mapper(frames)
    m.ingest_frame(0, frames[0])
    m.train_for_one_iteration()
    m.train_for_one_iteration()
    ckpt = tmp_path / "ck.npz"
    m.save_checkpoint(ckpt)

    m2 = _mapper(frames)
    m2.load_checkpoint(ckpt)
    assert m2.iteration == m.iteration
    assert int(m2.state.count) == int(m.state.count)
    np.testing.assert_allclose(np.asarray(m2.state.xyz), np.asarray(m.state.xyz))
    np.testing.assert_allclose(np.asarray(m2.adam.m["xyz"]), np.asarray(m.adam.m["xyz"]))
    assert int(m2.adam.step) == int(m.adam.step)


def test_variable_parameters_roundtrip():
    from test_mapper import _mapper, make_frames

    m = _mapper(make_frames(n=1))
    p = m.get_variable_parameters()
    p.feature_lr = 0.9
    p.densify_interval = 77
    m.set_variable_parameters(p)
    p2 = m.get_variable_parameters()
    assert p2.feature_lr == pytest.approx(0.9)
    assert p2.densify_interval == 77


def test_feed_keyframe_slam_mode():
    from test_mapper import _mapper, make_frames

    frames = make_frames(n=1)
    m = _mapper(frames)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    depth = np.full((32, 32), 3.0, np.float32)
    kf = m.feed_keyframe(0, np.eye(4, dtype=np.float32), img, depth=depth)
    assert m.initial_mapped
    assert int(m.state.count) > 0
    out = m.train_for_one_iteration()
    assert out is not None and np.isfinite(out["loss"])
    # sparse tracker points accumulate for input.ply (sparse PLY export)
    pts = rng.uniform(-1, 1, (50, 3)).astype(np.float32)
    m.feed_keyframe(1, np.eye(4, dtype=np.float32), img, points=pts,
                    colors=np.full((50, 3), 0.5, np.float32))
    assert len(m.sparse_points_xyz) == 1 and len(m.sparse_points_xyz[0]) == 50


def test_undistort_mask():
    cv2 = pytest.importorskip("cv2")
    from gsdf_slam_tpu.engine.camera_undistort import UndistortRectifier

    k = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    dist = np.array([0.3, 0.0, 0.0, 0.0])  # pincushion -> black corners
    u = UndistortRectifier(k, dist, 64, 48)
    assert u.mask.shape == (48, 64)
    assert u.mask[0, 0] == 0.0 and u.mask.mean() < 1.0
    masks = u.pyramid_masks([0.5, 0.25])
    assert masks[0].shape == (24, 32) and masks[1].shape == (12, 16)


def test_viewer_endpoints():
    import json
    import urllib.request

    from gsdf_slam_tpu.viewer import ViewerServer
    from test_mapper import _mapper, make_frames

    frames = make_frames(n=1)
    m = _mapper(frames)
    m.ingest_frame(0, frames[0])
    srv = ViewerServer(m, host="127.0.0.1", port=18099).start()
    try:
        with urllib.request.urlopen("http://127.0.0.1:18099/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["points"] > 0
        with urllib.request.urlopen("http://127.0.0.1:18099/params", timeout=30) as r:
            params = json.loads(r.read())
        assert "feature_lr" in params
        req = urllib.request.Request(
            "http://127.0.0.1:18099/params",
            data=json.dumps({"feature_lr": 0.42}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req, timeout=30)
        assert m.settings.opt.feature_lr == pytest.approx(0.42)
        with urllib.request.urlopen(
            "http://127.0.0.1:18099/render?w=32&h=32&z=-3", timeout=120
        ) as r:
            assert r.headers["Content-Type"] == "image/jpeg"
            assert len(r.read()) > 100
        # scene overlays: frusta (5 world points each), trajectory, points
        with urllib.request.urlopen("http://127.0.0.1:18099/scene", timeout=30) as r:
            sc = json.loads(r.read())
        assert len(sc["frusta"]) == 1 and len(sc["frusta"][0]) == 5
        assert len(sc["trajectory"]) == 1
        assert len(sc["points"]) > 0 and len(sc["points"][0]) == 3
        assert sc["fx"] > 0 and sc["fy"] > 0
    finally:
        srv.stop()


def test_sort_expand_pack_layout():
    """Fused binning layout (interpret-mode realign): expansion order, the
    stable (tile, depth) sort, slot/gid rows, and group ranges."""
    import jax
    import jax.numpy as jnp

    from gsdf_slam_tpu.ops.pallas_binning import sort_expand_pack

    # grid 4x2 (8 tiles), one group of 8; three gaussians:
    # g0 tiles {0,1} depth 2, g1 tile {1} depth 1, g2 tiles {0,4} depth 3
    depths = jnp.asarray([2.0, 1.0, 3.0], jnp.float32)
    rect_min = jnp.asarray([[0, 0], [1, 0], [0, 0]], jnp.int32)
    rect_max = jnp.asarray([[2, 1], [2, 1], [1, 2]], jnp.int32)
    tiles = jnp.asarray([2, 1, 2], jnp.int32)
    means2d = jnp.asarray([[8.0, 8.0], [24.0, 8.0], [8.0, 8.0]], jnp.float32)
    conics = jnp.tile(jnp.asarray([[1e-3, 0.0, 1e-3]], jnp.float32), (3, 1))
    opac = jnp.ones(3, jnp.float32)
    colors = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)

    sp = jax.jit(
        lambda *a: sort_expand_pack(
            *a, grid_w=4, grid_h=2, max_pairs=256, chunk=128, group=8
        )
    )(depths, rect_min, rect_max, tiles, means2d, conics, opac, colors)
    assert int(sp.total_pairs) == 5
    r = np.asarray(sp.ranges)
    assert r[0, 0] == 0 and r[1, 0] == 5
    gid = np.asarray(
        jax.lax.bitcast_convert_type(sp.pairs[10], jnp.int32)
    )
    # slice BEFORE the int cast: tail slots hold neighbor-field garbage
    # (bitcast rows), and casting NaN floats raises a RuntimeWarning
    slot = np.asarray(sp.pairs[9][:5]).astype(np.int32)
    # sorted: tile0 [g0(d2), g2(d3)], tile1 [g1(d1), g0(d2)], tile4 [g2]
    np.testing.assert_array_equal(gid[:5], [0, 2, 1, 0, 2])
    np.testing.assert_array_equal(slot, [0, 0, 1, 1, 4])
    # payload rode along: row 0 is means2d.x, rows 6..8 are colors
    np.testing.assert_allclose(np.asarray(sp.pairs[0])[:5], [8, 8, 24, 8, 8])
    np.testing.assert_allclose(np.asarray(sp.pairs[6])[:5], [1, 0, 0, 1, 0])


def test_psnr_gaussian_splatting():
    from gsdf_slam_tpu.ops.losses import psnr_gaussian_splatting

    rng = np.random.default_rng(9)
    a = rng.uniform(0, 1, (3, 8, 8)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 8, 8)).astype(np.float32)
    mse = ((a - b).reshape(3, -1) ** 2).mean(1)
    want = (20 * np.log10(1 / np.sqrt(mse))).mean()
    assert abs(float(psnr_gaussian_splatting(a, b)) - want) < 1e-4


def test_eval_sh_degree4_matches_reference_formula():
    """eval_sh parity with include/sh_utils.h:64-136 at degree 4, via an
    independent numpy transcription of the reference polynomial."""
    import jax.numpy as jnp

    from gsdf_slam_tpu.ops.sh import SH_C0, SH_C4, eval_sh, sh_basis

    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(32, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    sh = rng.normal(size=(32, 3, 25)).astype(np.float32)

    out = np.asarray(eval_sh(4, jnp.asarray(sh), jnp.asarray(dirs)))

    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    deg3 = np.asarray(sh_basis(jnp.asarray(dirs), 3))  # already tested vs fwd.cu
    basis4 = np.stack(
        [
            SH_C4[0] * xy * (xx - yy),
            SH_C4[1] * yz * (3 * xx - yy),
            SH_C4[2] * xy * (7 * zz - 1),
            SH_C4[3] * yz * (7 * zz - 3),
            SH_C4[4] * (zz * (35 * zz - 30) + 3),
            SH_C4[5] * xz * (7 * zz - 3),
            SH_C4[6] * (xx - yy) * (7 * zz - 1),
            SH_C4[7] * xz * (xx - 3 * yy),
            SH_C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ],
        axis=-1,
    )
    expect = np.einsum("nck,nk->nc", sh[:, :, :16], deg3) + np.einsum(
        "nck,nk->nc", sh[:, :, 16:25], basis4
    )
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
    # degree-0 path is the bare C0 term, no +0.5 offset (unlike eval_sh_color)
    out0 = np.asarray(eval_sh(0, jnp.asarray(sh[:, :, :1]), jnp.asarray(dirs)))
    np.testing.assert_allclose(out0, SH_C0 * sh[:, :, 0], rtol=1e-6)


def test_sparse_points_ply_roundtrip(tmp_path):
    """saveSparsePointsPly layout (gaussian_model.cpp:955-996): float32
    xyz+normals, uint8 rgb scaled by 255."""
    from gsdf_slam_tpu.io.ply import read_ply, write_sparse_points_ply

    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(17, 3)).astype(np.float32)
    col = rng.uniform(0, 1, (17, 3)).astype(np.float32)
    p = tmp_path / "input.ply"
    write_sparse_points_ply(p, xyz, col)
    props = read_ply(p)
    np.testing.assert_allclose(
        np.stack([props["x"], props["y"], props["z"]], -1), xyz, rtol=1e-6
    )
    assert props["red"].dtype == np.uint8
    np.testing.assert_array_equal(
        np.stack([props["red"], props["green"], props["blue"]], -1),
        (col * 255.0).astype(np.uint8),
    )
    assert np.all(props["nx"] == 0)


def test_shipped_example_configs_parse():
    """cfg/*.yaml (the reference's cv::FileStorage config surface) parse
    into MapperSettings with the intended values."""
    from pathlib import Path

    from gsdf_slam_tpu.engine import MapperSettings

    root = Path(__file__).resolve().parent.parent
    kitti = MapperSettings.from_yaml(root / "cfg" / "kitti.yaml")
    assert kitti.opt.densification_interval == 5
    assert kitti.opt.densify_from_iter == 3  # densification off after iter 3
    assert kitti.new_keyframe_times_of_use == 1
    assert not kitti.do_inactive_geo_densify

    replica = MapperSettings.from_yaml(root / "cfg" / "replica_rgbd.yaml")
    assert replica.new_keyframe_times_of_use == 8
    assert replica.do_gaus_pyramid_training
    assert replica.opt.densification_interval == 100

    tum = MapperSettings.from_yaml(root / "cfg" / "tum_mono.yaml")
    assert tum.do_inactive_geo_densify
    assert tum.max_depth_cached == 10
    assert tum.stable_num_iter_existence == 1
    assert tum.large_rotation_threshold == 30.0


def test_fold_pair_grads_matches_scatter_reference():
    """_fold_pair_grads (sorted-prefix fold, docs/PERF.md r4) must agree
    with the scatter-add it replaced — including garbage gids with
    NONZERO values on realign-padding lanes, which only the ranges-derived
    validity mask may exclude (zero-grad valid lanes are exercised too)."""
    import jax.numpy as jnp

    from gsdf_slam_tpu.ops.pallas_blend_grouped import _fold_pair_grads

    rng = np.random.default_rng(42)
    p, ng, chunk = 500, 7, 128
    # group layout: counts, chunk-aligned sizes, starts
    gcounts = rng.integers(0, 3 * chunk, ng).astype(np.int32)
    gsizes = (gcounts + chunk - 1) // chunk * chunk
    gstarts = (np.cumsum(gsizes) - gsizes).astype(np.int32)
    mpa = int(gsizes.sum()) + 2 * chunk  # tail slack beyond the last group
    valid = np.zeros(mpa, bool)
    gid = rng.integers(0, p, mpa).astype(np.int32)  # garbage everywhere...
    grads = rng.standard_normal((16, mpa)).astype(np.float32)
    for g in range(ng):
        valid[gstarts[g]:gstarts[g] + gcounts[g]] = True
    # ...but gids must be segment-contiguous per gaussian across the valid
    # lanes (the fresh pipeline guarantees it): assign sorted gids there
    nv = int(valid.sum())
    gid[valid] = np.sort(rng.integers(0, p, nv)).astype(np.int32)
    # some valid lanes carry exactly-zero grads (early-terminated pairs)
    zmask = rng.uniform(size=mpa) < 0.2
    grads[:, zmask] = 0.0
    # padding lanes: NONZERO garbage values (the kernels zero them in
    # production, but the fold must not rely on that for ordering — only
    # for values; here we zero them like the kernels do)
    grads[:, ~valid] = 0.0

    # scatter-add reference over valid lanes only
    ref = np.zeros((p, 9), np.float32)
    np.add.at(ref, gid[valid], grads[:9, valid].T)

    # analytic boundaries: cumulative kept counts by gid
    kept_bounds = np.searchsorted(np.sort(gid[valid]), np.arange(p), "right")
    ranges3 = jnp.asarray(
        np.stack([gstarts, gcounts, np.zeros(ng, np.int32)]), jnp.int32
    )
    acc = np.asarray(
        _fold_pair_grads(
            jnp.asarray(grads), jnp.asarray(gid), ranges3,
            jnp.asarray(kept_bounds.astype(np.int32)), p, min_rows=0,
        )
    )
    np.testing.assert_allclose(acc, ref, rtol=1e-4, atol=5e-5)
    # the small-map scatter path must agree too (static size dispatch)
    acc_sc = np.asarray(
        _fold_pair_grads(
            jnp.asarray(grads), jnp.asarray(gid), ranges3,
            jnp.asarray(kept_bounds.astype(np.int32)), p, min_rows=1 << 30,
        )
    )
    np.testing.assert_allclose(acc_sc, ref, rtol=1e-5, atol=1e-6)


def test_fold_pair_grads_ignores_padding_garbage():
    """Padding lanes with valid-LOOKING gids and nonzero values must be
    excluded by the ranges mask (they are zeroed by the kernels in
    production; this pins the mask itself)."""
    import jax.numpy as jnp

    from gsdf_slam_tpu.ops.pallas_blend_grouped import _fold_pair_grads

    p, chunk = 10, 128
    gcounts = np.array([3], np.int32)
    gstarts = np.array([0], np.int32)
    mpa = 2 * chunk
    gid = np.full(mpa, 5, np.int32)  # padding lanes CLAIM gaussian 5
    gid[:3] = [1, 1, 2]
    grads = np.ones((16, mpa), np.float32)  # padding values NONZERO
    kept_bounds = np.searchsorted([1, 1, 2], np.arange(p), "right")
    ranges3 = jnp.asarray(np.stack([gstarts, gcounts, [0]]), jnp.int32)
    acc = np.asarray(
        _fold_pair_grads(
            jnp.asarray(grads), jnp.asarray(gid), ranges3,
            jnp.asarray(kept_bounds.astype(np.int32)), p, min_rows=0,
        )
    )
    ref = np.zeros((p, 9), np.float32)
    ref[1] = 2.0
    ref[2] = 1.0
    np.testing.assert_allclose(acc, ref, atol=1e-6)


def test_sort_expand_pack_matches_xla_binning_at_window_scale():
    """Randomized content parity of the fused binning (incl. the windowed
    double-buffered realign, REALIGN_W=4) against the independent XLA
    binning path (ops/binning.bin_gaussians) at a scale that forces
    multi-window groups (nch > REALIGN_W) and cross-group write overhang:
    per tile, the depth-ordered gaussian-id lists must be identical, and
    the packed payload rows must match the gathered per-gaussian fields."""
    import jax
    import jax.numpy as jnp

    from gsdf_slam_tpu.ops.binning import bin_gaussians
    from gsdf_slam_tpu.ops.pallas_binning import sort_expand_pack
    from gsdf_slam_tpu.ops.projection import Preprocessed

    rng = np.random.default_rng(42)
    p, gw, gh, group, chunk = 2000, 10, 6, 8, 128
    num_tiles = gw * gh
    rx = rng.integers(0, gw - 1, p)
    ry = rng.integers(0, gh - 1, p)
    w = rng.integers(1, 4, p)
    h = rng.integers(1, 4, p)
    rect_min = np.stack([rx, ry], 1).astype(np.int32)
    rect_max = np.stack(
        [np.minimum(rx + w, gw), np.minimum(ry + h, gh)], 1
    ).astype(np.int32)
    tiles = ((rect_max - rect_min).prod(1)).astype(np.int32)
    tiles[rng.uniform(size=p) < 0.1] = 0  # some culled gaussians
    depths = rng.uniform(0.5, 20.0, p).astype(np.float32)
    # means centered in the rect with wide conics: per-tile opacity cull
    # keeps everything (this test pins LAYOUT; cull parity is shared code)
    means2d = (rect_min * 16 + 8).astype(np.float32)
    conics = np.tile(np.asarray([[1e-4, 0.0, 1e-4]], np.float32), (p, 1))
    opac = np.full(p, 0.9, np.float32)
    colors = rng.uniform(0, 1, (p, 3)).astype(np.float32)
    max_pairs = 1 << 14

    sp = jax.jit(
        lambda *a: sort_expand_pack(
            *a, grid_w=gw, grid_h=gh, max_pairs=max_pairs,
            chunk=chunk, group=group,
        )
    )(depths, rect_min, rect_max, tiles, jnp.asarray(means2d),
      jnp.asarray(conics), jnp.asarray(opac), jnp.asarray(colors))

    pre = Preprocessed(
        means2d=jnp.asarray(means2d), depths=jnp.asarray(depths),
        conics=jnp.asarray(conics), colors=jnp.asarray(colors),
        radii=jnp.ones(p, jnp.int32), rect_min=jnp.asarray(rect_min),
        rect_max=jnp.asarray(rect_max), tiles_touched=jnp.asarray(tiles),
    )
    binned = jax.jit(
        lambda pr, op: bin_gaussians(
            pr, op, grid_w=gw, grid_h=gh, max_pairs=max_pairs
        )
    )(pre, jnp.asarray(opac))

    total = int(sp.total_pairs)
    assert total == int(binned.total_pairs) and total > 6000
    ranges = np.asarray(sp.ranges)
    # force the windowed path: at least one group must span > 4 chunks
    assert (np.ceil(ranges[1] / chunk) > 4).any()

    gid = np.asarray(
        jax.lax.bitcast_convert_type(sp.pairs[10], jnp.int32)
    )
    slot = np.asarray(sp.pairs[9])
    pair_tile = np.asarray(binned.pair_tile)
    pair_gauss = np.asarray(binned.pair_gauss)
    payload = np.asarray(sp.pairs)

    ng = (num_tiles + group - 1) // group
    for g in range(ng):
        start, count = int(ranges[0, g]), int(ranges[1, g])
        lane_tile = g * group + slot[start : start + count].astype(np.int32)
        lane_gid = gid[start : start + count]
        for t in range(g * group, min((g + 1) * group, num_tiles)):
            want = pair_gauss[pair_tile == t]
            got = lane_gid[lane_tile == t]
            np.testing.assert_array_equal(got, want)
        # payload rows carried through sort + windowed realign intact
        np.testing.assert_allclose(
            payload[0, start : start + count], means2d[lane_gid, 0]
        )
        np.testing.assert_allclose(
            payload[8, start : start + count], colors[lane_gid, 2]
        )

"""Lie-group surface tests (SO3/SE3/RxSO3/Sim3).

Mirrors the test strategy of the Sophus suite the reference vendors
(submodules/Sophus/test/core/test_{so3,se3,sim3}.cpp): exp/log roundtrips
across the tangent-space branch corners, group axioms, action consistency,
and interpolation.
"""

import numpy as np
import pytest

from gsdf_slam_tpu.utils import SE3, SO3, RxSO3, Sim3, interpolate

# tangents chosen to hit every branch of exp/log (and sim_details calcW):
# zero, tiny, generic, near-pi rotation, pure translation, pure scale
SO3_TANGENTS = [
    np.zeros(3),
    np.array([1e-12, 0, 0]),
    np.array([0.2, -0.5, 1.0]),
    np.array([np.pi - 1e-4, 0, 0]),
]
SE3_TANGENTS = [
    np.zeros(6),
    np.array([1.0, -2.0, 3.0, 0, 0, 0]),
    np.array([0.5, 0.1, -0.2, 0.2, -0.5, 1.0]),
    np.array([1.0, 0.0, 0.0, np.pi - 1e-4, 0, 0]),
]
SIM3_TANGENTS = [
    np.zeros(7),
    np.array([1.0, -2.0, 3.0, 0, 0, 0, 0]),          # pure translation
    np.array([0, 0, 0, 0, 0, 0, 0.7]),               # pure scale
    np.array([0.5, 0.1, -0.2, 0.2, -0.5, 1.0, 0.0]),  # sigma=0 branch
    np.array([0.5, 0.1, -0.2, 0, 0, 0, 0.4]),         # theta=0 branch
    np.array([0.5, 0.1, -0.2, 0.2, -0.5, 1.0, -0.6]),  # generic branch
]


@pytest.mark.parametrize("group,tangents", [
    (SO3, SO3_TANGENTS), (SE3, SE3_TANGENTS), (Sim3, SIM3_TANGENTS),
    (RxSO3, [np.zeros(4), np.array([0.2, -0.5, 1.0, 0.7])]),
])
def test_exp_log_roundtrip(group, tangents):
    for xi in tangents:
        g = group.exp(xi)
        np.testing.assert_allclose(g.log(), xi, atol=1e-8)


@pytest.mark.parametrize("group,tangents", [
    (SO3, SO3_TANGENTS), (SE3, SE3_TANGENTS), (Sim3, SIM3_TANGENTS),
])
def test_group_axioms(group, tangents):
    gs = [group.exp(xi) for xi in tangents]
    for a in gs:
        # inverse
        ident = (a * a.inverse()).matrix()
        np.testing.assert_allclose(ident, np.eye(ident.shape[0]), atol=1e-10)
        for b in gs:
            # closure + matrix homomorphism
            np.testing.assert_allclose(
                (a * b).matrix(), a.matrix() @ b.matrix(), atol=1e-10
            )


def test_action_matches_matrix():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    for xi in SIM3_TANGENTS:
        g = Sim3.exp(xi)
        hom = np.concatenate([pts, np.ones((50, 1))], axis=1) @ g.matrix().T
        np.testing.assert_allclose(g.act(pts), hom[:, :3], atol=1e-10)


def test_sim3_zero_sigma_is_se3():
    xi = np.array([0.5, 0.1, -0.2, 0.2, -0.5, 1.0])
    s = Sim3.exp(np.concatenate([xi, [0.0]]))
    np.testing.assert_allclose(s.matrix(), SE3.exp(xi).matrix(), atol=1e-10)
    assert s.scale == pytest.approx(1.0)


def test_sim3_scales_points():
    g = Sim3.from_scale_quat_trans(2.0, np.array([1.0, 0, 0, 0]), np.zeros(3))
    np.testing.assert_allclose(
        g.act(np.array([[1.0, 2.0, 3.0]])), [[2.0, 4.0, 6.0]]
    )
    # inverse undoes the scale
    np.testing.assert_allclose(
        (g.inverse() * g).matrix(), np.eye(4), atol=1e-12
    )
    # to_se3 drops scale, keeps rotation+translation
    assert np.allclose(g.to_se3().matrix()[:3, :3], np.eye(3))


def test_quaternion_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        r = SO3.from_quaternion(q)
        np.testing.assert_allclose(r.quaternion(), q, atol=1e-10)
        # keyframe ctor path
        t = rng.normal(size=3)
        se3 = SE3.from_quat_trans(q, t)
        np.testing.assert_allclose(se3.quaternion(), q, atol=1e-10)
        np.testing.assert_allclose(se3.translation, t)


def test_interpolate_endpoints_and_midpoint():
    a = SE3.exp(np.array([0.5, 0.1, -0.2, 0.2, -0.5, 1.0]))
    b = SE3.exp(np.array([-0.3, 0.4, 0.1, -0.1, 0.3, 0.2]))
    np.testing.assert_allclose(interpolate(a, b, 0.0).matrix(), a.matrix(),
                               atol=1e-10)
    np.testing.assert_allclose(interpolate(a, b, 1.0).matrix(), b.matrix(),
                               atol=1e-8)
    mid = interpolate(a, b, 0.5)
    # geodesic midpoint: equidistant from both ends
    d_a = np.linalg.norm((a.inverse() * mid).log())
    d_b = np.linalg.norm((mid.inverse() * b).log())
    assert d_a == pytest.approx(d_b, rel=1e-6)

"""The per-sensor config farm loads through the real parsers.

The reference ships tuned YAMLs for every dataset/sensor combination
(cfg/gaussian_mapper/**, cfg/ORB_SLAM3/**); ours mirror that farm
(cfg/make_farm.py). Every mapper YAML must build a MapperSettings and
every sensor YAML a CameraIntrinsics — values spot-checked against the
reference's tuning.
"""

from pathlib import Path

import numpy as np
import pytest

CFG = Path(__file__).resolve().parents[1] / "cfg"

MAPPER_YAMLS = sorted((CFG / "gaussian_mapper").rglob("*.yaml"))
SENSOR_YAMLS = sorted((CFG / "ORB_SLAM3").rglob("*.yaml"))


def test_farm_is_generated():
    assert len(MAPPER_YAMLS) >= 30, [str(p) for p in MAPPER_YAMLS]
    assert len(SENSOR_YAMLS) >= 24


@pytest.mark.parametrize("path", MAPPER_YAMLS, ids=lambda p: str(p.relative_to(CFG)))
def test_mapper_yaml_loads(path):
    from gsdf_slam_tpu.engine.settings import MapperSettings

    s = MapperSettings.from_yaml(path)
    assert s.model.sh_degree == 3
    assert s.opt.densification_interval == 100
    assert 0 < s.opt.lambda_dssim < 1


@pytest.mark.parametrize("path", SENSOR_YAMLS, ids=lambda p: str(p.relative_to(CFG)))
def test_sensor_yaml_loads(path):
    from gsdf_slam_tpu.data.base_parser import intrinsics_from_yaml

    intr = intrinsics_from_yaml(path)
    assert intr.fx > 100 and intr.fy > 100
    assert intr.width > 0 and intr.height > 0


def test_farm_spot_values():
    """Tuning deltas the reference farm carries (diffed 2026-08):
    KITTI prunes big points from iter 1000 with z_far 40; EuRoC disables
    inactive-geo densify and runs 60100 iterations; TUM RGB-D densifies
    from iter 1000 at min opacity 0.1; Replica RGB-D seeds the map after
    10 keyframes (mono: 20)."""
    from gsdf_slam_tpu.engine.settings import MapperSettings

    kitti = MapperSettings.from_yaml(CFG / "gaussian_mapper/Stereo/KITTI/KITTI.yaml")
    assert kitti.prune_big_point_after_iter == 1000
    assert kitti.z_far == 40.0
    assert kitti.opt.densify_grad_threshold == 0.0004

    euroc = MapperSettings.from_yaml(CFG / "gaussian_mapper/Stereo/EuRoC/EuRoC.yaml")
    assert not euroc.do_inactive_geo_densify
    assert euroc.opt.iterations == 60100

    tum = MapperSettings.from_yaml(
        CFG / "gaussian_mapper/RGB-D/TUM/tum_rgbd.yaml"
    )
    assert tum.opt.densify_from_iter == 1000
    assert tum.densify_min_opacity == 0.1  # MapperSettings-level field

    rep = MapperSettings.from_yaml(
        CFG / "gaussian_mapper/RGB-D/Replica/room0.yaml"
    )
    assert rep.num_gaus_pyramid_sub_levels == 3  # scene profile keeps 3
    # keys our mapper does not consume yet still ride in the YAML with the
    # reference's tuned values (forward-compat, raw-parse check)
    from gsdf_slam_tpu.engine.settings import parse_opencv_yaml

    raw = parse_opencv_yaml(CFG / "gaussian_mapper/RGB-D/Replica/room0.yaml")
    assert raw["Mapper.min_num_initial_map_kfs"] == 10


def test_sensor_spot_values():
    from gsdf_slam_tpu.data.base_parser import intrinsics_from_yaml

    rep = intrinsics_from_yaml(CFG / "ORB_SLAM3/RGB-D/Replica/room0.yaml")
    assert (rep.fx, rep.cx, rep.width) == (600.0, 599.5, 1200)
    assert rep.model == "pinhole" and rep.dist is not None

    fr3 = intrinsics_from_yaml(
        CFG / "ORB_SLAM3/Monocular/TUM/tum_freiburg3_long_office_household.yaml"
    )
    assert fr3.dist is None  # fr3 ships undistorted

    eur_l = intrinsics_from_yaml(CFG / "ORB_SLAM3/Stereo/EuRoC/EuRoC.yaml")
    eur_r = intrinsics_from_yaml(
        CFG / "ORB_SLAM3/Stereo/EuRoC/EuRoC.yaml", camera=2
    )
    assert abs(eur_l.fx - 458.654) < 1e-9
    assert abs(eur_r.fx - 457.587) < 1e-9
    assert not np.allclose(eur_l.dist, eur_r.dist)

"""Config parsing, BoW, trajectory and map-IO tests."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_read_euroc_config():
    from okvis2_tpu.config import read_config_file
    from okvis2_tpu.cameras.distortion import RadialTangentialDistortion

    p = read_config_file(os.path.join(REPO, "configs", "euroc.yaml"))
    assert len(p.cameras) == 2
    cam0 = p.cameras[0].camera
    assert cam0.width == 752 and cam0.height == 480
    np.testing.assert_allclose(
        np.asarray(cam0.focal), [458.654880721, 457.296696463]
    )
    assert isinstance(cam0.distortion, RadialTangentialDistortion)
    # extrinsics: stereo baseline ~11 cm
    T0 = p.cameras[0].T_SC
    T1 = p.cameras[1].T_SC
    base = np.linalg.norm(np.asarray(T0.r) - np.asarray(T1.r))
    assert 0.09 < base < 0.13
    assert float(p.imu.params.sigma_g_c) == pytest.approx(20.0e-4)
    assert float(p.imu.params.g) == pytest.approx(9.81007)
    assert p.estimator.num_keyframes == 5
    assert p.frontend.max_num_keypoints == 700
    assert p.estimator.do_loop_closures is True


def test_read_tumvi_config_equidistant():
    from okvis2_tpu.config import read_config_file
    from okvis2_tpu.cameras.distortion import EquidistantDistortion

    p = read_config_file(os.path.join(REPO, "configs", "tumvi_slam_512.yaml"))
    assert isinstance(p.cameras[0].camera.distortion, EquidistantDistortion)
    assert p.cameras[0].camera.width == 512


def test_bow_recognises_same_place():
    from okvis2_tpu.frontend.bow import BinaryVocabulary, PlaceRecognitionDatabase

    rng = np.random.default_rng(0)
    # synthetic descriptor sets: "places" are clusters of similar descriptors
    def place_descriptors(center, n=50, flip=20):
        out = []
        for _ in range(n):
            d = center.copy()
            idx = rng.choice(512, flip, replace=False)
            d[idx] *= -1
            out.append(d)
        return np.stack(out)

    centers = [rng.choice([-1.0, 1.0], 512) for _ in range(6)]
    train = np.concatenate([place_descriptors(c, 80) for c in centers])
    voc = BinaryVocabulary.train(train, n_words=64, iters=4)
    db = PlaceRecognitionDatabase(voc)
    for i, c in enumerate(centers):
        db.add(i, place_descriptors(c, 40))
    # query a re-visit of place 2 (fresh noise)
    q = place_descriptors(centers[2], 40)
    res = db.query(q, min_score=0.0)
    assert res[0][0] == 2
    assert res[0][1] > res[1][1] + 0.05


def test_trajectory_interpolation_and_csv(tmp_path):
    from okvis2_tpu.pipeline.trajectory import (
        Trajectory,
        ate_rmse,
        write_euroc_csv,
        write_rpg_csv,
    )

    traj = Trajectory()
    for i in range(5):
        pose = np.array([i * 1.0, 0, 0, 0, 0, 0, 1.0])
        traj.update(i, float(i), pose)
    mid = traj.state_at(1.5)
    np.testing.assert_allclose(mid[:3], [1.5, 0, 0])
    st = traj.states()
    f1 = tmp_path / "euroc.csv"
    f2 = tmp_path / "rpg.csv"
    write_euroc_csv(str(f1), st)
    write_rpg_csv(str(f2), st)
    assert len(f1.read_text().splitlines()) == 6
    assert len(f2.read_text().splitlines()) == 6
    # ATE: identical trajectories -> 0; shifted -> 0 after alignment
    shifted = [(t, p + np.array([1, 2, 3, 0, 0, 0, 0])) for t, p in st]
    assert ate_rmse(st, st) < 1e-12
    assert ate_rmse(shifted, st) < 1e-9


def test_component_save_load_roundtrip(tmp_path):
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.graph.estimator import Estimator, EstimatorConfig
    from okvis2_tpu.imu.preintegration import ImuParameters
    from okvis2_tpu.pipeline.component_io import load_component, save_component
    from okvis2_tpu.utils.synthetic import stereo_rig

    cams, exts = stereo_rig()
    est = Estimator(cams, exts, ImuParameters.create(), EstimatorConfig())
    rng = np.random.default_rng(0)
    s0 = est.add_state(0.0, rng.normal(0, 0.01, (10, 3)),
                       np.tile([0, 0, 9.81], (10, 1)), np.full(10, 0.01))
    s1 = est.add_state(0.1, rng.normal(0, 0.01, (10, 3)),
                       np.tile([0, 0, 9.81], (10, 1)) + rng.normal(0, 0.01, (10, 3)),
                       np.full(10, 0.01))
    lid = est.add_landmark([1.0, 2.0, 5.0, 1.0], initialised=True)
    est.add_observation(lid, s0, 0, 3, (100.0, 120.0), 9.0)
    est.add_observation(lid, s1, 1, 7, (110.0, 122.0), 9.0)

    path = str(tmp_path / "map.g2o")
    save_component(path, est)
    data = load_component(path)
    assert set(data["states"].keys()) == {s0, s1}
    np.testing.assert_allclose(
        data["states"][s0]["pose"], est.states[s0].pose, atol=1e-8
    )
    np.testing.assert_allclose(
        data["landmarks"][lid], est.landmarks[lid].hp_W, atol=1e-8
    )
    assert len(data["observations"]) == 2
    assert len(data["imu_edges"]) == 1
    assert data["imu_edges"][0]["n"] == 10
    assert len(data["imu_edges"][0]["meas"]) == 10

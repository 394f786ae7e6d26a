"""Native C++ EuRoC loader vs pure-Python reader equivalence."""

import os

import numpy as np
import pytest


def make_mini_euroc(root, n_frames=5, n_cams=2, imu_rate=20):
    import cv2

    rng = np.random.default_rng(0)
    os.makedirs(os.path.join(root, "mav0", "imu0"), exist_ok=True)
    t0 = 1403636579000000000  # EuRoC-style ns timestamps
    frame_dt = int(0.1e9)
    with open(os.path.join(root, "mav0", "imu0", "data.csv"), "w") as f:
        f.write("#timestamp,w_x,w_y,w_z,a_x,a_y,a_z\n")
        for i in range(n_frames * 4):
            t = t0 + i * int(1e9 / imu_rate)
            vals = rng.normal(0, 0.1, 6)
            vals[5] += 9.81
            f.write(f"{t}," + ",".join(f"{v:.6f}" for v in vals) + "\n")
    imgs = {}
    for c in range(n_cams):
        d = os.path.join(root, "mav0", f"cam{c}")
        os.makedirs(os.path.join(d, "data"), exist_ok=True)
        with open(os.path.join(d, "data.csv"), "w") as f:
            f.write("#timestamp [ns],filename\n")
            for i in range(n_frames):
                t = t0 + i * frame_dt + (1000000 if c else 0)  # 1ms offset
                name = f"{t}.png"
                img = rng.integers(0, 255, (48, 64), np.uint8)
                cv2.imwrite(os.path.join(d, "data", name), img)
                imgs[(c, i)] = img
                f.write(f"{t},{name}\n")
    return imgs


@pytest.fixture(scope="module")
def mini_euroc(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("euroc"))
    imgs = make_mini_euroc(root)
    return root, imgs


def test_native_loader_matches_python(mini_euroc):
    root, imgs = mini_euroc
    from okvis2_tpu.pipeline.native_loader import NativeEurocReader
    from okvis2_tpu.pipeline.dataset import EurocDatasetReader

    try:
        nat = NativeEurocReader(root, 2)
    except RuntimeError:
        pytest.skip("native loader not buildable here")
    py = EurocDatasetReader(root, 2)

    ev_n = [e for e in nat.stream()]
    ev_p = [e for e in py.stream()]
    types_n = [(e[0], round(e[1], 6)) for e in ev_n]
    types_p = [(e[0], round(e[1], 6)) for e in ev_p]
    assert types_n == types_p
    # image payloads match the PNGs
    fi = 0
    for e in ev_n:
        if e[0] != "images":
            continue
        for c in range(2):
            np.testing.assert_allclose(
                e[2][c], imgs[(c, fi)].astype(np.float32) / 255.0, atol=1e-6
            )
        fi += 1
    assert fi == 5


def test_native_loader_imu_values(mini_euroc):
    root, _ = mini_euroc
    from okvis2_tpu.pipeline.native_loader import NativeEurocReader

    try:
        nat = NativeEurocReader(root, 2)
    except RuntimeError:
        pytest.skip("native loader not buildable here")
    assert nat.num_frames == 5
    assert nat.width == 64 and nat.height == 48
    imu = [e for e in nat.stream() if e[0] == "imu"]
    assert len(imu) == 20
    # accel z ~ gravity
    assert abs(np.mean([e[2][2] for e in imu]) - 9.81) < 0.5

"""Dataset readers + synthetic dataset generation.

EurocDatasetReader covers the reference's DatasetReader
(okvis_multisensor_processing/src/DatasetReader.cpp: EuRoC/ASL folder
format `mav0/camN/data.csv` + images, `imu0/data.csv`) with the same
callback contract (ViSensorBase, ViSensorBase.hpp:56-123). The reference
streams from its own thread; here `stream()` is a generator the caller
drains (the pipeline is synchronous-by-construction on one device) and
`start_streaming()` offers the threaded variant for live-style feeding.

SyntheticDataset renders a deterministic textured world along an analytic
trajectory with exact IMU — the end-to-end fixture the reference lacks
(SURVEY.md §4: "no integration/dataset regression tests").
"""

from __future__ import annotations

import csv
import os
import threading
from typing import Callable, Iterator, List, Optional, Tuple

import numpy as np


class EurocDatasetReader:
    """EuRoC/ASL folder reader: `<path>/mav0/cam{i}/data.csv` + data/,
    `<path>/mav0/imu0/data.csv`."""

    def __init__(self, path: str, num_cameras: int = 2):
        self.path = path
        self.num_cameras = num_cameras
        self.imu_callback: Optional[Callable] = None
        self.images_callback: Optional[Callable] = None
        self._thread: Optional[threading.Thread] = None
        self._stop = False

    def set_imu_callback(self, cb: Callable):
        self.imu_callback = cb

    def set_images_callback(self, cb: Callable):
        self.images_callback = cb

    def _read_imu(self) -> List[Tuple[float, np.ndarray, np.ndarray]]:
        rows = []
        fn = os.path.join(self.path, "mav0", "imu0", "data.csv")
        with open(fn) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                t = int(row[0]) * 1e-9
                gyr = np.asarray([float(x) for x in row[1:4]])
                acc = np.asarray([float(x) for x in row[4:7]])
                rows.append((t, acc, gyr))
        return rows

    def _read_cam_index(self, ci: int) -> List[Tuple[float, str]]:
        rows = []
        fn = os.path.join(self.path, "mav0", f"cam{ci}", "data.csv")
        with open(fn) as f:
            for row in csv.reader(f):
                if row[0].startswith("#"):
                    continue
                rows.append(
                    (int(row[0]) * 1e-9,
                     os.path.join(self.path, "mav0", f"cam{ci}", "data",
                                  row[1].strip()))
                )
        return rows

    @staticmethod
    def _load_image(fn: str) -> np.ndarray:
        import cv2

        img = cv2.imread(fn, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise IOError(f"cannot read {fn}")
        return img.astype(np.float32) / 255.0

    def stream(self, sync_tolerance: float = 0.005) -> Iterator[tuple]:
        """Yield ('imu', t, acc, gyr) and ('images', t, [img...]) events in
        time order, with camera frames synced across cameras
        (DatasetReader sync-group logic)."""
        imu = self._read_imu()
        cams = [self._read_cam_index(ci) for ci in range(self.num_cameras)]
        # sync camera frames by nearest timestamps (cam0 is master)
        frames = []
        ptrs = [0] * self.num_cameras
        for t0, fn0 in cams[0]:
            fns = [fn0]
            ok = True
            for ci in range(1, self.num_cameras):
                while (
                    ptrs[ci] + 1 < len(cams[ci])
                    and cams[ci][ptrs[ci] + 1][0] <= t0 + sync_tolerance
                ):
                    ptrs[ci] += 1
                tc, fnc = cams[ci][ptrs[ci]]
                if abs(tc - t0) > sync_tolerance:
                    ok = False
                    break
                fns.append(fnc)
            if ok:
                frames.append((t0, fns))

        ii = 0
        for t, fns in frames:
            while ii < len(imu) and imu[ii][0] <= t + 0.005:
                yield ("imu", imu[ii][0], imu[ii][1], imu[ii][2])
                ii += 1
            yield ("images", t, [self._load_image(f) for f in fns])
        while ii < len(imu):
            yield ("imu", imu[ii][0], imu[ii][1], imu[ii][2])
            ii += 1

    def start_streaming(self):
        def run():
            for ev in self.stream():
                if self._stop:
                    break
                if ev[0] == "imu" and self.imu_callback:
                    self.imu_callback(ev[1], ev[2], ev[3])
                elif ev[0] == "images" and self.images_callback:
                    self.images_callback(ev[1], ev[2])

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop_streaming(self):
        self._stop = True
        if self._thread:
            self._thread.join()


class RpgDatasetReader:
    """UZH-RPG format reader (reference: okvis_multisensor_processing/src/
    RpgDatasetReader.cpp): `images.txt` (id t path), `imu.txt`
    (id t wx wy wz ax ay az), optionally `left_images.txt`/
    `right_images.txt` for stereo."""

    def __init__(self, path: str, num_cameras: int = 1):
        self.path = path
        self.num_cameras = num_cameras

    def _read_images_index(self, fn):
        out = []
        with open(os.path.join(self.path, fn)) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                parts = line.split()
                out.append((float(parts[1]),
                            os.path.join(self.path, parts[2])))
        return out

    def _read_imu(self):
        out = []
        with open(os.path.join(self.path, "imu.txt")) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                p = [float(x) for x in line.split()]
                # id t wx wy wz ax ay az
                out.append((p[1], np.asarray(p[5:8]), np.asarray(p[2:5])))
        return out

    def stream(self, sync_tolerance: float = 0.005) -> Iterator[tuple]:
        if self.num_cameras >= 2 and os.path.exists(
            os.path.join(self.path, "left_images.txt")
        ):
            left = self._read_images_index("left_images.txt")
            right = self._read_images_index("right_images.txt")
            frames = []
            for (tl, fl), (tr, fr) in zip(left, right):
                if abs(tl - tr) <= sync_tolerance:
                    frames.append((tl, [fl, fr]))
        else:
            frames = [(t, [f]) for t, f in self._read_images_index("images.txt")]
        imu = self._read_imu()
        ii = 0
        for t, fns in frames:
            while ii < len(imu) and imu[ii][0] <= t + 0.005:
                yield ("imu", imu[ii][0], imu[ii][1], imu[ii][2])
                ii += 1
            yield ("images", t,
                   [EurocDatasetReader._load_image(f) for f in fns])
        while ii < len(imu):
            yield ("imu", imu[ii][0], imu[ii][1], imu[ii][2])
            ii += 1


class DatasetWriter:
    """Record a live stream into EuRoC folder format (reference:
    okvis_multisensor_processing/src/DatasetWriter.cpp). Feed with the
    same add_images/add_imu_measurement callbacks as SlamSystem."""

    def __init__(self, path: str, num_cameras: int = 2):
        import cv2  # noqa: F401  (fail early if unavailable)

        self.path = path
        self.num_cameras = num_cameras
        for c in range(num_cameras):
            os.makedirs(
                os.path.join(path, "mav0", f"cam{c}", "data"), exist_ok=True
            )
        os.makedirs(os.path.join(path, "mav0", "imu0"), exist_ok=True)
        self._imu_f = open(
            os.path.join(path, "mav0", "imu0", "data.csv"), "w"
        )
        self._imu_f.write("#timestamp,w_x,w_y,w_z,a_x,a_y,a_z\n")
        self._cam_f = []
        for c in range(num_cameras):
            f = open(os.path.join(path, "mav0", f"cam{c}", "data.csv"), "w")
            f.write("#timestamp [ns],filename\n")
            self._cam_f.append(f)

    def add_imu_measurement(self, t: float, accel, gyro) -> bool:
        g = np.asarray(gyro)
        a = np.asarray(accel)
        self._imu_f.write(
            f"{int(round(t*1e9))},{g[0]:.9f},{g[1]:.9f},{g[2]:.9f},"
            f"{a[0]:.9f},{a[1]:.9f},{a[2]:.9f}\n"
        )
        return True

    def add_images(self, t: float, images) -> bool:
        import cv2

        ts = int(round(t * 1e9))
        for c, img in enumerate(images):
            if img.dtype != np.uint8:
                img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
            name = f"{ts}.png"
            cv2.imwrite(
                os.path.join(self.path, "mav0", f"cam{c}", "data", name), img
            )
            self._cam_f[c].write(f"{ts},{name}\n")
        return True

    def close(self):
        self._imu_f.close()
        for f in self._cam_f:
            f.close()


class SyntheticDataset:
    """Deterministic textured-world renderer along an analytic trajectory.

    The world is a field of small constant-intensity squares ("stars");
    each frame renders their projections into every camera. IMU comes from
    the analytic derivatives (utils/synthetic.py).
    """

    def __init__(
        self,
        cameras,
        extrinsics,
        imu_params,
        n_stars: int = 3000,
        duration: float = 10.0,
        frame_rate: float = 10.0,
        imu_rate: float = 200.0,
        seed: int = 0,
        imu_noise: float = 0.0,
        trajectory: str = "default",  # "default" | "circle"
    ):
        from okvis2_tpu.utils import synthetic

        self.syn = synthetic
        if trajectory == "circle":
            self.syn = synthetic.CircleTrajectory(duration)
        self.cameras = cameras
        self.extrinsics = extrinsics
        self.imu_params = imu_params
        self.duration = duration
        self.frame_rate = frame_rate
        self.imu_rate = imu_rate
        self.imu_noise = imu_noise
        rng = np.random.default_rng(seed)
        # stars distributed in a shell in front of/around the trajectory
        self.stars = np.concatenate(
            [
                rng.uniform(-6, 10, (n_stars, 1)),
                rng.uniform(-6, 6, (n_stars, 1)),
                rng.uniform(2.0, 12.0, (n_stars, 1)),
            ],
            axis=-1,
        )
        self.star_intensity = rng.uniform(0.25, 1.0, n_stars)
        self.star_size = rng.integers(3, 6, n_stars)
        # per-star random texture patch (max size), so each star is
        # visually unique — keeps binary descriptors discriminative for
        # place-recognition tests (constant squares alias heavily)
        self.star_pattern = rng.uniform(0.3, 1.0, (n_stars, 6, 6))

    def render(self, T_WS) -> List[np.ndarray]:
        """Render all cameras at body pose T_WS (numpy [7]). The star
        projection runs as ONE jitted dispatch per camera (eager ops here
        would pay a device roundtrip each — minutes per sequence over the
        TPU tunnel)."""
        import jax
        import jax.numpy as jnp

        if not hasattr(self, "_project_fn"):
            from okvis2_tpu.core.se3 import Transformation

            def _project(cam, T_WS7, T_SC7, stars):
                T = Transformation(r=T_WS7[:3], q=T_WS7[3:7])
                T_SC = Transformation(r=T_SC7[:3], q=T_SC7[3:7])
                T_CW = (T @ T_SC).inverse()
                p_C = jax.vmap(T_CW.apply)(stars)
                uv, valid = cam.project(p_C)
                return uv, valid & (p_C[:, 2] > 0.2)

            self._project_fn = jax.jit(_project)
            self._stars_dev = jnp.asarray(self.stars)
            self._T_SC7 = [
                np.concatenate([np.asarray(T.r), np.asarray(T.q)])
                for T in self.extrinsics
            ]

        out = []
        for cam, T_SC7 in zip(self.cameras, self._T_SC7):
            uv, valid = jax.device_get(self._project_fn(
                cam, jnp.asarray(T_WS), jnp.asarray(T_SC7),
                self._stars_dev,
            ))
            img = np.zeros((cam.height, cam.width), np.float32)
            for k in np.nonzero(valid)[0]:
                x, y = uv[k]
                s = int(self.star_size[k])
                x0, y0 = int(round(x)) - s // 2, int(round(y)) - s // 2
                x1, y1 = x0 + s, y0 + s
                x0c, y0c = max(x0, 0), max(y0, 0)
                x1c, y1c = min(x1, cam.width), min(y1, cam.height)
                if x1c > x0c and y1c > y0c:
                    patch = (
                        self.star_intensity[k]
                        * self.star_pattern[k][: y1c - y0c, : x1c - x0c]
                    )
                    img[y0c:y1c, x0c:x1c] = np.maximum(
                        img[y0c:y1c, x0c:x1c], patch.astype(np.float32)
                    )
            out.append(img)
        return out

    def stream(self) -> Iterator[tuple]:
        import jax
        import jax.numpy as jnp

        rng = np.random.default_rng(123)
        n_frames = int(self.duration * self.frame_rate)
        imu_dt = 1.0 / self.imu_rate
        # batch-evaluate ALL IMU samples and frame poses up front: one
        # dispatch instead of one per 5 ms sample
        n_imu = int(np.ceil((n_frames - 1) / self.frame_rate / imu_dt)) + 2
        ts_imu = np.arange(n_imu) * imu_dt
        w_all, a_all = jax.device_get(jax.jit(jax.vmap(
            lambda tt: self.syn.imu_at(tt, self.imu_params)
        ))(jnp.asarray(ts_imu)))
        ts_frame = np.arange(n_frames) / self.frame_rate
        T_all, _sb = jax.jit(jax.vmap(
            lambda tt: self.syn.true_state(tt)
        ))(jnp.asarray(ts_frame))
        rs, qs = jax.device_get((T_all.r, T_all.q))
        if self.imu_noise > 0:
            w_all = w_all + rng.normal(0, self.imu_noise * 1e-2, w_all.shape)
            a_all = a_all + rng.normal(0, self.imu_noise * 1e-1, a_all.shape)

        ii = 0
        for fi in range(n_frames):
            t = ts_frame[fi]
            while ii < n_imu and ts_imu[ii] <= t + 1e-9:
                yield ("imu", ts_imu[ii], a_all[ii], w_all[ii])
                ii += 1
            pose = np.concatenate([rs[fi], qs[fi]])
            yield ("images", t, self.render(pose), pose)

    def ground_truth(self, t: float) -> np.ndarray:
        T_gt, _ = self.syn.true_state(t)
        return np.concatenate([np.asarray(T_gt.r), np.asarray(T_gt.q)])


def _upsample_bilinear(g: np.ndarray, T: int) -> np.ndarray:
    """Separable bilinear upsample of a square grid to T x T (numpy)."""
    o = g.shape[0]
    x = np.linspace(0.0, o - 1.0, T)
    x0 = np.floor(x).astype(int)
    x1 = np.minimum(x0 + 1, o - 1)
    fx = (x - x0).astype(np.float32)
    rows = g[x0] * (1 - fx)[:, None] + g[x1] * fx[:, None]
    out = rows[:, x0] * (1 - fx)[None, :] + rows[:, x1] * fx[None, :]
    return out


def _noise_texture(rng, T: int = 512,
                   octaves=(4, 8, 16, 32, 64, 128),
                   amp_decay: float = 0.55) -> np.ndarray:
    """Multi-octave value-noise texture: features at many scales (coarse
    blobs down to fine grain), the statistics real detectors/descriptors
    care about — unlike the star field's dots-on-black."""
    img = np.zeros((T, T), np.float32)
    amp = 1.0
    for o in octaves:
        img += amp * _upsample_bilinear(
            rng.standard_normal((o, o)).astype(np.float32), T
        )
        amp *= amp_decay
    lo, hi = img.min(), img.max()
    img = (img - lo) / max(hi - lo, 1e-9)
    return 0.1 + 0.85 * img


class TexturedWorldDataset(SyntheticDataset):
    """Textured-surface renderer: a room of noise-textured planes plus
    floating occluder quads, rendered by ray-plane intersection with a
    z-buffer (TRUE occlusion) and per-frame exposure variation. This is
    the realism fixture the star field lacks (textured surfaces,
    occlusion boundaries, photometric change — the descriptor-quality
    regime of real sequences, SURVEY.md §7 hard part (d)).

    One jitted dispatch per camera; `render_with_labels` additionally
    returns the per-pixel plane-class map (0 background / 10 "sky"
    ceiling / 11 "person" occluder — cityscapes ids as consumed by the
    reference's fast-scnn gate, okvis_cv/src/Frame.cpp:46-147), used to
    train the Flax fast-scnn on this world.
    """

    # cityscapes-id convention of the reference CNN gate
    CLASS_BACKGROUND, CLASS_SKY, CLASS_PERSON = 0, 10, 11

    def __init__(
        self,
        cameras,
        extrinsics,
        imu_params,
        duration: float = 10.0,
        frame_rate: float = 10.0,
        imu_rate: float = 200.0,
        seed: int = 0,
        imu_noise: float = 0.0,
        trajectory: str = "default",
        tex_size: int = 512,
        exposure_amp: float = 0.15,
        sky_ceiling: bool = True,
        n_occluders: int = 3,
    ):
        super().__init__(
            cameras, extrinsics, imu_params, n_stars=1,
            duration=duration, frame_rate=frame_rate, imu_rate=imu_rate,
            seed=seed, imu_noise=imu_noise, trajectory=trajectory,
        )
        rng = np.random.default_rng(seed + 7)
        self.exposure_amp = exposure_amp
        # the room encloses the canonical trajectories (stars lived in
        # x[-6,10], y[-6,6], z[2,12]): 5 walls + floating occluders
        p0s, eus, evs, classes = [], [], [], []

        def add_plane(p0, eu, ev, cls):
            p0s.append(p0); eus.append(eu); evs.append(ev)
            classes.append(cls)

        add_plane([-6, -6, 12], [16, 0, 0], [0, 12, 0],
                  self.CLASS_BACKGROUND)              # back wall z=12
        add_plane([-6, -6, -4], [0, 12, 0], [16, 0, 0],
                  self.CLASS_BACKGROUND)              # front wall z=-4
        add_plane([-6, -6, -4], [0, 0, 16], [0, 12, 0],
                  self.CLASS_BACKGROUND)              # left wall x=-6
        add_plane([10, -6, -4], [0, 12, 0], [0, 0, 16],
                  self.CLASS_BACKGROUND)              # right wall x=10
        add_plane([-6, 6, -4], [16, 0, 0], [0, 0, 16],
                  self.CLASS_BACKGROUND)              # floor y=+6
        add_plane([-6, -6, -4], [0, 0, 16], [16, 0, 0],
                  self.CLASS_SKY if sky_ceiling
                  else self.CLASS_BACKGROUND)         # ceiling y=-6
        for k in range(n_occluders):
            c = np.array([
                rng.uniform(-3, 6), rng.uniform(-3, 3),
                rng.uniform(4.0, 8.0),
            ])
            w, h = rng.uniform(0.8, 2.0), rng.uniform(1.2, 2.6)
            ang = rng.uniform(0, 2 * np.pi)
            u = np.array([np.cos(ang), np.sin(ang), 0.0]) * w
            v = np.array([0.0, 1.0, 0.0]) * h  # upright quad
            add_plane(c - u / 2 - v / 2, u, v,
                      self.CLASS_PERSON if k == 0
                      else self.CLASS_BACKGROUND)
        self.plane_p0 = np.asarray(p0s, np.float32)
        self.plane_eu = np.asarray(eus, np.float32)
        self.plane_ev = np.asarray(evs, np.float32)
        self.plane_class = np.asarray(classes, np.int32)
        P = len(p0s)
        self.textures = np.stack([
            _noise_texture(rng, tex_size) for _ in range(P)
        ])
        if sky_ceiling:
            # featureless bright "sky": a faint vertical gradient only
            g = np.linspace(0.92, 1.0, tex_size, dtype=np.float32)
            self.textures[5] = np.broadcast_to(
                g[:, None], (tex_size, tex_size)
            ).copy()
        # darker "person" occluder (class contrast for the CNN task)
        self.textures[6 % P] = 0.12 + 0.25 * self.textures[6 % P]

    def _render_fn(self):
        import jax
        import jax.numpy as jnp

        if hasattr(self, "_tex_render"):
            return self._tex_render
        from okvis2_tpu.core import so3

        def render_one(cam_rays, T_WS7, T_SC7, p0, eu, ev, tex, gain):
            R_WS = so3.quat_to_matrix(T_WS7[3:7])
            R_SC = so3.quat_to_matrix(T_SC7[3:7])
            R_WC = R_WS @ R_SC
            o_W = T_WS7[:3] + R_WS @ T_SC7[:3]
            d = cam_rays @ R_WC.T  # [HW,3]
            n = jnp.cross(eu, ev)
            n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)  # [P,3]
            denom = d @ n.T  # [HW,P]
            tnum = (p0 - o_W[None, :]) @ n.T  # [P,P] -> diag? no:
            tnum = jnp.sum((p0 - o_W[None, :]) * n, axis=-1)  # [P]
            tt = tnum[None, :] / jnp.where(
                jnp.abs(denom) < 1e-9, jnp.inf, denom
            )
            X = o_W[None, None, :] + tt[..., None] * d[:, None, :]
            rel = X - p0[None, :, :]
            uu = jnp.sum(rel * eu[None], -1) / jnp.sum(eu * eu, -1)[None]
            vv = jnp.sum(rel * ev[None], -1) / jnp.sum(ev * ev, -1)[None]
            ok = (
                (tt > 0.2) & (uu >= 0) & (uu <= 1) & (vv >= 0) & (vv <= 1)
            )
            tt = jnp.where(ok, tt, 1e9)
            k = jnp.argmin(tt, axis=1)  # [HW] z-buffer
            ar = jnp.arange(tt.shape[0])
            hit = tt[ar, k] < 1e8
            Tsz = tex.shape[1]
            px = jnp.clip(uu[ar, k], 0, 1) * (Tsz - 1)
            py = jnp.clip(vv[ar, k], 0, 1) * (Tsz - 1)
            x0 = jnp.floor(px).astype(jnp.int32)
            y0 = jnp.floor(py).astype(jnp.int32)
            x1 = jnp.minimum(x0 + 1, Tsz - 1)
            y1 = jnp.minimum(y0 + 1, Tsz - 1)
            fx, fy = px - x0, py - y0
            v00 = tex[k, y0, x0]
            v01 = tex[k, y0, x1]
            v10 = tex[k, y1, x0]
            v11 = tex[k, y1, x1]
            val = (
                v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
                + v10 * (1 - fx) * fy + v11 * fx * fy
            )
            img = jnp.where(hit, val, 0.0)
            img = jnp.clip(img * gain, 0.0, 1.0)
            return img, jnp.where(hit, k, -1)

        self._tex_render = jax.jit(render_one)
        return self._tex_render

    def _cam_rays(self, ci: int):
        import jax.numpy as jnp

        cache = getattr(self, "_rays_cache", {})
        if ci not in cache:
            cam = self.cameras[ci]
            H, W = cam.height, cam.width
            u, v = np.meshgrid(
                np.arange(W, dtype=np.float32) + 0.5,
                np.arange(H, dtype=np.float32) + 0.5,
            )
            uv = jnp.asarray(
                np.stack([u.ravel(), v.ravel()], -1)
            )
            rays = cam.back_project(uv)
            cache[ci] = rays.astype(jnp.float32)
            self._rays_cache = cache
            self._T_SC7_np = [
                np.concatenate([np.asarray(T.r), np.asarray(T.q)])
                .astype(np.float32)
                for T in self.extrinsics
            ]
        return cache[ci]

    def _gain_at(self, t: float) -> float:
        # smooth exposure variation (auto-exposure/lighting changes)
        return float(
            1.0 + self.exposure_amp * np.sin(0.9 * t + 0.7)
        )

    def render(self, T_WS) -> List[np.ndarray]:
        return [im for im, _lab in self._render_all(T_WS)]

    def render_with_labels(self, T_WS):
        """[(image [H,W] float, class map [H,W] int: -1 no-hit else
        cityscapes id)] per camera — the CNN training fixture."""
        return [
            (im, self.plane_class[np.maximum(lab, 0)] * (lab >= 0)
             + (-1) * (lab < 0))
            for im, lab in self._render_all(T_WS)
        ]

    def _render_all(self, T_WS):
        import jax
        import jax.numpy as jnp

        fn = self._render_fn()
        i = getattr(self, "_frame_i", 0)
        self._frame_i = i + 1
        gain = self._gain_at(i / self.frame_rate)
        out = []
        for ci, cam in enumerate(self.cameras):
            rays = self._cam_rays(ci)
            img, lab = jax.device_get(fn(
                rays, jnp.asarray(np.asarray(T_WS, np.float32)),
                jnp.asarray(self._T_SC7_np[ci]),
                jnp.asarray(self.plane_p0), jnp.asarray(self.plane_eu),
                jnp.asarray(self.plane_ev), jnp.asarray(self.textures),
                jnp.float32(gain),
            ))
            H, W = cam.height, cam.width
            out.append((
                np.asarray(img, np.float32).reshape(H, W),
                np.asarray(lab, np.int32).reshape(H, W),
            ))
        return out

    def stream(self) -> Iterator[tuple]:
        self._frame_i = 0  # exposure model follows the frame clock
        yield from super().stream()

"""Train fast-scnn on procedurally generated sky/person scenes.

The reference ships a cityscapes-trained TorchScript fast-scnn
(cnn/demo.py exports fast-scnn.pt); that dataset is not available in
this environment, so we train the SAME Flax architecture on a synthetic
proxy whose label semantics match the two classes the SLAM pipeline
consumes: SKY (10) above a horizon and PERSON (11) as dark upright
blobs, everything else "building" (2). The resulting weights exercise
the full suppression path (segmentation -> keypoint classification ->
landmark information x 1e-4) end-to-end; swap in cityscapes weights via
`save_params`-format .npz for real-world deployments.

Run: python -m okvis2_tpu.models.train_synthetic [steps] [out.npz]
"""

from __future__ import annotations

import sys

import numpy as np


def make_scene(rng, H=192, W=320):
    """Returns (image [H,W,3] float, labels [H,W] int)."""
    img = np.zeros((H, W), np.float32)
    lab = np.full((H, W), 2, np.int32)  # "building"
    horizon = int(rng.uniform(0.2, 0.6) * H)
    # sky: bright smooth vertical gradient + slow horizontal waves
    yy = np.arange(horizon)[:, None] / max(horizon, 1)
    xx = np.arange(W)[None, :] / W
    sky = 0.75 + 0.2 * (1 - yy) + 0.05 * np.sin(
        2 * np.pi * (xx * rng.uniform(0.5, 2.0) + rng.uniform())
    )
    img[:horizon] = sky
    lab[:horizon] = 10  # SKY
    # ground/structures: textured blocks
    n_blocks = rng.integers(10, 25)
    for _ in range(n_blocks):
        bw = int(rng.uniform(10, 60))
        bh = int(rng.uniform(10, 50))
        x0 = rng.integers(0, max(W - bw, 1))
        y0 = rng.integers(horizon, max(H - bh, horizon + 1))
        img[y0:y0 + bh, x0:x0 + bw] = rng.uniform(0.2, 0.6) + \
            0.1 * rng.standard_normal((min(bh, H - y0), min(bw, W - x0)))
    # persons: dark upright ellipses with a head blob, can straddle horizon
    for _ in range(rng.integers(0, 4)):
        ph = int(rng.uniform(30, 70))
        pw = max(int(ph * rng.uniform(0.25, 0.4)), 6)
        cx = rng.integers(pw, W - pw)
        cy = rng.integers(max(horizon - ph // 4, ph), H - ph // 2)
        y, x = np.ogrid[:H, :W]
        body = ((x - cx) / (pw / 2)) ** 2 + ((y - cy) / (ph / 2)) ** 2 <= 1
        head_r = pw // 2
        head = ((x - cx) ** 2 + (y - (cy - ph // 2 - head_r)) ** 2
                <= head_r ** 2)
        m = body | head
        img[m] = rng.uniform(0.02, 0.15)
        lab[m] = 11  # PERSON
    img = np.clip(img + 0.02 * rng.standard_normal((H, W)), 0, 1)
    return np.stack([img] * 3, axis=-1).astype(np.float32), lab


def make_textured_pool(n_scenes=8, views_per=3, seed=1,
                       H=192, W=320):
    """Pre-render (image, label) pairs from the 3D textured world
    (okvis2_tpu/pipeline/dataset.py::TexturedWorldDataset): noise-
    textured surfaces, TRUE occlusion boundaries, a featureless-bright
    "sky" ceiling (class 10) and a dark "person" occluder quad (class
    11), under exposure variation — geometry-grounded training data the
    2D proxy scenes lack."""
    import jax.numpy as jnp

    from okvis2_tpu.cameras.distortion import RadialTangentialDistortion
    from okvis2_tpu.cameras.pinhole import PinholeCamera
    from okvis2_tpu.core.se3 import Transformation
    from okvis2_tpu.imu.preintegration import ImuParameters
    from okvis2_tpu.pipeline.dataset import TexturedWorldDataset

    cam = PinholeCamera.create(
        W, H, 170.0, 170.0, W / 2.0, H / 2.0,
        RadialTangentialDistortion.from_params([0.0, 0.0, 0.0, 0.0]),
    )
    T0 = Transformation.identity(dtype=cam.focal.dtype)
    rng = np.random.default_rng(seed)
    pool = []
    for k in range(n_scenes):
        ds = TexturedWorldDataset(
            (cam,), [T0], ImuParameters.create(g=9.81), seed=seed + k,
            exposure_amp=float(rng.uniform(0.0, 0.25)),
            n_occluders=int(rng.integers(1, 4)),
        )
        for _v in range(views_per):
            # viewpoints that keep ceiling ("sky") and occluders in view
            ang = rng.uniform(-0.35, 0.1)  # pitch up a bit
            pose = np.array([
                rng.uniform(-1.5, 3.0), rng.uniform(-1.0, 2.0),
                rng.uniform(-1.0, 2.0),
                np.sin(ang / 2), 0.0, 0.0, np.cos(ang / 2),
            ])
            im, lab = ds.render_with_labels(pose)[0]
            lab = np.where(lab < 0, 2, lab)  # no-hit -> "building"
            lab = np.where(lab == 0, 2, lab)  # background -> "building"
            pool.append((
                np.stack([im] * 3, axis=-1).astype(np.float32),
                lab.astype(np.int32),
            ))
    return pool


def train(steps=400, out_path=None, batch=4, seed=0, lr=1e-3,
          textured_frac=0.5):
    import jax
    import jax.numpy as jnp
    import optax

    from okvis2_tpu.models.fast_scnn import FastSCNN, init_params, save_params

    model = FastSCNN()
    params = init_params(jax.random.PRNGKey(seed))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    tex_pool = make_textured_pool(seed=seed + 1) if textured_frac > 0 \
        else []
    print(f"textured pool: {len(tex_pool)} rendered views", flush=True)

    @jax.jit
    def step(params, opt_state, imgs, labs):
        def loss_fn(p):
            logits = model.apply(p, imgs)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labs
            )
            return ls.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for it in range(steps):
        imgs = []
        labs = []
        for _ in range(batch):
            if tex_pool and rng.uniform() < textured_frac:
                im, lb = tex_pool[rng.integers(len(tex_pool))]
                # photometric augmentation on the cached render
                im = np.clip(
                    im * rng.uniform(0.85, 1.15)
                    + 0.02 * rng.standard_normal(im.shape).astype(
                        np.float32
                    ),
                    0, 1,
                )
            else:
                im, lb = make_scene(rng)
            imgs.append(im)
            labs.append(lb)
        imgs = jnp.asarray(np.stack(imgs))
        labs = jnp.asarray(np.stack(labs))
        params, opt_state, loss = step(params, opt_state, imgs, labs)
        if it % 25 == 0:
            print(f"step {it}: loss {float(loss):.4f}", flush=True)

    # eval pixel accuracy on fresh 2D scenes AND held-out textured views
    from okvis2_tpu.models.fast_scnn import segment_image

    accs = []
    for _ in range(8):
        im, lb = make_scene(rng)
        seg = np.asarray(segment_image(params, jnp.asarray(im)))
        accs.append((seg == lb).mean())
    acc = float(np.mean(accs))
    acc_tex = float("nan")
    if tex_pool:
        tex_eval = make_textured_pool(n_scenes=2, views_per=2,
                                      seed=seed + 999)
        taccs = [
            (np.asarray(segment_image(params, jnp.asarray(im))) == lb)
            .mean()
            for im, lb in tex_eval
        ]
        acc_tex = float(np.mean(taccs))
    print(f"pixel accuracy: 2d {acc:.3f}  textured {acc_tex:.3f}")
    if out_path:
        save_params(out_path, params)
        print(f"saved {out_path}")
    return params, acc


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    out = sys.argv[2] if len(sys.argv) > 2 else \
        "okvis2_tpu/models/weights/fast_scnn_synthetic.npz"
    import os

    os.makedirs(os.path.dirname(out), exist_ok=True)
    train(steps, out)

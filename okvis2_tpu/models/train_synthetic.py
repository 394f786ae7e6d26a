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


def train(steps=400, out_path=None, batch=4, seed=0, lr=1e-3):
    import jax
    import jax.numpy as jnp
    import optax

    from okvis2_tpu.models.fast_scnn import FastSCNN, init_params, save_params

    model = FastSCNN()
    params = init_params(jax.random.PRNGKey(seed))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)

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
            im, lb = make_scene(rng)
            imgs.append(im)
            labs.append(lb)
        imgs = jnp.asarray(np.stack(imgs))
        labs = jnp.asarray(np.stack(labs))
        params, opt_state, loss = step(params, opt_state, imgs, labs)
        if it % 25 == 0:
            print(f"step {it}: loss {float(loss):.4f}", flush=True)

    # eval pixel accuracy on fresh scenes
    from okvis2_tpu.models.fast_scnn import segment_image

    accs = []
    for _ in range(8):
        im, lb = make_scene(rng)
        seg = np.asarray(segment_image(params, jnp.asarray(im)))
        accs.append((seg == lb).mean())
    acc = float(np.mean(accs))
    print(f"pixel accuracy: {acc:.3f}")
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

"""Train the default place-recognition vocabulary.

The reference ships a general pretrained DBoW2 vocabulary
(resources/small_voc.yml.gz) rather than training online from the first
scene — an online vocabulary is biased toward the session's opening
frames and degrades recall when the start is unrepresentative. This
script is the TPU-era analogue: detect+describe over MANY diverse
synthetic scenes (different star fields, textures, densities and
viewpoints), then k-majority-cluster the pooled descriptors into the
binary codebook committed at okvis2_tpu/resources/default_voc.npz
(loaded by LoopClosureBackend by default; online training remains the
fallback when the resource is missing).

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python -m okvis2_tpu.frontend.train_vocabulary
"""

from __future__ import annotations

import os

import numpy as np


def collect_descriptors(n_scenes: int = 24, per_scene: int = 512,
                        seed0: int = 100,
                        textured_frac: float = 0.75) -> np.ndarray:
    """Pool descriptors over many scenes. Most scenes are TEXTURED
    worlds (noise-textured surfaces, occluders, exposure variation —
    the descriptor statistics of real imagery); a minority stay star
    fields so sparse/high-contrast scenes remain represented."""
    from okvis2_tpu.frontend.descriptor import describe_keypoints
    from okvis2_tpu.frontend.detection import (
        DetectionConfig,
        detect_keypoints,
    )
    from okvis2_tpu.imu.preintegration import ImuParameters
    from okvis2_tpu.pipeline.dataset import (
        SyntheticDataset,
        TexturedWorldDataset,
    )
    from okvis2_tpu.pipeline.synthetic_run import small_rig

    import jax.numpy as jnp

    cams, exts = small_rig(width=320, height=240)
    imu = ImuParameters.create(g=9.81)
    det_cfg = DetectionConfig(max_keypoints=per_scene)
    rng = np.random.default_rng(0)
    pool = []
    n_tex = int(round(n_scenes * textured_frac))
    for k in range(n_scenes):
        if k < n_tex:
            ds = TexturedWorldDataset(
                cams, exts, imu, seed=seed0 + k,
                exposure_amp=float(rng.uniform(0.0, 0.25)),
                n_occluders=int(rng.integers(1, 5)),
            )
        else:
            ds = SyntheticDataset(
                cams, exts, imu, seed=seed0 + k,
                n_stars=int(rng.integers(800, 5000)),
            )
        # varied viewpoint per scene
        ang = rng.uniform(-0.3, 0.3)
        pose = np.array([
            rng.uniform(-0.5, 0.5), rng.uniform(-0.5, 0.5),
            rng.uniform(-0.2, 0.2),
            0.0, np.sin(ang / 2), 0.0, np.cos(ang / 2),
        ])
        img = jnp.asarray(ds.render(pose)[0])
        det = detect_keypoints(img, det_cfg)
        desc = describe_keypoints(img, det["xy"], det["size"], det["mask"])
        signs = np.asarray(desc["signs"])[np.asarray(det["mask"], bool)]
        pool.append(signs)
    return np.concatenate(pool)


def main(out_path: str | None = None, n_words: int = 512):
    from okvis2_tpu.frontend.bow import BinaryVocabulary

    if out_path is None:
        out_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "resources", "default_voc.npz",
        )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    signs = collect_descriptors()
    print(f"training on {len(signs)} descriptors from diverse scenes")
    voc = BinaryVocabulary.train(signs, n_words=n_words, iters=10)
    voc.save(out_path)
    print(f"saved {n_words}-word vocabulary to {out_path}")
    return out_path


if __name__ == "__main__":
    main()

"""Architecture-parity test for the torch Fast-SCNN weight importer.

The real cityscapes checkpoint is not downloadable in this environment,
so parity is proven structurally: instantiate the torch mirror of the
public checkpoint layout (models/torch_fast_scnn.py) with RANDOM
weights, convert its state_dict with the importer, and require the Flax
model to reproduce the torch outputs. That validates every weight
transpose, the BN wiring, align_corners resizes, adaptive pooling and
the torch-style conv padding — the conversion itself; real weights are
then just a different state_dict through the same path (reference
recipe: cnn/demo.py:31-76)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_torch_to_flax_output_parity():
    import jax.numpy as jnp

    from okvis2_tpu.models.fast_scnn import FastSCNN
    from okvis2_tpu.models.import_torch_fast_scnn import convert_state_dict
    from okvis2_tpu.models.torch_fast_scnn import build_torch_fast_scnn

    torch.manual_seed(0)
    model_t = build_torch_fast_scnn()
    model_t.eval()
    # make BN running stats non-trivial so the test exercises them
    with torch.no_grad():
        for m in model_t.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.detach().numpy() for k, v in model_t.state_dict().items()
          if "num_batches_tracked" not in k}
    variables = convert_state_dict(sd)

    rng = np.random.default_rng(1)
    # 192x320: the suppression path's working size (and H/32=6 exercises
    # every pyramid-pooling bin size)
    img = rng.uniform(-1, 1, (192, 320, 3)).astype(np.float32)

    with torch.no_grad():
        out_t = model_t(
            torch.from_numpy(img).permute(2, 0, 1)[None]
        )[0].permute(1, 2, 0).numpy()

    out_f = np.asarray(
        FastSCNN().apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(img),
        ),
        np.float32,
    )

    assert out_f.shape == out_t.shape == (192, 320, 19)
    err = np.abs(out_f - out_t).max()
    assert err < 2e-3, f"logit mismatch {err}"
    agree = (out_f.argmax(-1) == out_t.argmax(-1)).mean()
    assert agree > 0.999, f"argmax agreement {agree}"


def test_converter_roundtrip_npz(tmp_path):
    """End-to-end CLI path: torch .pth -> converter -> .npz ->
    load_params -> segment_image runs."""
    import jax.numpy as jnp

    from okvis2_tpu.models.fast_scnn import load_params, segment_image
    from okvis2_tpu.models.import_torch_fast_scnn import main
    from okvis2_tpu.models.torch_fast_scnn import build_torch_fast_scnn

    torch.manual_seed(2)
    model_t = build_torch_fast_scnn()
    pth = tmp_path / "fast_scnn_random.pth"
    torch.save(model_t.state_dict(), str(pth))
    npz = tmp_path / "fast_scnn_random.npz"
    assert main([str(pth), str(npz)]) == 0

    variables = load_params(str(npz))
    seg = segment_image(variables, jnp.zeros((100, 150), jnp.float32))
    assert seg.shape == (100, 150)

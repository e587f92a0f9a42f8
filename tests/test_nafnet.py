"""NAFNet-64 expert: shape contracts + numerical parity vs the torch reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.nafnet import NAFNetSR
from freqfusion_tpu.utils.convert import fill_params, nafnet_key_fn

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy


def _small_cfg():
    # tiny config for fast tests; same topology as SIDD width-64
    return dict(upscale=4, width=8, middle_blk_num=2,
                enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))


def test_shape_contract():
    model = NAFNetSR(**_small_cfg())
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    sr, feats = model.apply(params, x)
    assert sr.shape == (1, 64, 64, 3)
    assert feats.shape == (1, 64, 64, 8)
    assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0


@requires_reference
def test_parity_vs_reference():
    import torch
    ref_mod = ref_import("src.models.nafnet")
    torch.manual_seed(0)
    ref = ref_mod.NAFNetSR(upscale=4, img_channel=3, width=8, middle_blk_num=2,
                           enc_blk_nums=[1, 1], dec_blk_nums=[1, 1]).eval()
    # make residual scales nonzero so every branch is exercised
    with torch.no_grad():
        for n, p in ref.named_parameters():
            if n.endswith(("beta", "gamma")):
                p.copy_(torch.randn_like(p) * 0.5)

    model = NAFNetSR(**_small_cfg())
    x = np.random.default_rng(1).uniform(size=(2, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # NAFNetSR.state_dict() duplicates the backbone under alias attributes
    # (intro/ending/middle_blks/body); keep only the canonical nafnet.* keys.
    sd = {k[len("nafnet."):]: v for k, v in torch_state_dict_numpy(ref).items()
          if k.startswith("nafnet.")}
    new_params, report = fill_params(params["params"], sd, nafnet_key_fn)
    assert not report["missing"], report["missing"][:5]
    assert not report["unused"], report["unused"][:5]

    sr, feats = model.apply({"params": new_params}, jnp.asarray(x))

    with torch.no_grad():
        captured = {}
        ref.nafnet.ending.register_forward_pre_hook(
            lambda m, inp: captured.update(feat=inp[0]))
        ref_sr = ref(to_nchw(x))

    np.testing.assert_allclose(np.asarray(sr), to_nhwc(ref_sr), atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(feats), to_nhwc(captured["feat"]),
                               atol=3e-5, rtol=1e-4)


@requires_reference
def test_full_size_converter_coverage():
    """Converter must cover every key of the real SIDD-width64 topology."""
    import torch
    ref_mod = ref_import("src.models.nafnet")
    ref = ref_mod.create_nafnet_sr_model()
    model = NAFNetSR()
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0),
                            jnp.zeros((1, 8, 8, 3)))
    sd = {k[len("nafnet."):]: np.zeros(tuple(v.shape), np.float32)
          for k, v in ref.state_dict().items() if k.startswith("nafnet.")}
    from flax import traverse_util
    flat = traverse_util.flatten_dict(params["params"])
    mapped = {nafnet_key_fn(p) for p in flat}
    assert mapped == set(sd), (sorted(mapped - set(sd))[:5], sorted(set(sd) - mapped)[:5])


def test_gradients_flow():
    model = NAFNetSR(**_small_cfg())
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        sr, _ = model.apply(p, x)
        return jnp.mean(sr)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)

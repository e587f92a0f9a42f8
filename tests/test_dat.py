"""DAT expert: shape contracts + numerical parity vs the torch reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.dat import DAT
from freqfusion_tpu.utils.convert import dat_key_fn, fill_params, filter_unused

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy


def _small_cfg():
    # two groups so both rg_idx parities (shift rules) are exercised, four
    # blocks so spatial/channel alternation + shifted blocks all appear
    return dict(upscale=4, embed_dim=64, depths=(4, 4), num_heads=(4, 4),
                split_size=(2, 4), expansion=2.0)


def test_shape_contract():
    model = DAT(**_small_cfg())
    x = jnp.zeros((1, 8, 8, 3))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        lambda p, x: model.apply(p, x), params, x)
    assert out[0].shape == (1, 32, 32, 3)
    assert out[1].shape == (1, 8, 8, 64)


@requires_reference
@pytest.mark.parametrize("hw", [(8, 8), (10, 6)])  # aligned + needs-padding
@pytest.mark.slow
def test_parity_vs_reference(hw):
    import torch
    ref_mod = ref_import("src.models.dat.dat_arch")
    torch.manual_seed(0)
    ref = ref_mod.DAT(
        upscale=4, in_chans=3, img_size=8, embed_dim=64, depth=[4, 4],
        num_heads=[4, 4], split_size=[2, 4], expansion_factor=2.0,
        qkv_bias=True, img_range=1.0, drop_path_rate=0.0,
        upsampler="pixelshuffle").eval()
    # randomize BN running stats so eval-BN conversion is actually tested
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)

    model = DAT(**_small_cfg())
    h, w = hw
    x = np.random.default_rng(1).uniform(size=(1, h, w, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = torch_state_dict_numpy(ref)
    new_params, report = fill_params(params["params"], sd, dat_key_fn)
    assert not report["missing"], report["missing"][:5]
    assert not filter_unused(report["unused"]), filter_unused(report["unused"])[:5]

    sr, deep = model.apply({"params": new_params}, jnp.asarray(x))

    with torch.no_grad():
        captured = {}
        ref.conv_after_body.register_forward_hook(
            lambda m, i, o: captured.update(feat=o))
        ref_sr = ref(to_nchw(x))

    np.testing.assert_allclose(np.asarray(sr), to_nhwc(ref_sr), atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(deep), to_nhwc(captured["feat"]),
                               atol=5e-5, rtol=1e-4)

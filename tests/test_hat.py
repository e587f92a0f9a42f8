"""HAT expert: overlapping-window extraction, shape contracts, torch parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.hat import HAT
from freqfusion_tpu.ops.windows import extract_overlapping_windows
from freqfusion_tpu.utils.convert import fill_params, filter_unused, hat_key_fn

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy


def _small_cfg():
    # 2 groups × 3 blocks: covers shift-0/shift blocks + OCAB in each group
    return dict(upscale=4, embed_dim=24, depths=(3, 3), num_heads=(2, 2),
                window=4, overlap_ratio=0.5, mlp_ratio=2.0, squeeze=6)


def test_overlapping_windows_match_unfold():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
    win, ov = 4, 2
    ours = np.asarray(extract_overlapping_windows(jnp.asarray(x), win, ov))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ows = win + ov
    u = torch.nn.functional.unfold(t, kernel_size=ows, stride=win,
                                   padding=(ows - win) // 2)
    # torch: [B, C*ows*ows, nW] (c slowest) → [B*nW, ows*ows, C]
    b, _, nw = u.shape
    u = u.view(b, 5, ows * ows, nw).permute(0, 3, 2, 1).reshape(-1, ows * ows, 5)
    np.testing.assert_allclose(ours, u.numpy(), atol=0)


def test_shape_contract():
    model = HAT(**_small_cfg())
    x = jnp.zeros((1, 8, 8, 3))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(lambda p, x: model.apply(p, x), params, x)
    assert out[0].shape == (1, 32, 32, 3)
    assert out[1].shape == (1, 8, 8, 24)


@requires_reference
@pytest.mark.parametrize("depths", [(3, 3), (4, 4)])
def test_parity_vs_reference(depths):
    # (3,3): group-scan only (odd depth unrolls the blocks);
    # (4,4): nested scan — HAB pairs within scanned groups — the HAT-L
    # layout (depths (6,)*12), exercising the Stacked(2) converter spec
    import torch
    ref_mod = ref_import("src.models.hat")
    torch.manual_seed(0)
    ref = ref_mod.HAT(
        upscale=4, in_chans=3, img_size=8, window_size=4, compress_ratio=3,
        squeeze_factor=6, conv_scale=0.01, overlap_ratio=0.5, img_range=1.0,
        depths=list(depths), embed_dim=24, num_heads=[2, 2], mlp_ratio=2,
        drop_path_rate=0.0, upsampler="pixelshuffle",
        resi_connection="1conv").eval()

    model = HAT(**{**_small_cfg(), "depths": depths})
    x = np.random.default_rng(1).uniform(size=(1, 8, 12, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = torch_state_dict_numpy(ref)
    new_params, report = fill_params(params["params"], sd, hat_key_fn)
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

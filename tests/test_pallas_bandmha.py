"""Fused per-pixel band-MHA kernel vs the XLA TorchMHA path."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.hat import apply_ln
from freqfusion_tpu.models.layers import TorchMHA
from freqfusion_tpu.ops.pallas.bandmha import fused_band_mha


def test_fused_band_mha_matches_torchmha():
    b, h, w, t, d, nh = 2, 8, 16, 9, 64, 4
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    stacked = jax.random.normal(keys[0], (b, h, w, t, d)) * 0.4
    lnw = 1.0 + jax.random.normal(keys[1], (d,)) * 0.1
    lnb = jax.random.normal(keys[2], (d,)) * 0.1

    mha = TorchMHA(d, nh)
    variables = mha.init(jax.random.PRNGKey(3), stacked[:1, :2, :2])
    p = variables["params"]

    normed = apply_ln(stacked, lnw, lnb)
    want = mha.apply(variables, normed) + stacked

    got = fused_band_mha(
        stacked, p["in_proj_weight"], p["in_proj_bias"],
        p["out_proj"]["kernel"], p["out_proj"]["bias"],
        lnw, lnb, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_fused_band_mha_small_token_count():
    b, h, w, t, d, nh = 1, 4, 8, 3, 32, 2
    stacked = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, t, d)) * 0.4
    lnw = jnp.ones((d,))
    lnb = jnp.zeros((d,))
    mha = TorchMHA(d, nh)
    variables = mha.init(jax.random.PRNGKey(6), stacked[:1, :2, :2])
    p = variables["params"]
    want = mha.apply(variables, apply_ln(stacked, lnw, lnb)) + stacked
    got = fused_band_mha(
        stacked, p["in_proj_weight"], p["in_proj_bias"],
        p["out_proj"]["kernel"], p["out_proj"]["bias"],
        lnw, lnb, nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)

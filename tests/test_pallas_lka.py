"""Fused Pallas LKA kernel vs the XLA reference chain (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.ops.pallas.lka import lka_gate, lka_gate_reference


def _weights(c, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((5, 5, c)).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((21, c)).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((21, c)).astype(np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1),
            jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
            jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1))


def test_kernel_matches_xla_chain():
    c = 64
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 24, 32, c)).astype(np.float32))
    w = _weights(c)
    ref = lka_gate_reference(x, *w)
    out = lka_gate(x, *w, block_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_kernel_handles_unaligned_height():
    c = 32
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 21, 16, c)).astype(np.float32))
    w = _weights(c, seed=3)
    ref = lka_gate_reference(x, *w)
    out = lka_gate(x, *w, block_h=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_model_pallas_flag_matches_xla_path():
    """LargeKernelAttention(use_pallas=True) must equal the XLA module path."""
    from freqfusion_tpu.models.lka import LargeKernelAttention
    from freqfusion_tpu.ops.pallas import lka as plka
    import functools

    # route the flag through interpret mode on CPU
    orig = plka.lka_gate
    plka.lka_gate = functools.partial(orig, interpret=True)
    try:
        x = jnp.asarray(np.random.default_rng(4).uniform(
            size=(1, 16, 16, 32)).astype(np.float32))
        mod_x = LargeKernelAttention(32, use_pallas=False)
        variables = mod_x.init(jax.random.PRNGKey(0), x)
        ref = mod_x.apply(variables, x)
        mod_p = LargeKernelAttention(32, use_pallas=True)
        out = mod_p.apply(variables, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
    finally:
        plka.lka_gate = orig


def test_batch_pair_packing_matches_xla_chain():
    """C=64 batch-pair channel packing (models/lka.py): tiled depthwise
    weights + block-diagonal pointwise on the packed tensor must equal the
    per-item XLA chain."""
    import jax
    import jax.numpy as jnp

    from freqfusion_tpu.ops.pallas.lka import lka_gate

    d, k, n, h, w = 64, 21, 4, 32, 32
    keys = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(keys[0], (n, h, w, d)) * 0.4
    w5 = jax.random.normal(keys[1], (5, 5, d)) * 0.1
    wh = jax.random.normal(keys[2], (k, d)) * 0.1
    wv = jax.random.normal(keys[3], (k, d)) * 0.1
    wp = jax.random.normal(keys[4], (d, d)) * 0.1
    scale = 1.0 + jax.random.normal(keys[5], (d,)) * 0.1
    shift = jax.random.normal(keys[6], (d,)) * 0.1

    def dw(t, kern, kh, kw):
        return jax.lax.conv_general_dilated(
            t, kern, (1, 1), [(kh // 2, kh // 2), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=d)

    a = dw(x, w5.reshape(5, 5, 1, d), 5, 5)
    a = dw(a, wh.reshape(1, k, 1, d), 1, k)
    a = dw(a, wv.reshape(k, 1, 1, d), k, 1)
    a = jnp.einsum("bhwc,cd->bhwd", a, wp)
    want = x * jax.nn.sigmoid(a * scale + shift)

    x2 = jnp.transpose(x.reshape(n // 2, 2, h, w, d),
                       (0, 2, 3, 1, 4)).reshape(n // 2, h, w, 2 * d)
    z = jnp.zeros_like(wp)
    wpp = jnp.concatenate([jnp.concatenate([wp, z], 1),
                           jnp.concatenate([z, wp], 1)], 0)
    y = lka_gate(x2, jnp.tile(w5, (1, 1, 2)), jnp.tile(wh, (1, 2)),
                 jnp.tile(wv, (1, 2)), wpp, jnp.tile(scale, 2),
                 jnp.tile(shift, 2), interpret=True)
    got = jnp.transpose(y.reshape(n // 2, h, w, 2, d),
                        (0, 3, 1, 2, 4)).reshape(n, h, w, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)

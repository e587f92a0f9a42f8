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

"""conv3x3_chain lowerings: every variant must be an exact reformulation
of XLA's SAME-padded NHWC convolution chain (CAB's conv pair)."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.ops.convchain import conv3x3_chain


def _case(b, h, w, cin, mid, cout, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(keys[0], (b, h, w, cin)) * 0.3
    w1 = jax.random.normal(keys[1], (3, 3, cin, mid)) * 0.05
    b1 = jax.random.normal(keys[2], (mid,)) * 0.02
    w2 = jax.random.normal(keys[3], (3, 3, mid, cout)) * 0.05
    b2 = jax.random.normal(keys[4], (cout,)) * 0.02
    return x, w1, b1, w2, b2


def test_all_impls_match_xla_conv():
    args = _case(2, 10, 14, 12, 4, 12)
    want = np.asarray(conv3x3_chain(*args, impl="conv"))
    for impl in ("shift9", "im2col", "cnmajor"):
        got = np.asarray(conv3x3_chain(*args, impl=impl))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4,
                                   err_msg=impl)


def test_cab_module_uses_selected_impl(monkeypatch):
    """CAB output must be identical under every lowering selection."""
    from freqfusion_tpu.models.hat import CAB

    m = CAB(12, compress=3, squeeze=6)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 12)) * 0.3
    variables = m.init(jax.random.PRNGKey(2), x)
    outs = {}
    for impl in ("conv", "shift9", "im2col", "cnmajor"):
        monkeypatch.setenv("FREQFUSION_CAB_IMPL", impl)
        outs[impl] = np.asarray(m.apply(variables, x))
    for impl in ("shift9", "im2col", "cnmajor"):
        np.testing.assert_allclose(outs[impl], outs["conv"],
                                   atol=2e-5, rtol=1e-4, err_msg=impl)

"""Fused CAB conv-chain kernel (ops/pallas/cab.py): interpret-mode parity
vs the XLA reference and vs the CAB flax module (gate composition), so the
kernel is a drop-in for the module inside the fused-HAB serving path."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.hat import CAB, apply_ln
from freqfusion_tpu.ops.pallas.cab import cab_chain, cab_chain_reference


def _params(c, mid, seed=0):
    k = jax.random.PRNGKey
    ln_w = 1.0 + 0.1 * jax.random.normal(k(seed), (c,))
    ln_b = 0.05 * jax.random.normal(k(seed + 1), (c,))
    w1 = jax.random.normal(k(seed + 2), (3, 3, c, mid)) * (0.3 / c)
    b1 = 0.1 * jax.random.normal(k(seed + 3), (mid,))
    w2 = jax.random.normal(k(seed + 4), (3, 3, mid, c)) * (0.3 / mid)
    b2 = 0.1 * jax.random.normal(k(seed + 5), (c,))
    return ln_w, ln_b, w1, b1, w2, b2


def _run(b, h, w, c, mid, seed=0, repack=False):
    args = _params(c, mid, seed)
    x = jax.random.normal(jax.random.PRNGKey(seed + 9), (b, h, w, c)) * 0.5
    want_u, want_s = cab_chain_reference(x, *args)
    got_u, got_s = cab_chain(x, *args, interpret=True, repack=repack)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=2e-3, rtol=1e-4)


def test_cab_chain_matches_reference():
    _run(b=2, h=24, w=32, c=12, mid=4)


def test_cab_chain_single_strip():
    # one strip covers the image: both halo ends are boundary-masked
    _run(b=1, h=6, w=16, c=8, mid=4, seed=3)


def test_cab_chain_wide_channels():
    # c > mid * compress asymmetry plus multi-batch
    _run(b=2, h=16, w=24, c=24, mid=8, seed=5)


def test_cab_chain_repack_matches_reference():
    """The 3-matmul lane-concat repack (FREQFUSION_CAB_REPACK) is exact:
    mid pads to the 128-lane grid with zero weights/bias (gelu(0)=0)."""
    _run(b=2, h=24, w=32, c=12, mid=4, repack=True)
    _run(b=1, h=6, w=16, c=8, mid=4, seed=3, repack=True)


def test_cab_chain_repack_out_shift():
    b, h, w, c, mid, s = 1, 24, 32, 12, 4, 4
    args = _params(c, mid, seed=7)
    x = jax.random.normal(jax.random.PRNGKey(11), (b, h, w, c)) * 0.5
    want_u, want_s = cab_chain_reference(x, *args)
    want_u = jnp.roll(want_u, (-s, -s), axis=(1, 2))
    got_u, got_s = cab_chain(x, *args, interpret=True, out_shift=s,
                             repack=True)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=2e-3, rtol=1e-4)


def test_cab_chain_out_shift_folds_the_roll():
    """out_shift=s returns roll(u, (-s,-s)) with identical pooled sums —
    the shifted-HAB composition models/hat.py uses."""
    b, h, w, c, mid, s = 1, 24, 32, 12, 4, 4
    args = _params(c, mid, seed=7)
    x = jax.random.normal(jax.random.PRNGKey(11), (b, h, w, c)) * 0.5
    want_u, want_s = cab_chain_reference(x, *args)
    want_u = jnp.roll(want_u, (-s, -s), axis=(1, 2))
    got_u, got_s = cab_chain(x, *args, interpret=True, out_shift=s)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               atol=2e-3, rtol=1e-4)


def test_cab_chain_out_shift_odd_strip():
    # shift not a multiple of the budget-picked bh: bh must re-derive
    b, h, w, c, mid, s = 1, 18, 24, 8, 4, 3
    args = _params(c, mid, seed=13)
    x = jax.random.normal(jax.random.PRNGKey(17), (b, h, w, c)) * 0.5
    want_u, _ = cab_chain_reference(x, *args)
    want_u = jnp.roll(want_u, (-s, -s), axis=(1, 2))
    got_u, _ = cab_chain(x, *args, interpret=True, out_shift=s)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=5e-5, rtol=1e-4)


def test_cab_chain_out_shift_bh_cliff_falls_back_to_xla_roll(caplog):
    """h sharing few factors with the shift (42 vs 8 → bh=2) must not
    silently collapse to thin strips: the roll falls back to XLA with a
    warning and the result is unchanged (ADVICE r4 #2)."""
    import logging
    b, h, w, c, mid, s = 1, 42, 24, 8, 4, 8
    args = _params(c, mid, seed=19)
    x = jax.random.normal(jax.random.PRNGKey(23), (b, h, w, c)) * 0.5
    want_u, _ = cab_chain_reference(x, *args)
    want_u = jnp.roll(want_u, (-s, -s), axis=(1, 2))
    with caplog.at_level(logging.WARNING,
                         logger="freqfusion_tpu.ops.pallas.cab"):
        got_u, _ = cab_chain(x, *args, interpret=True, out_shift=s)
    assert any("falling back to an XLA roll" in r.getMessage()
               for r in caplog.records)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=5e-5, rtol=1e-4)


def test_conv3x3_dense_matches_xla():
    from freqfusion_tpu.ops.pallas.cab import conv3x3_dense
    k = jax.random.PRNGKey
    for b, h, w, c, cout, seed in ((2, 24, 32, 12, 8, 0), (1, 6, 16, 8, 8, 3)):
        x = jax.random.normal(k(seed), (b, h, w, c)) * 0.5
        wk = jax.random.normal(k(seed + 1), (3, 3, c, cout)) * (0.3 / c)
        bk = 0.1 * jax.random.normal(k(seed + 2), (cout,))
        want = jax.lax.conv_general_dilated(
            x, wk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + bk
        got = conv3x3_dense(x, wk, bk, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)


def test_seam_conv_is_a_drop_in_for_nn_conv():
    """SeamConv (models/layers.py) must accept an nn.Conv param tree
    unchanged and reproduce its numerics exactly off-TPU — the group-ending
    convs it replaced load from the same checkpoints (utils/convert.py)."""
    import flax.linen as nn
    from freqfusion_tpu.models.layers import SeamConv
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 12, 6)) * 0.5
    ref = nn.Conv(8, (3, 3))
    v = ref.init(jax.random.PRNGKey(1), x)
    want = ref.apply(v, x)
    got = SeamConv(8, use_pallas=True).apply(v, x)  # gate off-TPU → XLA path
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    # init produces the same tree (names AND shapes) as nn.Conv
    v2 = SeamConv(8).init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    assert all(a.shape == b.shape for a, b in zip(
        jax.tree_util.tree_leaves(v2), jax.tree_util.tree_leaves(v)))


def test_kernel_plus_gate_matches_cab_module():
    """u · sigmoid(MLP(mean(u))) == the CAB module output — the exact
    composition models/hat.py uses (gate applied via fused_hab_block's
    cab_scale operand)."""
    b, h, w, c, compress, squeeze = 1, 16, 24, 12, 3, 4
    m = CAB(c, compress, squeeze)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c)) * 0.5
    variables = m.init(jax.random.PRNGKey(1), x)
    p = variables["params"]
    ln_w = jnp.ones((c,))
    ln_b = jnp.zeros((c,))
    want = m.apply(variables, apply_ln(x, ln_w, ln_b))

    u, sums = cab_chain(x, ln_w, ln_b, p["conv1"]["kernel"],
                        p["conv1"]["bias"], p["conv2"]["kernel"],
                        p["conv2"]["bias"], interpret=True)
    pooled = sums / (h * w)
    midv = jax.nn.relu(jnp.einsum(
        "bxyc,cd->bxyd", pooled, p["ca"]["fc1"]["kernel"].reshape(c, -1))
        + p["ca"]["fc1"]["bias"])
    gate = jax.nn.sigmoid(jnp.einsum(
        "bxyc,cd->bxyd", midv, p["ca"]["fc2"]["kernel"].reshape(-1, c))
        + p["ca"]["fc2"]["bias"])
    got = u * gate
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)

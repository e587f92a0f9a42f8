"""Strip-resident conv-chain engine: interpret-mode exactness vs the XLA
module paths it replaces."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.edge import EdgeRefineBlock


def _perturb(params, seed=11):
    return jax.tree_util.tree_map(
        lambda a: a + 0.07 * jax.random.normal(
            jax.random.PRNGKey(hash(str(a.shape)) % 991 + seed), a.shape),
        params)


def test_edge_refine_block_chain_matches_xla():
    for h, w, cin, seed in ((16, 24, 3, 0), (8, 8, 32, 3)):
        m = EdgeRefineBlock(32)
        x = jax.random.normal(jax.random.PRNGKey(seed), (2, h, w, cin)) * 0.4
        variables = m.init(jax.random.PRNGKey(seed + 1), x)
        p = _perturb(variables["params"])
        want = m.apply({"params": p}, x)

        from freqfusion_tpu.ops.pallas.stencil import run_conv_chain
        w1, b1 = p["conv1"]["kernel"], p["conv1"]["bias"]
        w2, b2 = p["conv2"]["kernel"], p["conv2"]["bias"]
        w3, b3 = p["conv3"]["kernel"], p["conv3"]["bias"]
        wp_, bp_ = p["proj"]["kernel"], p["proj"]["bias"]
        wa1, ba1 = p["attn"]["fc1"]["kernel"], p["attn"]["fc1"]["bias"]
        wa2, ba2 = p["attn"]["fc2"]["kernel"], p["attn"]["fc2"]["bias"]
        hmid = run_conv_chain(
            x, ops=[{"kind": "conv3", "wi": 0, "act": "gelu"},
                    {"kind": "conv3", "wi": 1, "act": "gelu"}],
            weights=[(w1, b1), (w2, b2)], k=2, out_channels=32,
            interpret=True)
        got = run_conv_chain(
            hmid,
            ops=[{"kind": "conv3", "wi": 0, "act": None},
                 {"kind": "conv1_aux", "wi": 1, "act": None, "add": True},
                 {"kind": "save", "slot": 0},
                 {"kind": "conv1", "wi": 2, "act": "gelu"},
                 {"kind": "conv3", "wi": 3, "act": None},
                 {"kind": "gate_saved", "slot": 0}],
            weights=[(w3, b3), (wp_, bp_), (wa1, ba1), (wa2, ba2)],
            k=2, out_channels=32, aux=x, aux_channels=cin, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)


def test_stage_chain_matches_xla():
    """_Stage's two-kernel chain (gate 1x1s, gate_saved, ResBlock with
    traced residual scale) vs the module's XLA path."""
    from freqfusion_tpu.models.hierarchical import _Stage
    from freqfusion_tpu.ops.pallas.stencil import run_conv_chain

    m = _Stage(24, 16)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 12, 20, 11)) * 0.4
    variables = m.init(jax.random.PRNGKey(8), x)
    p = _perturb(variables["params"], seed=21)
    # give the zero-init-ish params real values for a meaningful test
    want = m.apply({"params": p}, x)

    w1, b1 = p["conv1"]["kernel"], p["conv1"]["bias"]
    w2, b2 = p["conv2"]["kernel"], p["conv2"]["bias"]
    g1, gb1 = p["gate"]["fc1"]["kernel"], p["gate"]["fc1"]["bias"]
    g2, gb2 = p["gate"]["fc2"]["kernel"], p["gate"]["fc2"]["bias"]
    r1 = p["res"]["conv1"]["kernel"]
    r2 = p["res"]["conv2"]["kernel"]
    rs = p["res"]["scale"]
    h = run_conv_chain(
        x, ops=[{"kind": "conv3", "wi": 0, "act": "gelu"},
                {"kind": "conv3", "wi": 1, "act": "gelu"}],
        weights=[(w1, b1), (w2, b2)], k=2, out_channels=16, interpret=True)
    got = run_conv_chain(
        h,
        ops=[{"kind": "save", "slot": 0},
             {"kind": "conv1", "wi": 0, "act": "gelu"},
             {"kind": "conv1", "wi": 1, "act": None},
             {"kind": "gate_saved", "slot": 0},
             {"kind": "save", "slot": 1},
             {"kind": "conv3", "wi": 2, "act": "gelu"},
             {"kind": "conv3", "wi": 3, "act": None},
             {"kind": "load_add", "slot": 1, "scale_wi": 4}],
        weights=[(g1, gb1), (g2, gb2), (r1, None), (r2, None), (rs, None)],
        k=2, out_channels=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_ln_conv_chain_matches_xla():
    """The CAB chain: ln op + two 3x3 convs vs apply_ln + lax convs."""
    from freqfusion_tpu.models.hat import apply_ln, gelu
    from freqfusion_tpu.ops.pallas.stencil import run_conv_chain

    c, mid = 24, 8
    keys = jax.random.split(jax.random.PRNGKey(9), 6)
    x = jax.random.normal(keys[0], (2, 16, 24, c)) * 0.4
    lnw = 1.0 + jax.random.normal(keys[1], (c,)) * 0.1
    lnb = jax.random.normal(keys[2], (c,)) * 0.1
    w1 = jax.random.normal(keys[3], (3, 3, c, mid)) * 0.08
    b1 = jax.random.normal(keys[4], (mid,)) * 0.02
    w2 = jax.random.normal(keys[5], (3, 3, mid, c)) * 0.08
    b2 = jnp.zeros((c,))

    def conv(t, w_, b_):
        return jax.lax.conv_general_dilated(
            t, w_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_

    want = conv(gelu(conv(apply_ln(x, lnw, lnb), w1, b1)), w2, b2)
    got = run_conv_chain(
        x, ops=[{"kind": "ln", "wi": 0},
                {"kind": "conv3", "wi": 1, "act": "gelu"},
                {"kind": "conv3", "wi": 2, "act": None}],
        weights=[(lnw, lnb), (w1, b1), (w2, b2)], k=2, out_channels=c,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_aim_kernels_match_xla():
    """aim_conv_branch + aim_gates_proj vs the DAT AIM XLA chain, both
    wirings (spatial swap=False, channel swap=True)."""
    from freqfusion_tpu.models.dat import (AIMConvBranch, ChannelInteraction,
                                           SpatialInteraction)
    from freqfusion_tpu.ops.pallas.aim import aim_conv_branch, aim_gates_proj

    c, b, h, w = 32, 2, 12, 16
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (b, h, w, c)) * 0.4
    att = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, c)) * 0.4

    aimb = AIMConvBranch(c)
    va = aimb.init(jax.random.PRNGKey(2), v)
    pa = _perturb(va["params"], seed=31)
    ci = ChannelInteraction(c)
    vc = ci.init(jax.random.PRNGKey(3), v)
    pc = _perturb(vc["params"], seed=32)
    si = SpatialInteraction(c)
    vs = si.init(jax.random.PRNGKey(4), v)
    ps = _perturb(vs["params"], seed=33)
    proj_w = jax.random.normal(jax.random.PRNGKey(5), (c, c)) * 0.05
    proj_b = jax.random.normal(jax.random.PRNGKey(6), (c,)) * 0.02

    conv_x = aimb.apply({"params": pa}, v)

    def bn_affine(p):
        inv = (p["weight"] / np.sqrt(np.asarray(p["running_var"]) + 1e-5))
        return jnp.asarray(inv), p["bias"] - p["running_mean"] * inv

    bns, bnb = bn_affine(pa["dwconv_bn"])
    cx, sums = aim_conv_branch(v, pa["dwconv"]["kernel"],
                               pa["dwconv"]["bias"], bns, bnb,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(cx), np.asarray(conv_x),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sums)[:, 0, 0],
        np.asarray(conv_x.sum(axis=(1, 2))), atol=2e-3, rtol=1e-4)

    si_bns, si_bnb = bn_affine(ps["bn"])
    si_raw = (ps["fc1"]["kernel"], ps["fc1"]["bias"], si_bns, si_bnb,
              ps["fc2"]["kernel"], ps["fc2"]["bias"])

    # spatial wiring
    chmap = ci.apply({"params": pc}, conv_x)
    want = (att * jax.nn.sigmoid(chmap)
            + conv_x * jax.nn.sigmoid(si.apply({"params": ps}, att)))
    want = want @ proj_w + proj_b
    got = aim_gates_proj(att, conv_x, chmap, *si_raw, proj_w, proj_b,
                         swap=False, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)

    # channel wiring
    chmap2 = ci.apply({"params": pc}, att)
    want2 = (att * jax.nn.sigmoid(si.apply({"params": ps}, conv_x))
             + conv_x * jax.nn.sigmoid(chmap2))
    want2 = want2 @ proj_w + proj_b
    got2 = aim_gates_proj(att, conv_x, chmap2, *si_raw, proj_w, proj_b,
                          swap=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=5e-5, rtol=1e-4)

"""Fused window-attention kernel: interpret-mode exactness vs the XLA path
(same params, same inputs — the kernel must be a drop-in replacement)."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.hat import WindowAttention
from freqfusion_tpu.ops import windows as W
from freqfusion_tpu.ops.pallas.wattn import fused_window_attention


def _params(rng, c, nh, window):
    k = iter(jax.random.split(jax.random.PRNGKey(rng), 6))
    return dict(
        wqkv=jax.random.normal(next(k), (c, 3 * c)) * 0.05,
        bqkv=jax.random.normal(next(k), (3 * c,)) * 0.02,
        wproj=jax.random.normal(next(k), (c, c)) * 0.05,
        bproj=jax.random.normal(next(k), (c,)) * 0.02,
        bias=jax.random.normal(next(k), (nh, window * window, window * window)) * 0.1,
    )


def _xla_reference(x, p, window, nh, mask=None):
    b, h, w, c = x.shape
    n = window * window
    hd = c // nh
    xw = W.window_partition(x, window, window)
    bw = xw.shape[0]
    qkv = (xw @ p["wqkv"] + p["bqkv"]).reshape(bw, n, 3, nh, hd)
    q, k, v = (jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3))
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k)
    attn = attn + p["bias"][None]
    if mask is not None:
        nw = mask.shape[0]
        attn = attn.reshape(bw // nw, nw, nh, n, n) + mask[None, :, None]
        attn = attn.reshape(bw, nh, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bw, n, c)
    out = out @ p["wproj"] + p["bproj"]
    return W.window_reverse(out, window, window, h, w)


def _run_case(b, h, w, c, nh, window, with_mask, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (b, h, w, c)) * 0.3
    p = _params(seed + 1, c, nh, window)
    mask = None
    if with_mask:
        mask = W.shift_attn_mask(h, w, window, window, window // 2, window // 2)
    want = _xla_reference(x, p, window, nh,
                          jnp.asarray(mask) if mask is not None else None)
    got = fused_window_attention(
        x, p["wqkv"], p["bqkv"], p["wproj"], p["bproj"], p["bias"], mask,
        (window, window), nh, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_xla_no_mask():
    _run_case(2, 16, 24, 36, 6, 8, with_mask=False)


def test_fused_matches_xla_with_shift_mask():
    _run_case(1, 32, 16, 24, 4, 8, with_mask=True, seed=3)


def test_fused_matches_xla_gh_grouping():
    # H/ws = 4 rows of windows → gh=4 grouping exercised
    _run_case(1, 32, 8, 16, 2, 8, with_mask=False, seed=5)


def test_fused_qkv_variant_matches_xla_rect_windows():
    """DAT-style pre-projected q/k/v with rectangular (2,8)/(8,2) windows."""
    from freqfusion_tpu.ops.pallas.wattn import fused_window_attention_qkv

    b, h, w, c, nh = 1, 16, 16, 12, 2
    for wsh, wsw in ((2, 8), (8, 2)):
        n = wsh * wsw
        keys = jax.random.split(jax.random.PRNGKey(wsh), 4)
        q, k, v = (jax.random.normal(keys[i], (b, h, w, c)) * 0.3
                   for i in range(3))
        bias = jax.random.normal(keys[3], (nh, n, n)) * 0.1
        mask = W.shift_attn_mask(h, w, wsh, wsw, wsh // 2, wsw // 2)

        # XLA reference (mirrors dat.SpatialWindowAttention inner math)
        hd = c // nh
        def to_wins(t):
            t = W.window_partition(t, wsh, wsw)
            return jnp.transpose(t.reshape(-1, n, nh, hd), (0, 2, 1, 3))
        qw, kw, vw = to_wins(q), to_wins(k), to_wins(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qw * (hd ** -0.5), kw) + bias[None]
        nw = mask.shape[0]
        attn = attn.reshape(b, nw, nh, n, n) + jnp.asarray(mask)[None, :, None]
        attn = jax.nn.softmax(attn.reshape(-1, nh, n, n), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vw)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, n, c)
        want = W.window_reverse(out, wsh, wsw, h, w)

        got = fused_window_attention_qkv(q, k, v, bias, mask, (wsh, wsw), nh,
                                         interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_fused_xqkv_variant_matches_xla_rect_windows():
    """DAT fused-projection variant: full-width x + branch qkv columns in,
    pre-projection attended image out — vs project-in-XLA then window-MHA."""
    from freqfusion_tpu.ops.pallas.wattn import fused_window_attention_xqkv

    b, h, w, cin, co, nh = 1, 16, 16, 24, 12, 2
    hd = co // nh
    for wsh, wsw, with_mask in ((2, 8, True), (8, 2, False)):
        n = wsh * wsw
        keys = jax.random.split(jax.random.PRNGKey(wsh + 17), 4)
        x = jax.random.normal(keys[0], (b, h, w, cin)) * 0.3
        wqkv = jax.random.normal(keys[1], (cin, 3 * co)) * 0.05
        bqkv = jax.random.normal(keys[2], (3 * co,)) * 0.02
        bias = jax.random.normal(keys[3], (nh, n, n)) * 0.1
        mask = (W.shift_attn_mask(h, w, wsh, wsw, wsh // 2, wsw // 2)
                if with_mask else None)

        qkv = x @ wqkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_wins(t):
            t = W.window_partition(t, wsh, wsw)
            return jnp.transpose(t.reshape(-1, n, nh, hd), (0, 2, 1, 3))
        qw, kw, vw = to_wins(q), to_wins(k), to_wins(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qw * (hd ** -0.5), kw) + bias[None]
        if with_mask:
            nw = mask.shape[0]
            attn = (attn.reshape(b, nw, nh, n, n)
                    + jnp.asarray(mask)[None, :, None]).reshape(-1, nh, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vw)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, n, co)
        want = W.window_reverse(out, wsh, wsw, h, w)

        got = fused_window_attention_xqkv(x, wqkv, bqkv, bias, mask,
                                          (wsh, wsw), nh, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


def test_branch_qkv_slices_match_split_then_slice():
    """_branch_qkv_slices must reproduce split(project(x)) branch channels:
    x @ w_branch == concat(q,k,v branch halves) for both branches."""
    from freqfusion_tpu.models.dat import _branch_qkv_slices

    c, half = 12, 6
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(keys[0], (2, 4, 4, c)) * 0.3
    wqkv = jax.random.normal(keys[1], (c, 3 * c)) * 0.05
    bqkv = jax.random.normal(keys[2], (3 * c,)) * 0.02
    q, k, v = jnp.split(x @ wqkv + bqkv, 3, axis=-1)
    for br in (0, 1):
        sl = slice(br * half, br * half + half)
        want = jnp.concatenate([q[..., sl], k[..., sl], v[..., sl]], axis=-1)
        wb, bb = _branch_qkv_slices(wqkv, bqkv, c, half, br)
        got = x @ wb + bb
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)


def test_fused_overlap_attention_matches_xla():
    """OCAB inner attention: 3-strip overlapping kv assembly vs the
    slice-stack XLA path."""
    from freqfusion_tpu.ops.pallas.wattn import fused_overlap_attention

    b, h, w, c, nh, ws = 1, 16, 24, 12, 2, 8
    ows, ov = ws + ws // 2, ws // 2
    keys = jax.random.split(jax.random.PRNGKey(0), 6)
    q, k, v = (jax.random.normal(keys[i], (b, h, w, c)) * 0.3 for i in range(3))
    wproj = jax.random.normal(keys[3], (c, c)) * 0.05
    bproj = jax.random.normal(keys[4], (c,)) * 0.02
    bias = jax.random.normal(keys[5], (nh, ws * ws, ows * ows)) * 0.1

    hd = c // nh
    qw = W.window_partition(q, ws, ws)
    kw = W.extract_overlapping_windows(k, ws, ov)
    vw = W.extract_overlapping_windows(v, ws, ov)

    def heads(t):
        return jnp.transpose(t.reshape(t.shape[0], t.shape[1], nh, hd),
                             (0, 2, 1, 3))
    attn = jnp.einsum("bhnd,bhmd->bhnm", heads(qw) * (hd ** -0.5), heads(kw))
    attn = jax.nn.softmax(attn + bias[None], axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, heads(vw))
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(-1, ws * ws, c)
    want = W.window_reverse(out @ wproj + bproj, ws, ws, h, w)

    got = fused_overlap_attention(q, k, v, wproj, bproj, bias, ws, ov, nh,
                                  interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_hat_window_attention_module_consistency():
    """The module's two paths share params; check the XLA path after the
    raw-param restructure still matches a hand-built reference."""
    c, nh, window = 30, 6, 4
    m = WindowAttention(c, window, nh)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, c)) * 0.3
    params = m.init(jax.random.PRNGKey(1), x)
    got = m.apply(params, x)
    p = params["params"]
    n = window * window
    rpi = W.relative_position_index(window, window).reshape(-1)
    bias = jnp.transpose(
        p["relative_position_bias_table"][rpi].reshape(n, n, nh), (2, 0, 1))
    want = _xla_reference(
        x, dict(wqkv=p["qkv_kernel"], bqkv=p["qkv_bias"],
                wproj=p["proj_kernel"], bproj=p["proj_bias"], bias=bias),
        window, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_fused_hab_block_matches_module():
    """fused_hab_block must be a drop-in for the whole HAB-minus-CAB chain:
    compare against the module's XLA path (use_pallas=False) for both the
    plain and the shifted block."""
    from freqfusion_tpu.models.hat import CAB, HAB, apply_ln
    from freqfusion_tpu.ops.pallas.wattn import fused_hab_block

    c, nh, window = 24, 4, 8
    for shift, seed in ((0, 0), (window // 2, 7)):
        m = HAB(dim=c, num_heads=nh, window=window, shift=shift, compress=3,
                squeeze=6, conv_scale=0.01, mlp_ratio=2.0, use_pallas=False)
        x = jax.random.normal(jax.random.PRNGKey(seed), (2, 16, 24, c)) * 0.3
        variables = m.init(jax.random.PRNGKey(seed + 1), x)
        want = m.apply(variables, x)

        p = variables["params"]
        ln1w, ln1b = p["norm1"]["scale"], p["norm1"]["bias"]
        x_ln = apply_ln(x, ln1w, ln1b)
        conv_x = CAB(c, 3, 6).apply({"params": p["conv_block"]}, x_ln)
        n = window * window
        rpi = W.relative_position_index(window, window).reshape(-1)
        bias = jnp.transpose(
            p["attn"]["relative_position_bias_table"][rpi].reshape(n, n, nh),
            (2, 0, 1))
        mask = (W.shift_attn_mask(16, 24, window, window, shift, shift)
                if shift else None)
        xs, cxs = x, conv_x
        if shift:
            xs = jnp.roll(xs, (-shift, -shift), axis=(1, 2))
            cxs = jnp.roll(cxs, (-shift, -shift), axis=(1, 2))
        got = fused_hab_block(
            xs, cxs, ln1w, ln1b, p["norm2"]["scale"], p["norm2"]["bias"],
            p["attn"]["qkv_kernel"], p["attn"]["qkv_bias"],
            p["attn"]["proj_kernel"], p["attn"]["proj_bias"],
            p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
            p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
            bias, mask, (window, window), nh, 0.01, interpret=True)
        if shift:
            got = jnp.roll(got, (shift, shift), axis=(1, 2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-4)


def test_fused_hab_block_in_shift_folds_the_x_roll():
    """in_shift=window//2: x passes UNROLLED and the kernel assembles each
    rolled window from 4 wrap-around quadrant refs — must equal the
    roll-then-call form exactly (r5 roll folding)."""
    from freqfusion_tpu.models.hat import CAB, HAB, apply_ln
    from freqfusion_tpu.ops.pallas.wattn import fused_hab_block

    c, nh, window = 24, 4, 8
    shift, seed = window // 2, 7
    m = HAB(dim=c, num_heads=nh, window=window, shift=shift, compress=3,
            squeeze=6, conv_scale=0.01, mlp_ratio=2.0, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, 16, 24, c)) * 0.3
    variables = m.init(jax.random.PRNGKey(seed + 1), x)
    want = m.apply(variables, x)

    p = variables["params"]
    ln1w, ln1b = p["norm1"]["scale"], p["norm1"]["bias"]
    conv_x = CAB(c, 3, 6).apply({"params": p["conv_block"]},
                                apply_ln(x, ln1w, ln1b))
    n = window * window
    rpi = W.relative_position_index(window, window).reshape(-1)
    bias = jnp.transpose(
        p["attn"]["relative_position_bias_table"][rpi].reshape(n, n, nh),
        (2, 0, 1))
    mask = W.shift_attn_mask(16, 24, window, window, shift, shift)
    cxs = jnp.roll(conv_x, (-shift, -shift), axis=(1, 2))
    got = fused_hab_block(
        x, cxs, ln1w, ln1b, p["norm2"]["scale"], p["norm2"]["bias"],
        p["attn"]["qkv_kernel"], p["attn"]["qkv_bias"],
        p["attn"]["proj_kernel"], p["attn"]["proj_bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
        bias, mask, (window, window), nh, 0.01, interpret=True,
        in_shift=shift)
    got = jnp.roll(got, (shift, shift), axis=(1, 2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_fused_residual_ln_mlp_matches_xla():
    from freqfusion_tpu.models.hat import apply_ln, gelu
    from freqfusion_tpu.ops.pallas.wattn import fused_residual_ln_mlp

    b, h, w, c, hidden = 2, 12, 20, 36, 72
    keys = jax.random.split(jax.random.PRNGKey(2), 8)
    a = jax.random.normal(keys[0], (b, h, w, c)) * 0.3
    s = jax.random.normal(keys[1], (b, h, w, c)) * 0.3
    lnw = 1.0 + jax.random.normal(keys[2], (c,)) * 0.1
    lnb = jax.random.normal(keys[3], (c,)) * 0.1
    w1 = jax.random.normal(keys[4], (c, hidden)) * 0.05
    b1 = jax.random.normal(keys[5], (hidden,)) * 0.02
    w2 = jax.random.normal(keys[6], (hidden, c)) * 0.05
    b2 = jax.random.normal(keys[7], (c,)) * 0.02

    y = a + s
    want = y + gelu(apply_ln(y, lnw, lnb) @ w1 + b1) @ w2 + b2
    got = fused_residual_ln_mlp(a, s, lnw, lnb, w1, b1, w2, b2,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_fused_sgfn_tail_matches_module():
    """fused_sgfn_tail vs the DATB tail XLA chain (residual + LN2 + SGFN)."""
    from freqfusion_tpu.models.dat import SGFN
    from freqfusion_tpu.models.hat import apply_ln
    from freqfusion_tpu.ops.pallas.sgfn import fused_sgfn_tail

    b, h, w, c = 2, 16, 24, 20
    hidden = 40
    keys = jax.random.split(jax.random.PRNGKey(4), 4)
    a = jax.random.normal(keys[0], (b, h, w, c)) * 0.3
    s = jax.random.normal(keys[1], (b, h, w, c)) * 0.3
    lnw = 1.0 + jax.random.normal(keys[2], (c,)) * 0.1
    lnb = jax.random.normal(keys[3], (c,)) * 0.1

    m = SGFN(c, hidden)
    variables = m.init(jax.random.PRNGKey(5), a)
    p = jax.tree_util.tree_map(
        lambda t: t + 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(str(t.shape)) % 997), t.shape),
        variables["params"])

    y = a + s
    want = y + m.apply({"params": p}, apply_ln(y, lnw, lnb))
    got = fused_sgfn_tail(
        a, s, lnw, lnb,
        p["fc1"]["kernel"], p["fc1"]["bias"],
        p["sg_norm"]["scale"], p["sg_norm"]["bias"],
        p["sg_conv"]["kernel"], p["sg_conv"]["bias"],
        p["fc2"]["kernel"], p["fc2"]["bias"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_fused_hab_block_with_ca_scale():
    """cab_scale applies the CA gate to the conv branch inside the kernel."""
    from freqfusion_tpu.models.hat import CAB, HAB, apply_ln
    from freqfusion_tpu.ops.pallas.wattn import fused_hab_block

    c, nh, window = 24, 4, 8
    m = HAB(dim=c, num_heads=nh, window=window, shift=0, compress=3,
            squeeze=6, conv_scale=0.01, mlp_ratio=2.0, use_pallas=False)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 24, c)) * 0.3
    variables = m.init(jax.random.PRNGKey(10), x)
    want = m.apply(variables, x)

    p = variables["params"]
    ln1w, ln1b = p["norm1"]["scale"], p["norm1"]["bias"]
    x_ln = apply_ln(x, ln1w, ln1b)
    cb = p["conv_block"]

    # pre-CA CAB tensor + CA scale, computed the XLA way
    def conv(t, w_, b_):
        return jax.lax.conv_general_dilated(
            t, w_, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_

    from freqfusion_tpu.models.hat import gelu
    pre = conv(gelu(conv(x_ln, cb["conv1"]["kernel"], cb["conv1"]["bias"])),
               cb["conv2"]["kernel"], cb["conv2"]["bias"])
    pooled = jnp.mean(pre, axis=(1, 2), keepdims=True)
    y = jax.nn.relu(jnp.einsum("bhwc,cd->bhwd", pooled,
                               cb["ca"]["fc1"]["kernel"].reshape(c, -1))
                    + cb["ca"]["fc1"]["bias"])
    scale = jax.nn.sigmoid(jnp.einsum(
        "bhwc,cd->bhwd", y, cb["ca"]["fc2"]["kernel"].reshape(-1, c))
        + cb["ca"]["fc2"]["bias"])

    n = window * window
    rpi = W.relative_position_index(window, window).reshape(-1)
    bias = jnp.transpose(
        p["attn"]["relative_position_bias_table"][rpi].reshape(n, n, nh),
        (2, 0, 1))
    got = fused_hab_block(
        x, pre, ln1w, ln1b, p["norm2"]["scale"], p["norm2"]["bias"],
        p["attn"]["qkv_kernel"], p["attn"]["qkv_bias"],
        p["attn"]["proj_kernel"], p["attn"]["proj_bias"],
        p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
        p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
        bias, None, (window, window), nh, 0.01, cab_scale=scale,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)

"""MambaIR expert: parallel-scan correctness + model invariants.

The reference MambaIR requires mamba_ssm CUDA kernels and cannot run in this
environment; correctness is established against a sequential-scan oracle of
the same recurrence (the defining property of the selective scan)."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.mambair import MambaIR, SS2D, selective_scan


def _scan_oracle(x, delta, a, b, c, d):
    """Sequential reference of h_t = exp(Δa)h + ΔBx; y = Ch + Dx."""
    bsz, l, dim = x.shape
    n = a.shape[1]
    h = np.zeros((bsz, dim, n), np.float64)
    ys = []
    for t in range(l):
        da = np.exp(np.asarray(delta[:, t])[..., None] * np.asarray(a))
        dbx = (np.asarray(delta[:, t]) * np.asarray(x[:, t]))[..., None] \
            * np.asarray(b[:, t])[:, None, :]
        h = da * h + dbx
        y = np.einsum("bdn,bn->bd", h, np.asarray(c[:, t]))
        ys.append(y + np.asarray(x[:, t]) * np.asarray(d))
    return np.stack(ys, axis=1)


def test_associative_scan_matches_sequential():
    rng = np.random.default_rng(0)
    bsz, l, dim, n = 2, 17, 6, 4
    x = jnp.asarray(rng.standard_normal((bsz, l, dim)).astype(np.float32))
    delta = jnp.asarray(rng.uniform(0.001, 0.2, (bsz, l, dim)).astype(np.float32))
    a = jnp.asarray(-rng.uniform(0.5, 2.0, (dim, n)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((bsz, l, n)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((bsz, l, n)).astype(np.float32))
    d = jnp.asarray(rng.standard_normal(dim).astype(np.float32))
    got = np.asarray(selective_scan(x, delta, a, b, c, d))
    want = _scan_oracle(x, delta, a, b, c, d)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_ss2d_shapes():
    model = SS2D(d_model=16, d_state=4)
    x = jnp.zeros((1, 8, 8, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == x.shape


def test_mambair_model_end_to_end():
    model = MambaIR(embed_dim=16, depths=(1,), d_state=4)
    x = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 8, 8, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    sr, deep = model.apply(params, x)
    assert sr.shape == (1, 32, 32, 3)
    assert deep.shape == (1, 8, 8, 16)
    assert np.isfinite(np.asarray(sr)).all()


def test_mambair_converter_round_trip():
    """mambair_key_fn (VERDICT r3 #8): every flax leaf maps to a reference
    torch key, orientation round-trips, and the filled tree runs. The key
    layout is verified against mambair_arch.py source (the module itself
    cannot instantiate here — its mamba_ssm CUDA import at :11 is
    unguarded), so the checkpoint is synthesized from the documented
    names, exactly like the nafnet extractor regression test."""
    from freqfusion_tpu.utils import convert as cv

    model = MambaIR(embed_dim=16, depths=(2, 2), d_state=4)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x))

    rng = np.random.default_rng(1)
    sd, probes = {}, []
    from flax import traverse_util
    for path, leaf in traverse_util.flatten_dict(shapes["params"]).items():
        key = cv.mambair_key_fn(path)
        val = (rng.normal(size=leaf.shape) * 0.05).astype(np.float32)
        lname = path[-1]
        if lname == "kernel" and val.ndim == 4:
            sd[key] = np.transpose(val, (3, 2, 0, 1))  # HWIO → OIHW
        elif lname == "kernel" and val.ndim == 2:
            sd[key] = val.T
        else:
            sd[key] = val
        probes.append((path, val))

    # spot-check documented names (mambair_arch.py:238-279, 404-410, 766)
    assert "layers.0.residual_group.blocks.1.self_attention.in_proj.weight" in sd
    assert "layers.1.residual_group.blocks.0.conv_blk.cab.3.attention.1.weight" in sd
    assert "layers.0.residual_group.blocks.0.skip_scale2" in sd
    assert "patch_embed.norm.weight" in sd
    assert "upsample.2.weight" in sd and "conv_before_upsample.0.weight" in sd
    assert "layers.0.residual_group.blocks.0.self_attention.x_proj_weight" in sd

    params, report = cv.fill_params(shapes["params"], sd, cv.mambair_key_fn,
                                    strict=True)
    assert not report["missing"] and not report["unused"]
    for path, want in probes:
        got = params
        for p in path:
            got = got[p]
        np.testing.assert_allclose(np.asarray(got), want, err_msg=str(path))

    sr, deep = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params)},
        jnp.asarray(np.random.default_rng(2).uniform(
            size=(1, 8, 8, 3)).astype(np.float32)))
    assert sr.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(sr)).all()

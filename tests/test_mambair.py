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

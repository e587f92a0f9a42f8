"""Frequency stack: invariants (perfect reconstruction) + torch parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.frequency import (
    MultiDomainFrequency, FrequencyDecomposition)
from freqfusion_tpu.ops import dct as dct_ops
from freqfusion_tpu.utils.convert import fill_params, filter_unused, freq_key_fn

from ref_utils import requires_reference, ref_import, to_nchw, to_nhwc, torch_state_dict_numpy


def _img(shape=(2, 32, 32, 3), seed=0):
    return np.random.default_rng(seed).uniform(size=shape).astype(np.float32)


def test_dct_perfect_reconstruction():
    """low+mid+high must reconstruct the input (DCT bands are orthogonal) —
    the reference's core invariant (frequency_decomposition.py:619-687)."""
    x = jnp.asarray(_img((1, 24, 40, 3)))
    fd = FrequencyDecomposition()
    low, mid, high = fd(x)
    np.testing.assert_allclose(np.asarray(low + mid + high), np.asarray(x),
                               atol=1e-3)


def test_adaptive_masks_reconstruct_and_differ():
    x = jnp.asarray(_img((2, 16, 16, 3), seed=1))
    fd = FrequencyDecomposition()
    low, mid, high = fd.adaptive(x, jnp.array([0.2, 0.35]), jnp.array([0.7, 0.8]))
    np.testing.assert_allclose(np.asarray(low + mid + high), np.asarray(x), atol=1e-3)
    # different splits per-sample must give different band energy
    e0 = float(jnp.sum(low[0] ** 2))
    e1 = float(jnp.sum(low[1] ** 2))
    assert abs(e0 - e1) > 1e-6


def test_zigzag_matches_reference_algorithm():
    z = dct_ops.zigzag_indices(8)
    assert z[0, 0] == 0 and z[0, 1] == 1 and z[1, 0] == 2
    assert z[7, 7] == 63
    assert sorted(z.reshape(-1).tolist()) == list(range(64))


def test_multidomain_shapes_and_grad():
    model = MultiDomainFrequency()
    x = jnp.asarray(_img((1, 16, 16, 3)))
    params = model.init(jax.random.PRNGKey(0), x)
    fused, raw = model.apply(params, x, return_raw=True)
    assert len(fused) == 3 and len(raw) == 9
    for b in list(fused) + list(raw):
        assert b.shape == x.shape

    def loss(p):
        f, _ = model.apply(p, x)
        return sum(jnp.mean(b) for b in f)

    g = jax.grad(loss)(params)
    nonzero = sum(float(jnp.abs(l).max()) > 0 for l in jax.tree_util.tree_leaves(g))
    assert nonzero > 10


@requires_reference
def test_multidomain_parity():
    import torch
    ref_mod = ref_import("src.models.multi_domain_frequency")
    torch.manual_seed(0)
    ref = ref_mod.MultiDomainFrequencyDecomposition(
        block_size=8, in_channels=3, fft_mask_size=64, enable_fusion=True).eval()
    with torch.no_grad():  # randomize learnables so parity is meaningful
        for p in ref.parameters():
            p.add_(torch.randn_like(p) * 0.1)

    model = MultiDomainFrequency()
    x = _img((2, 24, 24, 3), seed=2)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = torch_state_dict_numpy(ref)
    new_params, report = fill_params(params["params"], sd, freq_key_fn)
    assert not report["missing"], report["missing"][:5]
    unused = [k for k in filter_unused(report["unused"])
              if "dct" not in k or "residual" in k]
    # dct basis/mask buffers are rebuilt in numpy; everything else must load
    unused = [k for k in unused if not any(
        t in k for t in ("dct_basis", "low_mask", "mid_mask", "high_mask",
                         "lo_row", "hi_row", "lo_col", "hi_col"))]
    assert not unused, unused[:8]

    fused, raw = model.apply({"params": new_params}, jnp.asarray(x), return_raw=True)
    with torch.no_grad():
        ref_fused, ref_raw = ref(to_nchw(x), return_raw_bands=True)

    for ours, theirs in zip(raw, ref_raw):
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   atol=2e-4, rtol=1e-3)
    for ours, theirs in zip(fused, ref_fused):
        np.testing.assert_allclose(np.asarray(ours), to_nhwc(theirs),
                                   atol=2e-4, rtol=1e-3)


@requires_reference
def test_baseline_decomposition_parity():
    import torch
    ref_mod = ref_import("src.data.frequency_decomposition")
    ref = ref_mod.FrequencyDecomposition(block_size=8).eval()
    x = _img((1, 20, 28, 3), seed=3)
    fd = FrequencyDecomposition()
    ours = fd(jnp.asarray(x))
    with torch.no_grad():
        theirs = ref.decompose(to_nchw(x))
    for o, t in zip(ours, theirs):
        np.testing.assert_allclose(np.asarray(o), to_nhwc(t), atol=2e-5, rtol=1e-4)

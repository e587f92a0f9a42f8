"""TSD-SR refinement + V2 fusion head: shape/identity/gradient invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.fusion_v2 import (
    AdaptiveFrequencyDecompositionV2, FusionHeadV2)
from freqfusion_tpu.models.tsdsr import (
    CompleteSRPipeline, DiT, TSDSRDiT, TSDSRInference, sinusoidal_time_embed)


def test_dit_shapes_and_zero_init():
    model = DiT(hidden=64, depth=2, heads=4, patch=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 8, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([500.0, 10.0]))
    out = model.apply(params, x, jnp.array([500.0, 10.0]))
    assert out.shape == x.shape
    # zero-init final layer + zero-init adaLN mod → exact zero noise at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_tsdsr_one_step_residual():
    model = TSDSRDiT(hidden=64, depth=1, heads=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 8, 8, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    # with zero-init DiT output, refinement is identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_time_embedding_distinct():
    e = sinusoidal_time_embed(jnp.array([1.0, 500.0]), 64)
    assert e.shape == (2, 64)
    assert float(jnp.abs(e[0] - e[1]).max()) > 0.1


def test_inference_identity_passthrough_without_weights():
    """Mirrors the reference's missing-weights passthrough
    (tsdsr_wrapper.py:322-333)."""
    pipe = CompleteSRPipeline()
    infer = TSDSRInference()
    sr = jnp.asarray(np.random.default_rng(2).uniform(
        size=(1, 16, 16, 3)).astype(np.float32))
    assert not infer.available
    np.testing.assert_allclose(np.asarray(infer.refine(sr)), np.asarray(sr))
    np.testing.assert_allclose(np.asarray(pipe(sr)), np.asarray(sr))


def test_v2_adaptive_decomposition_reconstructs():
    model = AdaptiveFrequencyDecompositionV2()
    x = jnp.asarray(np.random.default_rng(3).uniform(
        size=(2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    low, mid, high, (lt, ht) = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(low + mid + high), np.asarray(x),
                               atol=1e-3)
    assert np.all((0.15 <= np.asarray(lt)) & (np.asarray(lt) <= 0.40))
    assert np.all((0.60 <= np.asarray(ht)) & (np.asarray(ht) <= 0.85))


def test_v2_fusion_head_end_to_end():
    rng = np.random.default_rng(4)
    lr = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    outs = {n: jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
            for n in ("hat", "dat", "nafnet")}
    model = FusionHeadV2()
    variables = model.init(jax.random.PRNGKey(0), lr, outs)
    sr = model.apply(variables, lr, outs)
    assert sr.shape == (1, 32, 32, 3)
    assert float(sr.min()) >= 0.0 and float(sr.max()) <= 1.0
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(variables["params"]))
    assert n_params < 0.5e6  # compact variant (~167K in the reference)

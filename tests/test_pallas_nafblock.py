"""Fused NAFBlock kernels: interpret-mode exactness vs the XLA module path
(same params — drop-in replacement contract)."""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.models.nafnet import NAFBlock
from freqfusion_tpu.ops.pallas.nafblock import fused_naf_block


def _run(c, h, w, b=2, seed=0):
    m = NAFBlock(c)
    x = jax.random.normal(jax.random.PRNGKey(seed), (b, h, w, c)) * 0.5
    variables = m.init(jax.random.PRNGKey(seed + 1), x)
    # β/γ init to zero → the block is identity; randomize for a real test
    p = jax.tree_util.tree_map(
        lambda a: a + 0.1 * jax.random.normal(
            jax.random.PRNGKey(hash(str(a.shape)) % 1000), a.shape),
        variables["params"])
    want = m.apply({"params": p}, x)

    params = dict(
        ln1_w=p["norm1"]["weight"], ln1_b=p["norm1"]["bias"],
        w1=p["conv1"]["kernel"], b1=p["conv1"]["bias"],
        wdw=p["conv2"]["kernel"], bdw=p["conv2"]["bias"],
        w3=p["conv3"]["kernel"], b3=p["conv3"]["bias"], beta=p["beta"],
        ln2_w=p["norm2"]["weight"], ln2_b=p["norm2"]["bias"],
        w4=p["conv4"]["kernel"], b4=p["conv4"]["bias"],
        w5=p["conv5"]["kernel"], b5=p["conv5"]["bias"], gamma=p["gamma"])
    got = fused_naf_block(x, params, p["sca"]["kernel"], p["sca"]["bias"],
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-5, rtol=1e-4)


def test_fused_nafblock_matches_module():
    _run(c=16, h=24, w=32)


def test_fused_nafblock_single_strip_and_odd_height():
    # h small enough that one strip covers it (boundary masking both ends)
    _run(c=8, h=6, w=16, b=1, seed=3)

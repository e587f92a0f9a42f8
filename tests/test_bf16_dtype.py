"""bf16 dtype stability through the scanned block stacks.

The production bench default is bf16 params+activations (bench.py). The
`lax.scan` stacks over identical HAT/DAT blocks require a dtype-stable
carry: any branch that accumulates in f32 (preferred_element_type) and
forgets to cast back breaks tracing with a carry-dtype mismatch — exactly
the bug found in DAT's XLA window-attention path (dat.py, r3). These tests
pin every scanned stack + the fusion head end-to-end at tiny dims under
bf16, on the XLA (non-Pallas) paths that CPU executes.

Reference anatomy: /root/reference/src/models/dat/dat_arch.py:409-424,
/root/reference/src/models/hat/hat_arch.py:129-196.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from freqfusion_tpu.models.experts import FreqFusionSR
from freqfusion_tpu.models.fusion import FusionConfig
from freqfusion_tpu.models.hat import HAT
from freqfusion_tpu.models.dat import DAT


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)


def _run_bf16(model, x):
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(_bf16(v), x.astype(jnp.bfloat16))
    return out


@pytest.mark.parametrize("depths", [(2,), (2, 2)])
def test_hat_scan_stack_bf16(depths):
    # depth 2 triggers the HAB-pair scan; uniform (2, 2) also the RHAG scan
    model = HAT(embed_dim=24, depths=depths, num_heads=(2,) * len(depths),
                window=4, squeeze=6)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 16, 16, 3)),
                    jnp.float32)
    sr, feat = _run_bf16(model, x)
    assert sr.dtype == jnp.bfloat16
    assert feat.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(sr, np.float32)).all()


def test_dat_scan_stack_bf16():
    # uniform even group count triggers the RG-pair scan (dat.py)
    model = DAT(embed_dim=32, depths=(2, 2), num_heads=(2, 2),
                split_size=(2, 4), expansion=2.0)
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 16, 16, 3)),
                    jnp.float32)
    sr, feat = _run_bf16(model, x)
    assert sr.dtype == jnp.bfloat16
    assert feat.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(sr, np.float32)).all()


@pytest.mark.slow
def test_full_model_bf16_jit():
    # the bench protocol end-to-end: bf16 params + input, scanned stacks on,
    # fusion head included; output cast to f32 exactly like bench._fwd
    model = FreqFusionSR(
        FusionConfig(fusion_dim=16, num_heads=2, refine_depth=2,
                     refine_channels=8),
        hat_kwargs=dict(embed_dim=24, depths=(2, 2), num_heads=(2, 2),
                        window=4, squeeze=6),
        dat_kwargs=dict(embed_dim=32, depths=(2, 2), num_heads=(2, 2),
                        split_size=(2, 4), expansion=2.0),
        nafnet_kwargs=dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                           dec_blk_nums=(1, 1)))
    x = jnp.asarray(np.random.default_rng(2).uniform(size=(1, 16, 16, 3)),
                    jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    vb = _bf16(v)

    @jax.jit
    def fwd(v_, t):
        return model.apply(v_, t.astype(jnp.bfloat16)).astype(jnp.float32)

    sr = fwd(vb, x)
    assert sr.dtype == jnp.float32
    assert sr.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(sr)).all()

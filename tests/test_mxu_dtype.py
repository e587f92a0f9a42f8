"""bf16-operand MXU mode (ops/pallas/wattn._mxu_dtype).

On TPU the kernels default to bf16 matmul *operands* with f32 accumulation —
the same truncation XLA's DEFAULT precision applies to f32 matmuls (so the
kernels sit in the identical precision class as the XLA chain they replace),
and ~3x faster than Mosaic's multi-pass f32 lowering (PERF.md round 3).

Interpret mode keeps true-f32 operands so the drop-in parity suites stay
exact; these tests force `mxu_dtype=bfloat16` under interpret to cover the
bf16 code path and bound its error against the f32 kernel output.
"""

import numpy as np
import jax
import jax.numpy as jnp

from freqfusion_tpu.ops import windows as W
from freqfusion_tpu.ops.pallas import wattn
from freqfusion_tpu.ops.pallas.sgfn import fused_sgfn_tail
from freqfusion_tpu.ops.pallas.bandmha import fused_band_mha


def _rel_err(got, want):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    return np.abs(got - want).max() / (np.abs(want).max() + 1e-12)


def test_mxu_dtype_rule():
    # interpret keeps the input dtype; TPU-compile path defaults to bf16
    assert wattn._mxu_dtype(jnp.float32, interpret=True) == jnp.float32
    assert wattn._mxu_dtype(jnp.float32, interpret=False) == jnp.bfloat16
    assert wattn._mxu_dtype(jnp.bfloat16, interpret=True) == jnp.bfloat16
    # explicit override wins
    assert wattn._mxu_dtype(jnp.float32, True, jnp.bfloat16) == jnp.bfloat16


def test_wattn_bf16_operands_close():
    c, nh, ws = 32, 4, 8
    k = iter(jax.random.split(jax.random.PRNGKey(0), 8))
    x = jax.random.normal(next(k), (1, 16, 16, c)) * 0.3
    wqkv = jax.random.normal(next(k), (c, 3 * c)) * 0.05
    bqkv = jax.random.normal(next(k), (3 * c,)) * 0.02
    wproj = jax.random.normal(next(k), (c, c)) * 0.05
    bproj = jax.random.normal(next(k), (c,)) * 0.02
    bias = jax.random.normal(next(k), (nh, ws * ws, ws * ws)) * 0.1

    def run(mdt):
        return wattn.fused_window_attention(
            x, wqkv, bqkv, wproj, bproj, bias, None, (ws, ws), nh,
            interpret=True, mxu_dtype=mdt)

    f32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    assert _rel_err(bf16, f32) < 3e-2
    assert not np.array_equal(np.asarray(bf16), np.asarray(f32))


def test_sgfn_bf16_operands_close():
    c, hid = 32, 64
    k = iter(jax.random.split(jax.random.PRNGKey(1), 10))
    a = jax.random.normal(next(k), (1, 8, 16, c)) * 0.3
    sc = jax.random.normal(next(k), (1, 8, 16, c)) * 0.3
    ln_w = jnp.ones((c,)); ln_b = jnp.zeros((c,))
    w1 = jax.random.normal(next(k), (c, hid)) * 0.05
    b1 = jnp.zeros((hid,))
    sg_w = jnp.ones((hid // 2,)); sg_b = jnp.zeros((hid // 2,))
    wdw = jax.random.normal(next(k), (3, 3, 1, hid // 2)) * 0.1
    bdw = jnp.zeros((hid // 2,))
    w2 = jax.random.normal(next(k), (hid // 2, c)) * 0.05
    b2 = jnp.zeros((c,))

    def run(mdt):
        return fused_sgfn_tail(a, sc, ln_w, ln_b, w1, b1, sg_w, sg_b,
                               wdw, bdw, w2, b2, interpret=True,
                               mxu_dtype=mdt)

    assert _rel_err(run(jnp.bfloat16), run(jnp.float32)) < 3e-2


def test_bandmha_bf16_operands_close():
    t, d, nh = 3, 16, 4
    k = iter(jax.random.split(jax.random.PRNGKey(2), 6))
    x = jax.random.normal(next(k), (1, 4, 8, t, d)) * 0.3
    wqkv = jax.random.normal(next(k), (d, 3 * d)) * 0.1
    bqkv = jnp.zeros((3 * d,))
    wproj = jax.random.normal(next(k), (d, d)) * 0.1
    bproj = jnp.zeros((d,))
    ln_w = jnp.ones((d,)); ln_b = jnp.zeros((d,))

    def run(mdt):
        return fused_band_mha(x, wqkv, bqkv, wproj, bproj, ln_w, ln_b,
                              nh, interpret=True, mxu_dtype=mdt)

    assert _rel_err(run(jnp.bfloat16), run(jnp.float32)) < 3e-2

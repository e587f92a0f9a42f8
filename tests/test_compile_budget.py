"""Compile-cost regression guard (VERDICT r2 #5).

The driver benches in a FRESH process: fresh-process compile time is a
shipping constraint, not a nicety (round 2's 45-60 min compile made the
driver bench time out — BENCH_r02 rc=124). The fix was lax.scan over
identical blocks (HAT 72 HAB sites → 2 traced bodies, DAT 36 DATB → 12).

This test pins the result with a deterministic proxy: the total jaxpr
equation count of the full-model trace. Un-scanning a stack (or adding a
per-block specialization) multiplies the count and fails here long before
anyone notices a 10× compile-time regression on TPU. Wall-clock budgets
for the TPU kernel compiles live in PERF.md (they need real Mosaic).
"""

import jax
import jax.numpy as jnp

from freqfusion_tpu.models.experts import FreqFusionSR
from freqfusion_tpu.models.fusion import FusionConfig


def _total_eqns(jaxpr) -> int:
    n = 0
    for e in jaxpr.eqns:
        n += 1
        for sub in e.params.values():
            if hasattr(sub, "jaxpr"):
                n += _total_eqns(sub.jaxpr)
    return n


def test_full_model_trace_stays_scanned():
    model = FreqFusionSR(FusionConfig())
    x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    jaxpr = jax.make_jaxpr(lambda p, a: model.apply(p, a))(params, x)
    total = _total_eqns(jaxpr.jaxpr)
    # measured 11,886 with the scanned HAT/DAT stacks (2026-08, r3); the
    # unrolled layout traces >3× larger. Headroom for organic growth only.
    assert total < 18_000, (
        f"full-model trace has {total} equations (budget 18k) — did a "
        "block stack get unrolled? (FREQFUSION_SCAN / models.hat.RHAG / "
        "models.dat._RGPair)")

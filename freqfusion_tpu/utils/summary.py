"""Model summary: parameter counts + FLOPs (reference utils/model_summary.py).

The reference counts FLOPs/activations by monkey-patching forward hooks onto
torch modules (model_summary.py:11-75). The TPU-native equivalent asks the
compiler: `jax.jit(fn).lower(...).compile().cost_analysis()` returns XLA's
own flops/bytes estimate for the exact compiled program — no hooks, and it
reflects fusion reality rather than per-module arithmetic.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))


def params_breakdown(params, depth: int = 1) -> Dict[str, int]:
    """Parameter count per top-level (or deeper) module path."""
    from flax import traverse_util

    out: Dict[str, int] = {}
    for path, leaf in traverse_util.flatten_dict(params).items():
        key = "/".join(path[:depth])
        out[key] = out.get(key, 0) + int(np.prod(leaf.shape))
    return dict(sorted(out.items(), key=lambda kv: -kv[1]))


def xla_cost(fn: Callable, *example_args) -> Dict[str, float]:
    """Compile `fn` and return XLA's cost analysis (flops, bytes accessed)."""
    compiled = jax.jit(fn).lower(*example_args).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-computation list
        costs = costs[0]
    return {k: float(v) for k, v in costs.items()
            if k in ("flops", "bytes accessed", "utilization operand 0")}


def summarize(fn: Callable, params, *example_args) -> Tuple[str, Dict]:
    n = count_params(params)
    cost = xla_cost(fn, *example_args)
    lines = [f"params: {n/1e6:.2f}M"]
    if "flops" in cost:
        lines.append(f"flops/step: {cost['flops']/1e9:.2f} GFLOP")
    if "bytes accessed" in cost:
        lines.append(f"bytes/step: {cost['bytes accessed']/1e6:.1f} MB")
    return "\n".join(lines), {"params": n, **cost}

"""LR schedules + multi-stage loss scheduling.

Reproduces the reference recipe (train_config.yaml:89-125, train.py:121-127,
src/training/multi_stage_scheduler.py): linear warmup for the first
`warmup_epochs`, then CosineAnnealingWarmRestarts (T0, T_mult), and an
epoch→loss-stage lookup with contiguity validation.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import optax


def cosine_warm_restarts(base_lr: float, t0_steps: int, t_mult: int = 2,
                         num_cycles: int = 6, eta_min: float = 0.0):
    """CosineAnnealingWarmRestarts as an optax schedule (SGDR)."""
    schedules, boundaries = [], []
    start, period = 0, t0_steps
    for _ in range(num_cycles):
        schedules.append(
            optax.cosine_decay_schedule(base_lr, period, alpha=eta_min / max(base_lr, 1e-12)))
        start += period
        boundaries.append(start)
        period *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])


def warmup_then_cosine_restarts(base_lr: float, warmup_steps: int,
                                t0_steps: int, t_mult: int = 2,
                                num_cycles: int = 6):
    """Linear warmup (train.py:121-127) then SGDR."""
    warmup = optax.linear_schedule(base_lr * 1e-2, base_lr, warmup_steps)
    sgdr = cosine_warm_restarts(base_lr, t0_steps, t_mult, num_cycles)
    return optax.join_schedules([warmup, sgdr], [warmup_steps])


class MultiStageLossScheduler:
    """Epoch → loss-weight-stage lookup (multi_stage_scheduler.py:23-123).

    `stages`: list of {"epochs": [start, end), "stage_name": str,
    "weights": {...}} — validated for contiguity from epoch 0.
    """

    def __init__(self, stages: Sequence[Dict]):
        if not stages:
            raise ValueError("at least one loss stage required")
        expected = 0
        for st in stages:
            lo, hi = st["epochs"]
            if lo != expected or hi <= lo:
                raise ValueError(
                    f"stages must be contiguous from 0; got [{lo},{hi}) "
                    f"expected start {expected}")
            expected = hi
        self.stages: List[Dict] = list(stages)
        self._last_idx = None

    def stage_index(self, epoch: int) -> int:
        for i, st in enumerate(self.stages):
            if st["epochs"][0] <= epoch < st["epochs"][1]:
                return i
        return len(self.stages) - 1  # clamp past the end

    def weights_for_epoch(self, epoch: int) -> Dict[str, float]:
        return dict(self.stages[self.stage_index(epoch)]["weights"])

    def is_transition(self, epoch: int) -> bool:
        idx = self.stage_index(epoch)
        changed = idx != self._last_idx
        self._last_idx = idx
        return changed

    def describe(self, epoch: int) -> str:
        st = self.stages[self.stage_index(epoch)]
        return f"stage {self.stage_index(epoch)} ({st.get('stage_name', '?')}): " \
               f"weights {st['weights']}"

"""Exponential moving average of params (reference EMAModel,
checkpoint_manager.py:343-427): shadow pytree, update/apply/restore,
serializable state."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ema_init(params):
    # jnp.asarray would ALIAS the param buffers — the donating ema_update
    # below would then invalidate the live params on its first call
    return jax.tree_util.tree_map(lambda p: jnp.array(p, copy=True), params)


# one fused program instead of 3 eager ops per leaf (each eager op is a
# separate dispatch on the remote TPU backend — PERF.md: ~29 ms each); the
# old shadow is dead after the update, so its buffers are donated
@functools.partial(jax.jit, donate_argnums=0)
def ema_update(shadow, params, decay: float = 0.9995):
    return jax.tree_util.tree_map(
        lambda s, p: s * decay + p * (1.0 - decay), shadow, params)


class EMA:
    """Stateful convenience wrapper used by the training driver."""

    def __init__(self, params, decay: float = 0.9995):
        self.decay = decay
        self.shadow = ema_init(params)
        self._backup = None

    def update(self, params):
        self.shadow = ema_update(self.shadow, params, self.decay)

    def apply(self, params):
        """Swap shadow in for evaluation; returns EMA params."""
        self._backup = params
        return self.shadow

    def restore(self):
        params, self._backup = self._backup, None
        return params

    def state_dict(self):
        return jax.device_get(self.shadow)

    def load_state_dict(self, state):
        self.shadow = jax.tree_util.tree_map(jnp.asarray, state)

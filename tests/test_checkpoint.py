"""Checkpoint manager round-trips, best-K eviction, resume history."""

import os

import numpy as np
import jax.numpy as jnp

from freqfusion_tpu.training.checkpoint import CheckpointManager


def _payload(x=1.0):
    return {"params": {"w": np.full((3,), x, np.float32)},
            "batch_stats": {}, "opt_state": {"count": np.asarray(0)},
            "ema_state": {"w": np.full((3,), x, np.float32)}}


def test_save_load_roundtrip(tmp_path):
    cm = CheckpointManager(str(tmp_path), max_best=2)
    cm.save_checkpoint(0, _payload(1.5), {"psnr": 30.0}, is_best=True)
    loaded = cm.load()
    assert loaded["epoch"] == 0
    np.testing.assert_allclose(loaded["params"]["w"], 1.5)
    np.testing.assert_allclose(loaded["ema_state"]["w"], 1.5)
    assert loaded["metrics"]["psnr"] == 30.0


def test_best_k_eviction_and_naming(tmp_path):
    cm = CheckpointManager(str(tmp_path), max_best=2)
    for epoch, psnr in [(0, 28.0), (1, 29.0), (2, 30.05), (3, 27.0)]:
        cm.save_checkpoint(epoch, _payload(), {"psnr": psnr},
                           is_best=cm.is_best(psnr))
    names = sorted(f for f in os.listdir(tmp_path) if f.startswith("best_"))
    assert names == ["best_epoch0001_psnr29.00.ckpt",
                     "best_epoch0002_psnr30.05.ckpt"]
    assert cm.get_best_checkpoint().endswith("best_epoch0002_psnr30.05.ckpt")
    assert cm.best_value() == 30.05


def test_resume_restores_best_tracking(tmp_path):
    cm = CheckpointManager(str(tmp_path), max_best=3)
    cm.save_checkpoint(0, _payload(), {"psnr": 29.5}, is_best=True)
    # fresh manager (simulated restart) must remember the historical best
    cm2 = CheckpointManager(str(tmp_path), max_best=3)
    assert cm2.best_value() == 29.5
    assert not cm2.is_best(29.0)
    assert cm2.is_best(29.6)
    assert len(cm2.history) == 1


def test_should_save_cadence(tmp_path):
    cm = CheckpointManager(str(tmp_path), save_every=10)
    assert cm.should_save(9) and cm.should_save(19)
    assert not cm.should_save(5)


def test_atomic_write_no_tmp_left(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    cm.save_checkpoint(0, _payload(), {"psnr": 1.0}, is_best=True)
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]

"""CheckpointManager: save / resume-latest / partial (subtree) restore.

Covers the reference's two checkpoint behaviors (SURVEY.md §5):
`train_engine.py:67-79` save layout + `scripts/train.py:27-44` resume-latest,
plus the Orbax partial-restore fallback a sampler uses to pull only `params`
out of a full trainer checkpoint (ADVICE r2: previously untested).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from nova_pointcloud_tpu.engine.checkpoint import CheckpointManager


def _state(seed=0):
    return {
        "params": {"w": jnp.full((4, 4), float(seed)), "b": jnp.zeros((4,))},
        "opt_state": {"mu": jnp.ones((4, 4)) * 2.0},
        "ema": {"w": jnp.full((4, 4), float(seed) + 0.5),
                "b": jnp.zeros((4,))},
    }


def test_save_restore_latest(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    assert mgr.latest_step() is None and mgr.restore() is None
    for step in (100, 200, 300):
        mgr.save(step, _state(step))
    assert mgr.latest_step() == 300
    # max_to_keep=2 pruned step 100: an explicit restore of it raises
    with pytest.raises(Exception):
        mgr.restore(step=100)
    got = mgr.restore()
    assert got["step"] == 300
    np.testing.assert_allclose(got["state"]["params"]["w"],
                               np.full((4, 4), 300.0))


def test_partial_restore_subtree(tmp_path):
    """A sampler restoring only params (or only EMA) from a trainer ckpt."""
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(50, _state(7))
    template = {"params": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}}
    got = mgr.restore(template=template)
    assert got["step"] == 50
    np.testing.assert_allclose(got["state"]["params"]["w"],
                               np.full((4, 4), 7.0))
    ema_t = {"ema": {"w": jnp.zeros((4, 4)), "b": jnp.zeros((4,))}}
    got = mgr.restore(template=ema_t)
    np.testing.assert_allclose(got["state"]["ema"]["w"],
                               np.full((4, 4), 7.5))


def test_restore_failure_surfaces_original_error(tmp_path):
    """A template that matches NOTHING must raise, not silently fall back."""
    mgr = CheckpointManager(str(tmp_path))
    mgr.save(10, _state(1))
    bad = {"nonexistent_subtree": {"x": jnp.zeros((2,))}}
    with pytest.raises(Exception):
        mgr.restore(template=bad)

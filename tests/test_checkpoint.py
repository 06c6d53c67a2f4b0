"""Checkpoint/resume: exact pytree roundtrips (PRNG keys included),
atomicity, and template validation."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.agents import learners
from gym_soccer_tpu.core import batch
from gym_soccer_tpu.utils import checkpoint

CFG = EnvConfig(width=5, height=4, slip_prob=0.2)


def _equal_trees(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        if checkpoint._is_key(x):
            x, y = jax.random.key_data(x), jax.random.key_data(y)
        if not np.array_equal(np.asarray(x), np.asarray(y)):
            return False
    return True


def test_roundtrip_env_state(tmp_path):
    st = jax.jit(lambda k: batch.init(CFG, k, 32))(jax.random.key(0))
    path = str(tmp_path / "env.npz")
    checkpoint.save_pytree(path, st)
    st2 = checkpoint.load_pytree(path, st)
    assert _equal_trees(st, st2)


def test_roundtrip_and_resume_learner(tmp_path):
    st = jax.jit(lambda k: learners.iql_init(CFG, k, 64))(jax.random.key(1))
    train = jax.jit(lambda s: learners.iql_train(CFG, learners.IQLConfig(),
                                                 s, 20))
    st, _ = train(st)
    path = str(tmp_path / "learn.npz")
    checkpoint.save_pytree(path, st)
    st2 = checkpoint.load_pytree(path, st)
    assert _equal_trees(st, st2)
    # resumed training from the restored state is identical
    a, _ = train(st)
    b, _ = train(st2)
    assert _equal_trees(a._replace(env=a.env._replace(key=None)),
                        b._replace(env=b.env._replace(key=None)))


def test_template_mismatch_rejected(tmp_path):
    st = jax.jit(lambda k: batch.init(CFG, k, 8))(jax.random.key(0))
    path = str(tmp_path / "x.npz")
    checkpoint.save_pytree(path, st)
    with pytest.raises(AssertionError):
        checkpoint.load_pytree(path, (st.rows_a, st.cols_a))


def test_save_is_atomic(tmp_path):
    path = str(tmp_path / "a.npz")
    checkpoint.save_pytree(path, {"x": np.arange(4)})
    assert os.path.exists(path) and not os.path.exists(path + ".tmp")


def test_altq_state_roundtrip(tmp_path):
    """The alternating learner's full state (Q + env lanes + PRNG key)
    checkpoints and resumes exactly, like the IQL/minimax states."""
    from gym_soccer_tpu.agents import learners
    cfg = EnvConfig(5, 4, 0.2)
    lcfg = learners.AltQConfig()
    st = jax.jit(lambda k: learners.altq_init(cfg, k, 32))(jax.random.key(2))
    st, _ = jax.jit(lambda s: learners.altq_train(cfg, lcfg, s, 20))(st)
    path = str(tmp_path / "altq.npz")
    checkpoint.save_pytree(path, st)
    st2 = checkpoint.load_pytree(path, st)
    # resuming from the restored state continues identically
    a1, _ = jax.jit(lambda s: learners.altq_train(cfg, lcfg, s, 10))(st)
    a2, _ = jax.jit(lambda s: learners.altq_train(cfg, lcfg, s, 10))(st2)
    np.testing.assert_array_equal(np.asarray(a1.q), np.asarray(a2.q))
    np.testing.assert_array_equal(np.asarray(a1.env.rows_a),
                                  np.asarray(a2.env.rows_a))

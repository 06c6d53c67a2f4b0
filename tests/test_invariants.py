"""Debug-build invariant checks: healthy rollouts stay clean; corrupted
states are caught by the checkify wrapper."""
import jax
import jax.numpy as jnp
import numpy as np

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import batch
from gym_soccer_tpu.core.invariants import (assert_invariants, checked_step,
                                            state_invariants)

CFG = EnvConfig(width=5, height=4, slip_prob=0.2)


def test_rollout_preserves_invariants():
    st = jax.jit(lambda k: batch.init(CFG, k, 128))(jax.random.key(0))
    assert_invariants(CFG, st)
    pol = batch.random_policy_fn(CFG, jax.random.key(1), 128)
    st, _ = jax.jit(lambda s: batch.rollout(CFG, s, pol, 300))(st)
    assert_invariants(CFG, st)


def test_checked_step_passes_on_valid_state():
    st = jax.jit(lambda k: batch.init(CFG, k, 64))(jax.random.key(0))
    acts = jnp.zeros(64, jnp.int32)
    err, (new, out) = jax.jit(checked_step(CFG))(st, acts, acts)
    err.throw()  # no violation


def test_checked_step_catches_corruption():
    st = jax.jit(lambda k: batch.init(CFG, k, 64))(jax.random.key(0))
    # co-locate the players in lane 3
    bad = st._replace(
        rows_b=st.rows_b.at[3].set(st.rows_a[3]),
        cols_b=st.cols_b.at[3].set(st.cols_a[3]))
    acts = jnp.zeros(64, jnp.int32)
    err, _ = jax.jit(checked_step(CFG))(bad, acts, acts)
    with np.testing.assert_raises(Exception):
        err.throw()


def test_invariant_names_cover_corruptions():
    st = jax.jit(lambda k: batch.init(CFG, k, 8))(jax.random.key(0))
    inv = state_invariants(CFG, st)
    assert all(np.asarray(v).all() for v in inv.values())
    oob = st._replace(cols_a=st.cols_a.at[0].set(99))
    assert not np.asarray(state_invariants(CFG, oob)["in_bounds"]).all()
    absorbed = st._replace(rows_a=st.rows_a.at[0].set(1),
                           cols_a=st.cols_a.at[0].set(0),
                           poss=st.poss.at[0].set(0))
    assert not np.asarray(state_invariants(CFG, absorbed)["not_absorbed"]).all()

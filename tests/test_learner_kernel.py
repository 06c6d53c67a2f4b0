"""Fused pallas minimax-Q kernel (interpret mode on CPU): TD/count
accumulation correctness, training progress, and packing roundtrips."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.ops import learner_kernel as lk

CFG = EnvConfig(width=5, height=4, slip_prob=0.2)


def test_pack_unpack_roundtrip():
    nS = 761
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.uniform(-1, 1, (nS, 5, 5)).astype(np.float32))
    v = jnp.asarray(rng.uniform(-1, 1, nS).astype(np.float32))
    pa = jnp.full((nS, 5), 0.2, jnp.float32)
    m = lk.pack_m(CFG, pa, pa, q, v, eps=0.0)
    rows = lk._raw_rows(CFG)
    got_q = np.asarray(m)[rows, lk.COL_Q:lk.COL_Q + 25].reshape(nS, 5, 5)
    assert np.array_equal(got_q, np.asarray(q))
    assert np.array_equal(np.asarray(m)[rows, lk.COL_V], np.asarray(v))


def test_chunk_accumulates_visits_and_valid_tds():
    B, T = 1024, 16
    m = lk.pack_m(CFG, jnp.full((761, 5), 0.2), jnp.full((761, 5), 0.2),
                  jnp.zeros((761, 5, 5)), jnp.zeros(761), 0.3)
    fields = lk.init_state_fields(CFG, B)
    fields2, acc, stats = lk.learner_chunk(CFG, 0, m, fields, B, T,
                                           interpret=True)
    sum_td, cnt = lk.unpack_acc(CFG, acc)
    cnt = np.asarray(cnt)
    # exactly one visit per env per step
    assert cnt.sum() == B * T
    assert (cnt >= 0).all()
    # with q=0, v=0: td == reward, so sum over all cells == total reward
    rew = int(np.asarray(stats[0]))
    assert abs(float(np.asarray(sum_td).sum()) - rew) < 1.0
    # fields stay on the board
    for f, hi in zip(fields2[:4], (CFG.H, CFG.W, CFG.H, CFG.W)):
        arr = np.asarray(f)
        assert (arr >= 0).all() and (arr < hi).all()


def test_fused_training_learns():
    q, v, pa, pb, hist = lk.fused_minimax_train(
        CFG, batch=1024, n_chunks=30, chunk_len=16, lr=0.4, eps=0.3,
        solver_iters=100, interpret=True)
    assert float(jnp.abs(v).max()) > 0.05, "values never moved"
    assert float(jnp.abs(v).max()) <= 1.05, "values outside game range"
    assert np.allclose(np.asarray(pa).sum(-1), 1.0, atol=1e-3)
    goals = sum(h[1] for h in hist)
    assert goals > 0


def test_fused_learner_vmem_guard():
    """Grids whose packed tables exceed VMEM must fail loudly with a
    pointer at the HBM-table learner, not die inside Mosaic."""
    import pytest
    from gym_soccer_tpu.config import EnvConfig
    from gym_soccer_tpu.ops import learner_kernel as lk
    big = EnvConfig(width=15, height=10, slip_prob=0.2)
    with pytest.raises(ValueError, match="fused learner"):
        lk.learner_chunk(big, 0, None, None, batch=1024, n_steps=1,
                         interpret=True)


def test_fused_training_warm_start():
    """init=(q, v, pi_a, pi_b) must resume from the given tables: with
    lr=0 the Q table comes back bit-identical, and policies re-solve to
    the init Q's equilibrium (not the uniform default)."""
    from gym_soccer_tpu.core import tables
    nS = tables.build_statespace(CFG).nS
    rng = np.random.RandomState(0)
    q0 = jnp.asarray(rng.uniform(-0.5, 0.5, (nS, 5, 5)), jnp.float32)
    v0 = q0.mean(axis=(1, 2))
    pi0 = jnp.full((nS, 5), 0.2, jnp.float32)
    q, v, pa, pb, _ = lk.fused_minimax_train(
        CFG, batch=512, n_chunks=1, chunk_len=4, lr=0.0, eps=0.5,
        solver_iters=50, interpret=True, init=(q0, v0, pi0, pi0))
    assert np.array_equal(np.asarray(q), np.asarray(q0))
    assert not np.allclose(np.asarray(pa), 0.2, atol=1e-3), \
        "policies should re-solve the init Q, not stay uniform"

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
    m = np.asarray(lk.pack_m(CFG, pa, pa, q, v, eps=0.0),
                   dtype=np.float32)
    rows = lk._cell_rows(CFG)
    # Q/v are stored double-bf16 (hi = exact bf16 rounding + bf16
    # residual): recombining recovers the f32 value to ~2^-17 relative.
    got_q = (m[rows, lk.COL_Q:lk.COL_Q + 25]
             + m[rows, lk.COL_Q_LO:lk.COL_Q_LO + 25]).reshape(nS, 5, 5)
    assert np.allclose(got_q, np.asarray(q), atol=2e-5, rtol=2e-5)
    # far tighter than single bf16 (~2^-9 ~= 4e-3 on [-1, 1] values)
    assert np.abs(got_q - np.asarray(q)).max() < 1e-4
    got_v = m[rows, lk.COL_V] + m[rows, lk.COL_V_LO]
    assert np.allclose(got_v, np.asarray(v), atol=2e-5, rtol=2e-5)
    hi_q = m[rows, lk.COL_Q:lk.COL_Q + 25]
    assert np.array_equal(hi_q, np.asarray(q).reshape(nS, 25).astype(
        jnp.bfloat16).astype(np.float32))
    # compact rows are unique and in range
    assert len(np.unique(rows)) == nS
    assert rows.min() >= 0 and rows.max() < lk.spc(CFG)


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


@pytest.mark.slow
def test_convergence_recipe_trains_toward_equilibrium():
    """The 2-phase schedule (lr=1.0 empirical-Bellman-backup phase, then
    polynomial anneal + high-iteration final solve) must drive
    exploitability far below the uniform-play baseline — the CPU
    (interpret-mode) smoke of the verified TPU recipe.  The full-scale
    contract (exploitability <= 0.010 at gamma=0.99 vs the exact solver's
    ~0.002 floor; measured 0.004 at 2.1B steps, see BASELINE.md) runs in
    test_equilibrium_convergence_tpu on real hardware."""
    from gym_soccer_tpu.agents.evaluation import exploitability
    gamma = 0.9  # short horizon so interpret-mode step counts suffice
    q, v, pa, pb, _ = lk.fused_minimax_train(
        CFG, batch=4096, n_chunks=120, chunk_len=8, lr=1.0, eps=0.25,
        gamma=gamma, lr_anneal_start=60, lr_anneal_tau=10.0,
        lr_anneal_pow=1.5, solver_iters=200, final_solver_iters=1500,
        seed=5, interpret=True)
    uniform = jnp.full((761, 5), 0.2, jnp.float32)
    ex_uniform = float(exploitability(CFG, uniform, uniform, gamma=gamma))
    ex_trained = float(exploitability(CFG, pa, pb, gamma=gamma))
    assert ex_trained < ex_uniform / 4, (ex_trained, ex_uniform)
    assert ex_trained < 0.25, ex_trained


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="needs the real TPU (run: GST_TEST_TPU=1 python -m pytest "
           "tests/test_learner_kernel.py -k equilibrium -m slow)")
def test_equilibrium_convergence_tpu():
    """VERDICT round-1 contract: a fused run reaching exploitability
    <= 0.010 at gamma=0.99 (exact-solver floor ~0.002).  ~2.5 min on one
    v5e chip (2.1B env-steps + exact best-response evaluation)."""
    from gym_soccer_tpu.agents.evaluation import exploitability
    q, v, pa, pb, _ = lk.fused_minimax_train(
        CFG, batch=65536, n_chunks=1000, chunk_len=32, lr=1.0, eps=0.2,
        lr_anneal_start=500, lr_anneal_tau=25.0, lr_anneal_pow=1.5,
        solver_iters=400, final_solver_iters=3000, seed=1)
    ex = float(exploitability(CFG, pa, pb))
    assert ex <= 0.010, ex


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="needs the real TPU (run: GST_TEST_TPU=1 python -m pytest "
           "tests/test_learner_kernel.py -k 11x7 -m slow)")
def test_equilibrium_11x7_tpu():
    """VERDICT round-4 contract: the reference's own BIG grid (nS=11705,
    soccer_simultaneous_env.py:501) learned by fused self-play to
    exploitability <= 0.005 at gamma=0.99 (exact Shapley floor 0.00138).
    The recipe is the round-5 winner (BASELINE.md sweep): eps floor
    0.15 for off-equilibrium coverage, 600-iteration in-loop solves, a
    slow polynomial anneal, and avg_q — solve the Q table time-averaged
    over the deep-anneal tail; solve(mean Q) beats mean(solve Q)
    because the matrix-game solve amplifies Q noise at near-ties.
    Measured 0.0032-0.0035 across seeds 2/3/4.  ~8 min on one v5e chip
    (12.6B env-steps + segmented best-response evaluation)."""
    from gym_soccer_tpu.agents.evaluation import exploitability
    cfg117 = EnvConfig(width=11, height=7, slip_prob=0.2)
    q, v, pa, pb, _ = lk.fused_minimax_train(
        cfg117, batch=65536, n_chunks=6000, chunk_len=32, lr=1.0,
        eps=0.25, eps_halflife=40000, eps_min=0.15,
        lr_anneal_start=2500, lr_anneal_tau=160.0, lr_anneal_pow=1.2,
        solver_iters=600, avg_after=4000, avg_q=True,
        final_solver_iters=3000, seed=2, chunks_per_dispatch=8)
    ex = float(exploitability(cfg117, pa, pb, segment_iters=200))
    assert ex <= 0.005, ex


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


def test_fused_training_exact_resume():
    """Checkpoint/resume on the flagship trainer: 3+3 chunks across a
    utils/checkpoint save/load roundtrip must be BIT-IDENTICAL to 6
    uninterrupted chunks (absolute-chunk-index PRNG seeds + schedules,
    env fields carried through, M repacked with the continuous run's
    epsilon)."""
    import os
    import tempfile
    from gym_soccer_tpu.utils import checkpoint as ckpt
    kw = dict(batch=512, chunk_len=4, lr=0.5, eps=0.4, eps_halflife=32,
              lr_anneal_start=2, lr_anneal_tau=4.0, solver_iters=30,
              seed=7, interpret=True)
    qc, vc, pac, pbc, _, res_c = lk.fused_minimax_train(
        CFG, n_chunks=6, return_state=True, **kw)

    _, _, _, _, _, r1 = lk.fused_minimax_train(
        CFG, n_chunks=3, return_state=True, **kw)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "ck.npz")
        ckpt.save_pytree(p, r1)
        r1 = ckpt.load_pytree(p, r1)
    q, v, pa, pb, _, res = lk.fused_minimax_train(
        CFG, n_chunks=3, return_state=True,
        init=(r1["q"], r1["v"], r1["pi_a"], r1["pi_b"], r1["n"]),
        fields_init=r1["fields"], start_chunk=int(r1["next_chunk"]), **kw)

    assert int(res["next_chunk"]) == int(res_c["next_chunk"]) == 6
    assert np.array_equal(np.asarray(q), np.asarray(qc))
    assert np.array_equal(np.asarray(v), np.asarray(vc))
    assert np.array_equal(np.asarray(pa), np.asarray(pac))
    assert np.array_equal(np.asarray(pb), np.asarray(pbc))
    for a, b in zip(res["fields"], res_c["fields"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_packed_chunk_matches_unpacked():
    """The PACKED kernel (GP states per M row, target-sum accumulation)
    must step bit-identical trajectories to the unpacked kernel for equal
    policy/value contents, with identical visit counts; with q == 0 the
    accumulated sums coincide exactly (same bf16 per-visit values, same
    summation order)."""
    B, T = 1024, 16
    nS = 761
    rng = np.random.RandomState(3)
    v = jnp.asarray(rng.uniform(-1, 1, nS).astype(np.float32))
    pa = jnp.asarray(rng.dirichlet(np.ones(5), nS).astype(np.float32))
    pb = jnp.asarray(rng.dirichlet(np.ones(5), nS).astype(np.float32))
    q0 = jnp.zeros((nS, 5, 5), jnp.float32)
    m1 = lk.pack_m(CFG, pa, pb, q0, v, eps=0.2)
    m2 = lk.pack_m2(CFG, pa, pb, v, eps=0.2)
    fields = lk.init_state_fields(CFG, B)
    f1, acc1, st1 = lk.learner_chunk(CFG, 7, m1, fields, B, T,
                                     interpret=True)
    f2, acc2, st2 = lk.packed_learner_chunk(CFG, 7, m2, fields, B, T,
                                            interpret=True)
    for a, b in zip(f1, f2):
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            "packed and unpacked kernels diverged in trajectory"
    assert all(int(np.asarray(x)) == int(np.asarray(y))
               for x, y in zip(st1, st2))
    sum_td, cnt1 = lk.unpack_acc(CFG, acc1)
    sum_res, cnt2 = lk.unpack_acc2(CFG, acc2)
    cnt = np.asarray(cnt2)
    assert np.array_equal(np.asarray(cnt1), cnt)
    assert int(cnt.sum()) == B * T
    # reconstructed TD sums: residual + cnt * (v - q); equal up to the
    # two layouts' different per-visit bf16 rounding points
    rec = np.asarray(sum_res) + cnt * (np.asarray(v)[:, None, None] - 0.0)
    d = np.abs(np.asarray(sum_td) - rec)
    assert (d <= 0.01 * cnt + 1e-6).all(), d.max()

    # with v == 0 the residual IS the td: bit-for-bit equality
    m1z = lk.pack_m(CFG, pa, pb, q0, jnp.zeros(nS), eps=0.2)
    m2z = lk.pack_m2(CFG, pa, pb, jnp.zeros(nS), eps=0.2)
    _, acc1z, _ = lk.learner_chunk(CFG, 7, m1z, fields, B, T,
                                   interpret=True)
    _, acc2z, _ = lk.packed_learner_chunk(CFG, 7, m2z, fields, B, T,
                                          interpret=True)
    tdz, _ = lk.unpack_acc(CFG, acc1z)
    resz, _ = lk.unpack_acc2(CFG, acc2z)
    np.testing.assert_allclose(np.asarray(tdz), np.asarray(resz),
                               rtol=0, atol=0)


def test_fused_training_packed_converges():
    """fused_minimax_train(packed=True) must train (same smoke as the
    unpacked kernel's test_fused_training_learns)."""
    q, v, pa, pb, hist = lk.fused_minimax_train(
        CFG, batch=1024, n_chunks=30, chunk_len=16, lr=0.4, eps=0.3,
        solver_iters=100, interpret=True, packed=True)
    assert float(jnp.abs(v).max()) > 0.05, "values never moved"
    assert float(jnp.abs(v).max()) <= 1.05, "values outside game range"
    assert np.allclose(np.asarray(pa).sum(-1), 1.0, atol=1e-3)
    assert sum(h[1] for h in hist) > 0


def test_multigrid_packed_chunk_matches_unpacked():
    """The packed MULTIGRID kernel must match the unpacked one the same
    way (8-aligned variant offsets map each variant onto whole packed
    rows)."""
    cfgs = (EnvConfig(5, 4, 0.2), EnvConfig(6, 5, 0.1))
    from gym_soccer_tpu.core import tables
    nS = int(sum(tables.build_statespace(c).nS for c in cfgs))
    B, T = 1024, 8
    v = jnp.zeros(nS, jnp.float32)   # v == 0: residual == td, bit-exact
    uni = jnp.full((nS, 5), 0.2, jnp.float32)
    q0 = jnp.zeros((nS, 5, 5), jnp.float32)
    m1 = lk.pack_m(cfgs, uni, uni, q0, v, eps=0.3)
    m2 = lk.pack_m2(cfgs, uni, uni, v, eps=0.3)
    planes, fields = lk.init_state_fields(cfgs, B)
    f1, acc1, st1 = lk.multigrid_learner_chunk(cfgs, 9, m1, planes, fields,
                                               B, T, interpret=True)
    f2, acc2, st2 = lk.multigrid_packed_learner_chunk(
        cfgs, 9, m2, planes, fields, B, T, interpret=True)
    for a, b in zip(f1, f2):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    sum_td, cnt1 = lk.unpack_acc(cfgs, acc1)
    sum_tgt, cnt2 = lk.unpack_acc2(cfgs, acc2)
    assert np.array_equal(np.asarray(cnt1), np.asarray(cnt2))
    assert int(np.asarray(cnt2).sum()) == B * T
    np.testing.assert_allclose(np.asarray(sum_td), np.asarray(sum_tgt),
                               rtol=0, atol=0)


def test_chunks_per_dispatch_matches_single_dispatch():
    """The segmented scan mode (g chunks per dispatch, one compile) must
    reproduce single_dispatch bit-for-bit — same in-graph f32 schedule
    arithmetic, same chunk sequence, including a remainder segment."""
    kw = dict(batch=512, n_chunks=7, chunk_len=4, lr=0.7, eps=0.4,
              eps_halflife=64, lr_anneal_start=3, lr_anneal_tau=5.0,
              solver_iters=40, seed=11, interpret=True)
    q1, v1, pa1, pb1, h1 = lk.fused_minimax_train(
        CFG, single_dispatch=True, **kw)
    q2, v2, pa2, pb2, h2 = lk.fused_minimax_train(
        CFG, chunks_per_dispatch=3, **kw)
    assert np.array_equal(np.asarray(q1), np.asarray(q2))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(pa1), np.asarray(pa2))
    assert np.array_equal(np.asarray(pb1), np.asarray(pb2))
    assert h1 == h2


def test_avg_after_grouped_matches_per_chunk():
    """avg_after (strategy time-averaging, the faster-converging
    estimator) must work on the grouped-dispatch fast path and match the
    per-chunk loop exactly when schedules are constant (no anneal, so
    the host-f64 and in-graph-f32 schedules agree bit-for-bit)."""
    kw = dict(batch=512, n_chunks=7, chunk_len=4, lr=0.7, eps=0.4,
              solver_iters=40, seed=11, avg_after=2, interpret=True)
    q1, v1, pa1, pb1, _ = lk.fused_minimax_train(CFG, **kw)
    q2, v2, pa2, pb2, _ = lk.fused_minimax_train(
        CFG, chunks_per_dispatch=3, **kw)
    assert np.array_equal(np.asarray(q1), np.asarray(q2))
    assert np.array_equal(np.asarray(pa1), np.asarray(pa2))
    assert np.array_equal(np.asarray(pb1), np.asarray(pb2))
    # averaged strategies sum to 1 and differ from the raw iterates
    np.testing.assert_allclose(np.asarray(pa1).sum(-1), 1.0, atol=1e-5)
    q3, _, pa3, _, _ = lk.fused_minimax_train(
        CFG, **{**kw, "avg_after": 0})
    assert np.array_equal(np.asarray(q1), np.asarray(q3))  # q unaffected
    assert not np.array_equal(np.asarray(pa1), np.asarray(pa3))


def test_avg_q_grouped_matches_per_chunk():
    """avg_q (solve the time-averaged Q instead of averaging per-chunk
    solutions) must run on both dispatch modes with identical results,
    leave the raw Q iterate untouched, and produce different strategies
    from the strategy-averaging estimator."""
    kw = dict(batch=512, n_chunks=7, chunk_len=4, lr=0.7, eps=0.4,
              solver_iters=40, seed=11, avg_after=2, avg_q=True,
              final_solver_iters=60, interpret=True)
    q1, v1, pa1, pb1, _ = lk.fused_minimax_train(CFG, **kw)
    q2, v2, pa2, pb2, _ = lk.fused_minimax_train(
        CFG, chunks_per_dispatch=3, **kw)
    for a, b in ((q1, q2), (v1, v2), (pa1, pa2), (pb1, pb2)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    q3, _, pa3, _, _ = lk.fused_minimax_train(
        CFG, **{**kw, "avg_q": False})
    assert np.array_equal(np.asarray(q1), np.asarray(q3))
    assert not np.array_equal(np.asarray(pa1), np.asarray(pa3))
    np.testing.assert_allclose(np.asarray(pa1).sum(-1), 1.0, atol=1e-5)


def test_fused_best_response_matches_exact_br():
    """Fused frozen-opponent training (the reference's single-agent mode,
    soccer_simultaneous_env.py:187-188, main() :507-520) must converge to
    the exact best-response values computed by
    agents/evaluation.best_response_value, and the frozen side must play
    its policy EXACTLY (zero exploration in its packed columns)."""
    from gym_soccer_tpu.agents.evaluation import best_response_value
    from gym_soccer_tpu.utils.policies import get_random_policy_array
    gamma = 0.85  # short horizon so interpret-mode step counts suffice
    opp = get_random_policy_array(761, 5, seed=42)
    q, v, pa, pb, hist = lk.fused_best_response_train(
        CFG, opp, "player_a", batch=1024, n_chunks=40, chunk_len=8,
        lr=1.0, gamma=gamma, eps=0.3, eps_halflife=160, eps_min=0.1,
        seed=3, interpret=True)
    # frozen side: exact one-hot of the frozen policy
    opp_oh = np.eye(5, dtype=np.float32)[np.asarray(opp)]
    assert np.array_equal(np.asarray(pb), opp_oh)
    # and its packed pi columns carry NO exploration mix
    m = np.asarray(lk.pack_m(CFG, pa, pb, q, v, 0.3, eps_b=0.0),
                   np.float32)
    rows = lk._cell_rows(CFG)
    assert np.array_equal(m[rows, lk.COL_PI_B:lk.COL_PI_B + 5],
                          opp_oh.astype(np.float32).astype(jnp.bfloat16)
                          .astype(np.float32))
    # learner's values approach the exact best response
    v_br, _ = best_response_value(CFG, jnp.asarray(opp_oh), "player_a",
                                  gamma=gamma)
    err = np.abs(np.asarray(v) - np.asarray(v_br))
    assert err.mean() < 0.08, f"mean |v - V_br| = {err.mean():.3f}"
    goals = sum(h[1] for h in hist)
    assert goals > 0


def test_fused_best_response_side_b():
    """Learning side B against a frozen random A: the kernel keeps
    everything in A's reward perspective, so the trained v must approach
    MINUS the B-perspective exact best-response value."""
    from gym_soccer_tpu.agents.evaluation import best_response_value
    from gym_soccer_tpu.utils.policies import get_random_policy_array
    gamma = 0.85
    opp = get_random_policy_array(761, 5, seed=7)
    opp_oh = jnp.asarray(np.eye(5, dtype=np.float32)[np.asarray(opp)])
    q, v, pa, pb, _ = lk.fused_best_response_train(
        CFG, opp, "player_b", batch=1024, n_chunks=40, chunk_len=8,
        lr=1.0, gamma=gamma, eps=0.3, eps_halflife=160, eps_min=0.1,
        seed=4, interpret=True)
    assert np.array_equal(np.asarray(pa), np.asarray(opp_oh))
    v_br, _ = best_response_value(CFG, opp_oh, "player_b", gamma=gamma)
    err = np.abs(np.asarray(v) - (-np.asarray(v_br)))
    assert err.mean() < 0.08, f"mean |v + V_br_b| = {err.mean():.3f}"


def test_br_chunks_per_dispatch_grouping_invariant():
    """BR's grouped-dispatch mode must be invariant to the group size
    (both in-graph f32 schedules; includes a remainder segment)."""
    from gym_soccer_tpu.utils.policies import get_random_policy_array
    opp = get_random_policy_array(761, 5, seed=3)
    kw = dict(batch=512, n_chunks=7, chunk_len=4, lr=0.8, eps=0.4,
              eps_halflife=64, eps_min=0.1, lr_anneal_start=2,
              lr_anneal_tau=4.0, gamma=0.9, seed=13, interpret=True)
    q1, v1, pa1, _, h1 = lk.fused_best_response_train(
        CFG, opp, "player_a", chunks_per_dispatch=7, **kw)
    q2, v2, pa2, _, h2 = lk.fused_best_response_train(
        CFG, opp, "player_a", chunks_per_dispatch=3, **kw)
    assert np.array_equal(np.asarray(q1), np.asarray(q2))
    assert np.array_equal(np.asarray(v1), np.asarray(v2))
    assert np.array_equal(np.asarray(pa1), np.asarray(pa2))
    assert h1 == h2


def test_fused_best_response_exact_resume():
    """BR trainer checkpoint/resume: 3+3 chunks across a save/load
    roundtrip must be BIT-IDENTICAL to 6 uninterrupted chunks (greedy
    pi/v and M reconstruct from q alone; schedules and seeds key off the
    absolute chunk index)."""
    import os
    import tempfile
    from gym_soccer_tpu.utils import checkpoint as ckpt
    from gym_soccer_tpu.utils.policies import get_random_policy_array
    opp = get_random_policy_array(761, 5, seed=3)
    kw = dict(batch=512, chunk_len=4, lr=0.8, eps=0.4, eps_halflife=64,
              eps_min=0.1, lr_anneal_start=2, lr_anneal_tau=4.0,
              gamma=0.9, seed=13, interpret=True)
    qc, vc, pac, pbc, _, res_c = lk.fused_best_response_train(
        CFG, opp, "player_a", n_chunks=6, return_state=True, **kw)

    _, _, _, _, _, r1 = lk.fused_best_response_train(
        CFG, opp, "player_a", n_chunks=3, return_state=True, **kw)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "br.npz")
        ckpt.save_pytree(p, r1)
        r1 = ckpt.load_pytree(p, r1)
    q, v, pa, pb, _, res = lk.fused_best_response_train(
        CFG, opp, "player_a", n_chunks=3, return_state=True,
        init=(r1["q"], r1["n"]), fields_init=r1["fields"],
        start_chunk=int(r1["next_chunk"]), **kw)

    assert int(res["next_chunk"]) == int(res_c["next_chunk"]) == 6
    assert np.array_equal(np.asarray(q), np.asarray(qc))
    assert np.array_equal(np.asarray(v), np.asarray(vc))
    assert np.array_equal(np.asarray(pa), np.asarray(pac))
    assert np.array_equal(np.asarray(pb), np.asarray(pbc))
    for a, b in zip(res["fields"], res_c["fields"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
@pytest.mark.skipif(
    jax.default_backend() in ("cpu",),
    reason="needs the real TPU (run: GST_TEST_TPU=1 python -m pytest "
           "tests/test_learner_kernel.py -k br_tpu -m slow)")
def test_br_convergence_tpu():
    """Full-scale fused best response on chip: the learned greedy policy
    must win >95% of completed episodes vs a frozen random opponent —
    the reference's single-agent solution-quality contract
    (test_general.py:344-381) at fused-kernel speed."""
    from gym_soccer_tpu.core import batch
    from gym_soccer_tpu.utils.policies import get_random_policy_array
    opp = get_random_policy_array(761, 5, seed=42)
    q, v, pa, pb, _ = lk.fused_best_response_train(
        CFG, opp, "player_a", batch=32768, n_chunks=300, chunk_len=32,
        lr=1.0, gamma=0.99, eps=0.3, eps_halflife=2400, eps_min=0.05,
        lr_anneal_start=150, lr_anneal_tau=25.0, lr_anneal_pow=1.0,
        seed=1)
    pol_a = jnp.argmax(jnp.asarray(pa), -1).astype(jnp.int32)
    fb = jnp.asarray(opp)
    pol = lambda obs, i: (pol_a[obs], fb[obs])
    env0 = jax.jit(lambda k: batch.init(CFG, k, 2048))(jax.random.key(9))
    _, out = jax.jit(lambda s: batch.rollout(CFG, s, pol, 400))(env0)
    done = np.asarray(out.done)
    wins = ((np.asarray(out.reward_a) > 0) & done).sum()
    eps_n = (done | np.asarray(out.truncated)).sum()
    assert wins / eps_n > 0.95, f"win rate {wins / eps_n:.3f}"

"""Invariants of the batched device engine: autoreset, truncation,
determinism, placement invariance across shardings, obs encoding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import batch
from gym_soccer_tpu.parallel import mesh as pmesh

CFG = EnvConfig(width=5, height=4, slip_prob=0.2)
B = 64


def _fields(st):
    return tuple(np.asarray(x) for x in
                 (st.rows_a, st.cols_a, st.rows_b, st.cols_b, st.poss, st.t))


def test_init_states_are_isd_states():
    st = jax.jit(lambda k: batch.init(CFG, k, 4096))(jax.random.key(0))
    obs = np.asarray(batch.observe(CFG, st))
    tb = batch.tables.build_tables(CFG)
    isd_obs = set(int(tb.raw_to_dense[r]) for r in tb.isd_raw)
    assert set(obs.tolist()) == isd_obs
    # uniformity, coefficient of variation < 0.05 like the reference's
    # 10k-reset test
    counts = np.bincount(obs)[sorted(isd_obs)]
    assert np.std(counts) / np.mean(counts) < 0.05


def test_autoreset_restores_isd_and_zero_t():
    pol = batch.random_policy_fn(CFG, jax.random.key(1), B)
    st = jax.jit(lambda k: batch.init(CFG, k, B))(jax.random.key(0))
    st, out = jax.jit(lambda s: batch.rollout(CFG, s, pol, 300))(st)
    out = jax.tree.map(np.asarray, out)
    # obs after autoreset is never terminal; final_obs is 0 exactly on goals
    assert (out.obs != 0).all()
    assert ((out.final_obs == 0) == out.done).all()
    # whenever done|truncated, the NEXT obs (post-reset) must be an ISD obs
    tb = batch.tables.build_tables(CFG)
    isd_obs = set(int(tb.raw_to_dense[r]) for r in tb.isd_raw)
    term = out.done | out.truncated
    assert set(out.obs[term].ravel().tolist()) <= isd_obs


def test_absorbing_goal_state_self_loops_without_autoreset():
    """Stepping an already-terminal lane with autoreset=False self-loops
    and pays 0 (reference :235-240, :300-301): the state must NOT move
    (players could otherwise walk out of the goal column off the board)
    and done stays True."""
    st = jax.jit(lambda k: batch.init(CFG, k, 8))(jax.random.key(0))
    # A in the right goal column with the ball -> terminal goal state
    inj = st._replace(rows_a=jnp.full(8, 1, jnp.int32),
                      cols_a=jnp.full(8, CFG.W - 1, jnp.int32),
                      rows_b=jnp.full(8, 2, jnp.int32),
                      cols_b=jnp.full(8, 3, jnp.int32),
                      poss=jnp.zeros(8, jnp.int32))
    step = jax.jit(lambda s, a, b: batch.step(CFG, s, a, b, autoreset=False))
    s2, out = inj, None
    for a in range(5):  # every own action, random-ish opponent
        acts = jnp.full(8, a, jnp.int32)
        s2, out = step(s2, acts, (acts + 3) % 5)
        assert (np.asarray(out.reward_a) == 0).all()
        assert np.asarray(out.done).all()
        for f, g in zip(_fields(s2)[:5], _fields(inj)[:5]):
            assert np.array_equal(f, g)


def test_truncation_at_max_steps():
    # NOOP-vs-NOOP never terminates; every episode must truncate at 100.
    pol = lambda obs, i: (jnp.zeros(B, jnp.int32), jnp.zeros(B, jnp.int32))
    st = jax.jit(lambda k: batch.init(CFG, k, B))(jax.random.key(0))
    st, out = jax.jit(lambda s: batch.rollout(CFG, s, pol, 250))(st)
    out = jax.tree.map(np.asarray, out)
    assert not out.done.any()
    assert out.truncated[:100].sum() == B  # exactly once in first 100 steps
    t_idx = np.argmax(out.truncated, axis=0)
    assert (t_idx == 99).all()  # the 100th step truncates


def test_rollout_deterministic():
    pol = batch.random_policy_fn(CFG, jax.random.key(1), B)
    roll = jax.jit(lambda s: batch.rollout(CFG, s, pol, 100))
    st = jax.jit(lambda k: batch.init(CFG, k, B))(jax.random.key(0))
    _, o1 = roll(st)
    _, o2 = roll(st)
    assert np.array_equal(np.asarray(o1.obs), np.asarray(o2.obs))


def test_placement_invariance_across_mesh_shardings():
    """Same global instances => identical trajectories on 1 device and on
    an 8-device mesh (SURVEY.md §7.3.7)."""
    pol = batch.random_policy_fn(CFG, jax.random.key(1), B)
    st1 = jax.jit(lambda k: batch.init(CFG, k, B))(jax.random.key(0))
    r1, _ = jax.jit(lambda s: batch.rollout(CFG, s, pol, 100))(st1)

    m = pmesh.env_mesh()
    assert len(m.devices.ravel()) == 8
    stN = pmesh.sharded_init(CFG, m, jax.random.key(0), B)
    roll = pmesh.sharded_rollout_fn(CFG, m, pol, 100)
    rN, _ = roll(stN)
    for f in ("rows_a", "cols_a", "rows_b", "cols_b", "poss", "t"):
        assert np.array_equal(np.asarray(getattr(r1, f)),
                              np.asarray(getattr(rN, f))), f


def test_mixed_grid_sizes_vmappable():
    """Generalized grids (BASELINE config 4): the same kernel family jits
    for every geometry."""
    for (w, h, q) in [(5, 4, 0.0), (6, 4, 0.1), (7, 5, 0.2), (11, 7, 0.3)]:
        cfg = EnvConfig(w, h, q)
        st = jax.jit(lambda k, cfg=cfg: batch.init(cfg, k, 16))(
            jax.random.key(0))
        pol = batch.random_policy_fn(cfg, jax.random.key(1), 16)
        _, out = jax.jit(
            lambda s, cfg=cfg: batch.rollout(cfg, s, pol, 50))(st)
        assert np.asarray(out.obs).max() < batch.tables.build_tables(cfg).nS


def test_huge_grid_without_tables():
    """The direct kernel needs only the O(n_raw) indexing layer, so grids
    far beyond transition-table capacity work (40x30: 2.9M states; full
    tables would need terabytes)."""
    cfg = EnvConfig(width=40, height=30, slip_prob=0.2)
    st = jax.jit(lambda k: batch.init(cfg, k, 64))(jax.random.key(0))
    pol = batch.random_policy_fn(cfg, jax.random.key(1), 64)
    _, out = jax.jit(lambda s: batch.rollout(cfg, s, pol, 100))(st)
    assert np.asarray(out.obs).min() >= 1
    assert batch.tables.build_statespace(cfg).nS > 2_000_000


class TestCounterRng:
    """The opt-in 'counter' RNG mode (murmur3 counters, same construction
    as the pallas kernel) must be deterministic, placement-invariant, and
    distributionally indistinguishable from the threefry default."""

    def test_deterministic_and_distinct_from_threefry(self):
        st = jax.jit(lambda k: batch.init(CFG, k, 256))(jax.random.key(0))
        pol = batch.random_policy_fn(CFG, jax.random.key(1), 256)
        run = lambda mode: jax.jit(
            lambda s: batch.rollout(CFG, s, pol, 50, rng=mode))(st)
        _, o1 = run("counter")
        _, o2 = run("counter")
        _, o3 = run("threefry")
        assert np.array_equal(np.asarray(o1.obs), np.asarray(o2.obs))
        assert not np.array_equal(np.asarray(o1.obs), np.asarray(o3.obs))

    def test_invalid_mode_rejected(self):
        st = jax.jit(lambda k: batch.init(CFG, k, 64))(jax.random.key(0))
        with pytest.raises(ValueError, match="rng mode"):
            batch.per_env_uniforms(st, 2, rng="murmur")

    def test_goal_rate_matches_threefry(self):
        """Aggregate goal rate over 2048x400 random-vs-random steps: the
        two modes must agree within 3 combined sigma."""
        st = jax.jit(lambda k: batch.init(CFG, k, 2048))(jax.random.key(3))
        pol = batch.random_policy_fn(CFG, jax.random.key(4), 2048)
        rates = {}
        for mode in ("threefry", "counter"):
            _, out = jax.jit(
                lambda s: batch.rollout(CFG, s, pol, 400, rng=mode))(st)
            g = float(np.asarray(out.done.sum()))
            t = float(np.asarray(out.truncated.sum()))
            rates[mode] = (g / (g + t), g + t)
        (r1, n1), (r2, n2) = rates["threefry"], rates["counter"]
        sigma = (r1 * (1 - r1) / n1 + r2 * (1 - r2) / n2) ** 0.5
        assert abs(r1 - r2) < 3 * max(sigma, 1e-4), rates

    def test_uniform_moments(self):
        """Counter-mode uniforms: mean/var/range of 64k draws."""
        st = jax.jit(lambda k: batch.init(CFG, k, 4096))(jax.random.key(7))
        u = np.asarray(batch.per_env_uniforms(st, 16, salt=3, rng="counter"))
        assert u.shape == (4096, 16)
        assert 0.0 <= u.min() and u.max() < 1.0
        assert abs(u.mean() - 0.5) < 0.01
        assert abs(u.var() - 1 / 12) < 0.002


def test_rollout_stats_matches_stacked_rollout():
    """rollout_stats must produce exactly the sums of rollout's journaled
    outputs for the same state/policy (same draws, same transitions)."""
    st = jax.jit(lambda k: batch.init(CFG, k, 512))(jax.random.key(5))
    pol = batch.random_policy_fn(CFG, jax.random.key(6), 512)
    _, out = jax.jit(lambda s: batch.rollout(CFG, s, pol, 150))(st)
    _, acc = jax.jit(lambda s: batch.rollout_stats(CFG, s, pol, 150))(st)
    assert float(acc.reward_sum) == float(np.asarray(out.reward_a).sum())
    assert int(acc.goals) == int(np.asarray(out.done).sum())
    assert int(acc.truncs) == int(np.asarray(out.truncated).sum())


def test_random_rollout_stats_sane():
    """Self-driving random rollout: goal-rate in the random-play band."""
    st = jax.jit(lambda k: batch.init(CFG, k, 2048))(jax.random.key(8))
    _, acc = jax.jit(
        lambda s: batch.random_rollout_stats(CFG, s, 400, rng="counter"))(st)
    g, t = int(acc.goals), int(acc.truncs)
    rate = g / (g + t)
    assert 0.90 < rate < 0.99, (g, t)   # random play ends ~95% in goals

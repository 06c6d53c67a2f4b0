"""utils/metrics: exact episode aggregation and merging.

The reference's analogue is main()'s Python episode accounting
(soccer_simultaneous_env.py:598-613); these tests pin the batched
equivalents: chunk_stats correctness on handcrafted chunks, merge
exactness (sums, so associative and weight-free), and goal/truncation
exclusivity.
"""
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import batch
from gym_soccer_tpu.utils.metrics import EpisodeStats, chunk_stats


def _chunk(done, trunc, rew):
    return SimpleNamespace(done=np.asarray(done, bool),
                           truncated=np.asarray(trunc, bool),
                           reward_a=np.asarray(rew, np.float32))


def test_chunk_stats_handcrafted():
    # 6 lanes: goal-win-A, goal-win-B, truncation, goal+trunc same step
    # (counts as a goal), running, running
    out = _chunk([1, 1, 0, 1, 0, 0],
                 [0, 0, 1, 1, 0, 0],
                 [1.0, -1.0, 0.0, 1.0, 0.0, 0.0])
    s = chunk_stats(out)
    assert int(s.episodes) == 4
    assert int(s.goals) == 3
    assert int(s.truncations) == 1          # exclusive of goals
    assert int(s.wins_a) == 2 and int(s.wins_b) == 1
    assert float(s.reward_a_sum) == 1.0
    assert int(s.steps) == 6
    assert s.mean_reward_a == 0.25
    assert s.mean_length == 1.5
    assert s.win_rate_a == 0.5


def test_merge_is_exact_addition():
    a = chunk_stats(_chunk([1, 0], [0, 0], [1.0, 0.0]))
    b = chunk_stats(_chunk([0, 1, 1], [1, 0, 0], [0.0, -1.0, 1.0]))
    m = a.merge(b)
    whole = chunk_stats(_chunk([1, 0, 0, 1, 1], [0, 0, 1, 0, 0],
                               [1.0, 0.0, 0.0, -1.0, 1.0]))
    for x, y in zip(m, whole):
        assert float(x) == float(y)
    # associativity + zero identity
    z = EpisodeStats.zero()
    for x, y in zip(z.merge(a).merge(b), a.merge(z.merge(b))):
        assert float(x) == float(y)


def test_chunk_stats_under_jit_matches_host():
    """Same numbers whether computed on device under jit (jnp) or on host
    numpy arrays — the two consumer paths (rollout chunks / vector env)."""
    cfg = EnvConfig(5, 4, 0.2)

    @jax.jit
    def run(key):
        st = batch.init(cfg, key, 256)
        pol = batch.random_policy_fn(cfg, jax.random.key(1), 256)
        _, out = batch.rollout(cfg, st, pol, 120)
        return out, chunk_stats(out)

    out, dev = run(jax.random.key(0))
    host = chunk_stats(SimpleNamespace(
        done=np.asarray(out.done), truncated=np.asarray(out.truncated),
        reward_a=np.asarray(out.reward_a)))
    for x, y in zip(jax.device_get(dev), host):
        assert float(x) == float(y)
    assert int(host.episodes) > 0
    assert int(host.goals) + int(host.truncations) == int(host.episodes)


def test_rollout_prob_field_matches_info_contract():
    """StepOut.prob (the batched info['p'], reference :405): valid
    probabilities from the unmerged-list support, and the no-slip entry's
    exact float (1-q)^2 appears."""
    cfg = EnvConfig(5, 4, 0.2)

    @jax.jit
    def run(key):
        st = batch.init(cfg, key, 128)
        pol = batch.random_policy_fn(cfg, jax.random.key(1), 128)
        _, out = batch.rollout(cfg, st, pol, 60)
        return out.prob

    p = np.asarray(run(jax.random.key(0)), np.float64).ravel()
    assert ((p > 0) & (p <= 1)).all()
    allowed = {round(cp * w, 6)
               for cp in (0.64, 0.08, 0.01) for w in (1.0, 0.5, 0.25)}
    got = {round(float(v), 6) for v in np.unique(p.astype(np.float32))}
    assert got <= allowed
    assert round(0.64, 6) in got

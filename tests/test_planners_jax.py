"""On-device planners and the registry/profiling utilities."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gym_soccer_tpu as gst
from gym_soccer_tpu.agents import planners
from gym_soccer_tpu.envs import SoccerSimultaneousEnv
from gym_soccer_tpu.utils.policies import (get_random_policy,
                                           get_random_policy_array,
                                           get_stand_policy,
                                           policy_dict_to_array)


def test_jax_vi_matches_numpy_vi():
    env = SoccerSimultaneousEnv(slip_prob=0.2,
                                player_b_policy=get_stand_policy(761))
    prob, ns, rew, done = planners._env_arrays(env)
    pi_np, V_np, Q_np, cc_np = planners.value_iteration_arrays(
        prob, ns, rew, done, theta=1e-6, gamma=0.99)
    pi_j, V_j, Q_j, cc_j = planners.value_iteration_jax_jit(
        jnp.asarray(prob, jnp.float32), jnp.asarray(ns),
        jnp.asarray(rew, jnp.float32), jnp.asarray(done),
        1e-5, 0.99)
    # float32 on device vs float64 host: same greedy policy on all states
    # where the action gap is significant
    Q_gap = np.sort(Q_np, axis=1)
    distinct = (Q_gap[:, -1] - Q_gap[:, -2]) > 1e-3
    assert (np.asarray(pi_j)[distinct] == pi_np[distinct]).all()
    assert np.allclose(np.asarray(V_j), V_np, atol=1e-3)


def test_jax_vi_returns_pre_update_v():
    """The jax VI's V-return contract matches the reference/numpy twin:
    the returned V is the PRE-update V the final Q was backed up from
    (ref planners.py:14-17), so max_a Q - V stays within theta and the
    sweep counts line up across implementations at equal theta."""
    env = SoccerSimultaneousEnv(slip_prob=0.2,
                                player_b_policy=get_stand_policy(761))
    prob, ns, rew, done = planners._env_arrays(env)
    theta = 1e-4
    pi_np, V_np, Q_np, cc_np = planners.value_iteration_arrays(
        prob, ns, rew, done, theta=theta, gamma=0.99)
    pi_j, V_j, Q_j, cc_j = planners.value_iteration_jax_jit(
        jnp.asarray(prob, jnp.float32), jnp.asarray(ns),
        jnp.asarray(rew, jnp.float32), jnp.asarray(done),
        theta, 0.99)
    V_j, Q_j = np.asarray(V_j, np.float64), np.asarray(Q_j, np.float64)
    # Pre-update semantics: V is the fixpoint candidate Q was built FROM,
    # so the convergence residual is < theta but generally nonzero...
    assert np.max(np.abs(V_j - Q_j.max(axis=1))) < theta
    # ...and it tracks the host float64 V to f32 precision at this theta.
    assert np.allclose(V_j, V_np, atol=2e-3)
    assert np.max(np.abs(V_np - Q_np.max(axis=1))) < theta
    # Same loop structure => sweep counts agree to within f32 noise.
    assert abs(int(cc_j) - cc_np) <= 2


def test_policy_dict_array_equivalence():
    d = get_random_policy(761, 5, seed=3)
    a = get_random_policy_array(761, 5, seed=3)
    assert np.array_equal(policy_dict_to_array(d, 761), a)


def test_registry_make_and_overrides():
    ids = gst.registry_ids()
    assert "SoccerSimultaneous-v0" in ids
    env = gst.make("SoccerSimultaneous-v0", slip_prob=0.2, seed=7)
    assert env.slip_prob == 0.2
    obs, _ = env.reset()
    assert set(obs) == {"player_a", "player_b"}
    with pytest.raises(KeyError):
        gst.make("NoSuchEnv-v0")


def test_registry_max_episode_steps_applied():
    """The registered max_episode_steps becomes the env's truncation
    horizon (the reference's intended register() wires it into TimeLimit,
    gym_soccer/__init__.py:5-12) and is overridable at make()."""
    gst.register("SoccerShort-v0", max_episode_steps=3,
                 width=5, height=4, slip_prob=0.0)
    env = gst.make("SoccerShort-v0")
    assert env.cfg.max_steps == 3
    env.reset(seed=0)
    noop = {"player_a": 0, "player_b": 0}
    for i in range(3):
        _, _, dones, truncs, _ = env.step(noop)
        assert not any(dones.values())
        assert all(truncs.values()) == (i == 2)
    assert env.needs_reset

    # caller override wins
    env2 = gst.make("SoccerShort-v0", max_steps=5)
    assert env2.cfg.max_steps == 5
    # default registration keeps the reference's 100 (:404)
    assert gst.make("SoccerSimultaneous-v0").cfg.max_steps == 100


def test_profiling_phase_and_throughput():
    from gym_soccer_tpu.utils.profiling import Throughput, phase, phase_report
    with phase("unit", sync=False):
        sum(range(1000))
    rep = phase_report()
    assert rep and rep[-1]["phase"] == "unit" and rep[-1]["seconds"] >= 0
    tp = Throughput()
    tp.tick(500)
    assert tp.summary()["env_steps"] == 500

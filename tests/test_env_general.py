"""Structural/property and end-to-end solution tests.

Mirrors the reference's test_general.py: ISD structure across grid sizes,
P-schema contract, per-mode API contracts, and the de-facto integration
tests — value iteration must win 100% vs a standing opponent and >95% vs a
random one, from either side.
"""
import numpy as np
import pytest

from gym_soccer_tpu import spaces
from gym_soccer_tpu.envs import SoccerSimultaneousEnv
from gym_soccer_tpu.agents.planners import (
    modified_policy_iteration, policy_iteration, value_iteration)
from gym_soccer_tpu.utils.policies import get_random_policy, get_stand_policy

GRIDS = [(5, 4), (6, 4), (7, 5), (9, 6), (11, 7)]


@pytest.mark.parametrize("width,height", GRIDS)
def test_isd_structure(width, height):
    env = SoccerSimultaneousEnv(width=width, height=height)
    probs = [p for p, _ in env.isd]
    assert abs(sum(probs) - 1.0) < 1e-6
    assert all(abs(p - probs[0]) < 1e-6 for p in probs)

    even = len(env.goal_rows) % 2 == 0
    assert len(env.isd) == (4 if even else 2)
    for _, (ra, ca, rb, cb, poss) in env.isd:
        assert ca == 2 and cb == env.width - 3
        assert poss in (0, 1)
        if even:
            mid = len(env.goal_rows) // 2
            valid = {env.goal_rows[mid - 1], env.goal_rows[mid]}
            assert ra in valid and rb in valid and ra != rb
        else:
            mid_row = env.goal_rows[len(env.goal_rows) // 2]
            assert ra == mid_row and rb == mid_row


@pytest.mark.parametrize("width,height", GRIDS)
def test_isd_sampling_uniformity(width, height):
    env = SoccerSimultaneousEnv(width=width, height=height)
    n = 10000
    counts = {}
    for _ in range(n):
        env.reset()
        counts[env.state] = counts.get(env.state, 0) + 1
    expected_states = 4 if len(env.goal_rows) % 2 == 0 else 2
    assert len(counts) == expected_states
    observed = np.array(list(counts.values()))
    assert np.allclose(observed / n, 1 / expected_states, rtol=0.1)
    assert np.std(observed) / np.mean(observed) < 0.05


@pytest.mark.parametrize("width,height", GRIDS)
def test_P_schema(width, height):
    env = SoccerSimultaneousEnv(width=width, height=height)
    P = env.P
    assert isinstance(P, dict)
    assert set(P.keys()) == set(range(len(P)))
    valid_actions = set(P[0].keys())
    for s, actions in P.items():
        assert isinstance(actions, dict)
        assert set(actions.keys()) == valid_actions
        for a, transitions in actions.items():
            assert isinstance(transitions, list)
            for tr in transitions:
                prob, ns, r, d = tr
                assert len(tr) == 4
                assert 0 <= prob <= 1
                assert isinstance(ns, int) and 0 <= ns < len(P)
                assert isinstance(r, (int, float))
                assert isinstance(d, bool)


def _check_agent_dicts(ret, agents):
    for d in ret:
        assert isinstance(d, dict) and set(d.keys()) == set(agents)


@pytest.mark.parametrize("mode", ["single_a", "single_b", "multi"])
def test_mode_contracts(mode):
    n_states, n_actions = 761, 5
    rng = np.random.RandomState(0)
    pol = {s: int(rng.randint(0, n_actions)) for s in range(n_states)}
    if mode == "single_a":
        env = SoccerSimultaneousEnv(slip_prob=0.2, player_b_policy=pol)
        agents = ["player_a"]
        assert not env.multiagent
    elif mode == "single_b":
        env = SoccerSimultaneousEnv(slip_prob=0.2, player_a_policy=pol)
        agents = ["player_b"]
        assert not env.multiagent
    else:
        env = SoccerSimultaneousEnv(slip_prob=0.2)
        agents = ["player_a", "player_b"]
        assert env.multiagent

    assert isinstance(env.observation_space, spaces.Dict)
    assert isinstance(env.action_space, spaces.Dict)
    for a in agents:
        assert env.observation_space[a].n == n_states
        assert env.action_space[a].n == n_actions
    for other in {"player_a", "player_b"} - set(agents):
        assert other not in env.observation_space
        assert other not in env.action_space

    obs, info = env.reset()
    _check_agent_dicts((obs, info), agents)
    assert all(0 <= obs[a] < n_states for a in agents)

    action = {a: int(rng.randint(0, n_actions)) for a in agents}
    obs, reward, term, trunc, info = env.step(action)
    _check_agent_dicts((obs, reward, term, trunc, info), agents)
    for a in agents:
        assert 0 <= obs[a] < n_states
        assert isinstance(reward[a], float)
        assert isinstance(term[a], bool)
        assert isinstance(trunc[a], bool)


def _run_episodes(env, policy, agent, n_episodes=1000):
    wins = 0
    for _ in range(n_episodes):
        obs, _ = env.reset()
        done = False
        while not done:
            action = policy[obs[agent]]
            obs, reward, term, trunc, _ = env.step({agent: action})
            done = term[agent] or trunc[agent]
            if term[agent] and reward[agent] > 0:
                wins += 1
    return wins / n_episodes


@pytest.mark.parametrize("agent", ["player_a", "player_b"])
def test_vi_beats_stand_policy(agent):
    stand = get_stand_policy(761)
    kwargs = ({"player_b_policy": stand} if agent == "player_a"
              else {"player_a_policy": stand})
    env = SoccerSimultaneousEnv(slip_prob=0.2, **kwargs)
    pi, V, Q, cc = value_iteration(env, theta=1e-10, discount_factor=0.99)
    win_rate = _run_episodes(env, pi, agent)
    assert win_rate == 1.0, f"expected 100% wins, got {win_rate:.1%}"


@pytest.mark.parametrize("agent", ["player_a", "player_b"])
def test_vi_beats_random_policy(agent):
    rand = get_random_policy(761, 5, seed=42)
    kwargs = ({"player_b_policy": rand} if agent == "player_a"
              else {"player_a_policy": rand})
    env = SoccerSimultaneousEnv(slip_prob=0.2, **kwargs)
    pi, V, Q, cc = value_iteration(env, theta=1e-10, discount_factor=0.99)
    win_rate = _run_episodes(env, pi, agent)
    assert win_rate > 0.95, f"expected >95% wins, got {win_rate:.1%}"


def test_planners_agree():
    """VI, PI, and MPI(k=1 / k=large) must converge to the same solution
    (the reference main()'s cross-consistency asserts, :553-567)."""
    pol_b = get_random_policy(761, 5, seed=0)
    env = SoccerSimultaneousEnv(slip_prob=0.2, player_b_policy=pol_b)
    theta, gamma = 1e-10, 0.99
    vi_pi, vi_V, vi_Q, _ = value_iteration(env, theta, gamma)
    pi_pi, pi_V, pi_Q, _ = policy_iteration(env, theta, gamma)
    m1_pi, m1_V, m1_Q, _ = modified_policy_iteration(env, 1, theta, gamma)
    m2_pi, m2_V, m2_Q, _ = modified_policy_iteration(env, 10**7, theta, gamma)
    assert np.all(vi_pi == pi_pi) and np.all(vi_pi == m1_pi) \
        and np.all(vi_pi == m2_pi)
    for V in (pi_V, m1_V, m2_V):
        assert np.allclose(vi_V, V)
    for Q in (pi_Q, m1_Q, m2_Q):
        assert np.allclose(vi_Q, Q)

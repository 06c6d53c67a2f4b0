"""Alternating-turn environment: turn-taking semantics, steal rule, goal
detection, slip statistics, and batched-kernel/single-env agreement."""
import jax
import numpy as np
import pytest

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.envs import SoccerAlternatingEnv
from gym_soccer_tpu.envs.soccer_alternating_env import (
    alt_init, alt_step, alt_transition)

NOOP, NORTH, SOUTH, EAST, WEST = 0, 1, 2, 3, 4


@pytest.fixture
def env():
    e = SoccerAlternatingEnv(width=5, height=4, slip_prob=0.0)
    e.reset()
    return e


def test_turn_alternates(env):
    assert env.current_player == 'player_a'
    env.step(NOOP)
    assert env.current_player == 'player_b'
    env.step(NOOP)
    assert env.current_player == 'player_a'


def test_only_mover_moves(env):
    env.state = (1, 2, 2, 4, 0, 0)  # A's turn
    env.step(EAST)
    assert env.state[:4] == (1, 3, 2, 4), "only A moved"
    env.step(WEST)  # now B's turn
    assert env.state[:4] == (1, 3, 2, 3), "only B moved"


def test_steal_on_contact(env):
    env.state = (1, 2, 1, 3, 0, 0)  # A with ball, B adjacent, A's turn
    env.step(EAST)
    xa, ya, xb, yb, p, turn = env.state
    assert (xa, ya, xb, yb) == (1, 2, 1, 3), "A bounces back"
    assert p == 1, "possession stolen by B"
    assert turn == 1


def test_goal_scoring(env):
    env.state = (1, 5, 3, 1, 0, 0)  # A with ball at goal mouth, A's turn
    obs, rew, done, trunc, info = env.step(EAST)
    assert done['player_a'] and rew['player_a'] == 1.0 \
        and rew['player_b'] == -1.0


def test_own_goal(env):
    env.state = (2, 1, 3, 5, 0, 0)
    obs, rew, done, trunc, info = env.step(WEST)
    assert done['player_a'] and rew['player_a'] == -1.0


def test_no_goal_without_possession(env):
    env.state = (1, 5, 3, 1, 1, 0)  # A at goal mouth WITHOUT ball
    obs, rew, done, trunc, info = env.step(EAST)
    assert not done['player_a']
    assert env.state[:2] == (1, 5), "goal wall bounces A back"


def test_truncation(env):
    for _ in range(100):
        env.step(NOOP)
    assert env.needs_reset


def test_egocentric_observations(env):
    env.state = (1, 2, 2, 4, 1, 0)
    obs = env._obs()
    assert obs['player_a'] == (1, 2, 2, 4, 0)
    assert obs['player_b'] == (2, 4, 1, 2, 1)


def test_slip_statistics():
    env = SoccerAlternatingEnv(width=5, height=4, slip_prob=0.2, seed=1)
    n, slipped = 20000, 0
    for _ in range(n):
        env.reset()
        env.state = (1, 2, 3, 4, 0, 0)
        env.step(EAST)
        if env.state[:2] != (1, 3):
            slipped += 1
    assert 0.18 <= slipped / n <= 0.22


def test_batched_kernel_matches_single_env_semantics():
    cfg = EnvConfig(5, 4, 0.0)
    B = 32
    st = jax.jit(lambda k: alt_init(cfg, k, B))(jax.random.key(0))
    step = jax.jit(lambda s, a: alt_step(cfg, s, a, autoreset=False))
    # force a known state in all lanes: A's turn, adjacent, A has ball
    full = lambda v: np.full(B, v, dtype=np.int32)
    st = st._replace(rows_a=full(1), cols_a=full(2), rows_b=full(1),
                     cols_b=full(3), poss=full(0), turn=full(0))
    st2, (rew, done, trunc) = step(st, full(EAST))
    assert (np.asarray(st2.cols_a) == 2).all(), "steal rule bounces A"
    assert (np.asarray(st2.poss) == 1).all()
    assert (np.asarray(st2.turn) == 1).all()

    # pure transition function agreement with the single-env step
    env = SoccerAlternatingEnv(width=5, height=4, slip_prob=0.0)
    env.reset()
    env.state = (1, 2, 1, 3, 0, 0)
    env.step(EAST)
    got = alt_transition(np, 1, 2, 1, 3, 0, 0, EAST, 1, 0, cfg)
    assert tuple(int(v) for v in got) == env.state

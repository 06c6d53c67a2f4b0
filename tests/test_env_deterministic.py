"""Deterministic (slip_prob=0) scenario tests via state injection.

Mirrors the reference suite's methodology
(tests/test_deterministic_soccer_simultaneous_env.py): inject a handcrafted
state, step once, assert the exact next state / reward / termination.
Scenario literals are the behavioral spec and match the reference's.
"""
import numpy as np
import pytest

from gym_soccer_tpu.envs import SoccerSimultaneousEnv

NOOP, NORTH, SOUTH, EAST, WEST = 0, 1, 2, 3, 4


@pytest.fixture(scope="module")
def env():
    return SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.0)


@pytest.fixture(autouse=True)
def _fresh(env):
    env.reset()
    yield


def test_initialization(env):
    assert env.width == 7 and env.height == 4 and env.slip_prob == 0.0
    assert env.action_space['player_a'].n == 5
    assert env.action_space['player_b'].n == 5


def test_reset_and_step_shapes(env):
    obs, info = env.reset()
    assert set(obs) == {'player_a', 'player_b'} == set(info)
    out = env.step({'player_a': NOOP, 'player_b': NOOP})
    assert all(isinstance(d, dict) for d in out)


# ---- scoring / own goals -------------------------------------------------
# (state, action_a, action_b, expected reward_a)
SCORING_CASES = [
    ((1, 5, 3, 1, 0), EAST, NOOP, 1),    # A scores
    ((3, 5, 1, 1, 1), NOOP, WEST, -1),   # B scores
    ((1, 1, 3, 5, 0), WEST, NOOP, -1),   # A own goal, row 1
    ((2, 1, 3, 5, 0), WEST, NOOP, -1),   # A own goal, row 2
    ((3, 1, 1, 5, 1), NOOP, EAST, 1),    # B own goal, row 1
    ((3, 1, 2, 5, 1), NOOP, EAST, 1),    # B own goal, row 2
    ((1, 5, 3, 3, 0), EAST, NOOP, 1),    # edge of B's goal area
    ((2, 1, 3, 3, 0), WEST, NOOP, -1),   # edge of own goal area
]


@pytest.mark.parametrize("state,aa,ab,ra", SCORING_CASES)
def test_scoring(env, state, aa, ab, ra):
    env.state = state
    obs, reward, done, trunc, info = env.step({'player_a': aa, 'player_b': ab})
    assert done['player_a'] and done['player_b']
    assert reward['player_a'] == ra and reward['player_b'] == -ra


def test_simultaneous_goal_attempts(env):
    # Only the ball carrier's goal counts (reference :341-352).
    env.state = (1, 5, 1, 1, 0)
    _, reward, done, _, _ = env.step({'player_a': EAST, 'player_b': WEST})
    assert done['player_a'] and reward['player_a'] == 1 and reward['player_b'] == -1

    env.reset()
    env.state = (1, 5, 1, 1, 1)
    _, reward, done, _, _ = env.step({'player_a': EAST, 'player_b': WEST})
    assert done['player_a'] and reward['player_a'] == -1 and reward['player_b'] == 1


# ---- collisions ----------------------------------------------------------

@pytest.mark.parametrize("poss", [0, 1])
def test_swap_through_collision(env, poss):
    env.state = (1, 2, 1, 3, poss)
    env.step({'player_a': EAST, 'player_b': WEST})
    assert env.state[1] == 2 and env.state[3] == 3, "both bounce back"
    assert env.state[4] in (0, 1)


@pytest.mark.parametrize("state,aa,ab", [
    ((1, 2, 1, 3, 0), EAST, NOOP),
    ((1, 2, 1, 3, 1), NOOP, WEST),
])
def test_move_into_stander_collision(env, state, aa, ab):
    env.state = state
    env.step({'player_a': aa, 'player_b': ab})
    assert env.state[:4] == state[:4], "both stay in place"
    # Possession flips deterministically to the non-holder (reference
    # collision case 2, :330-335).
    assert env.state[4] == 1 - state[4]


SAME_CELL_CASES = [
    # diagonal approaches
    ((1, 1, 2, 2, 0), EAST, NORTH), ((1, 1, 2, 2, 1), EAST, NORTH),
    ((1, 2, 2, 1, 0), WEST, NORTH), ((1, 2, 2, 1, 1), WEST, NORTH),
    ((2, 1, 1, 2, 0), EAST, SOUTH), ((2, 1, 1, 2, 1), EAST, SOUTH),
    ((2, 2, 1, 1, 0), WEST, SOUTH), ((2, 2, 1, 1, 1), WEST, SOUTH),
    # head-on horizontal (gap 2)
    ((1, 1, 1, 3, 0), EAST, WEST), ((1, 1, 1, 3, 1), EAST, WEST),
    ((1, 3, 1, 1, 0), WEST, EAST), ((1, 3, 1, 1, 1), WEST, EAST),
    # head-on vertical (gap 2)
    ((1, 1, 3, 1, 0), SOUTH, NORTH), ((1, 1, 3, 1, 1), SOUTH, NORTH),
    ((3, 1, 1, 1, 0), NORTH, SOUTH), ((3, 1, 1, 1, 1), NORTH, SOUTH),
]


@pytest.mark.parametrize("state,aa,ab", SAME_CELL_CASES)
def test_race_to_same_cell(env, state, aa, ab, iterations=1000):
    """Collision case 4: exactly one player advances, 50/50, and possession
    is re-assigned 50/50 (reference :347-356, statistical bands :118-165)."""
    moved = {'A': 0, 'B': 0}
    flips = 0
    for _ in range(iterations):
        env.reset()
        env.state = state
        env.step({'player_a': aa, 'player_b': ab})
        if env.state[0] != state[0] or env.state[1] != state[1]:
            moved['A'] += 1
        elif env.state[2] != state[2] or env.state[3] != state[3]:
            moved['B'] += 1
        if env.state[4] != state[4]:
            flips += 1
    assert moved['A'] + moved['B'] == iterations, "exactly one moves"
    for who, count in moved.items():
        assert 0.45 <= count / iterations <= 0.55, f"{who}: {count}"
    assert 0.45 <= flips / iterations <= 0.55


def test_repeated_swap_collisions(env):
    """1000 consecutive swap-through collisions: always a bounce, possession
    changes ~half the time (reference :373-394).

    NOTE: the reference's own version of this test is broken — it never
    resets, so the 100-step truncation gate trips needs_reset at iteration
    101 and the suite fails (verified by running the reference's test).
    We keep the scenario but reset per iteration, like its other
    statistical tests do."""
    state = (1, 2, 1, 3, 0)
    n, coll, changes, last = 1000, 0, 0, 0
    for _ in range(n):
        env.reset()
        env.state = state
        env.step({'player_a': EAST, 'player_b': WEST})
        if env.state[1] == state[1] and env.state[3] == state[3]:
            coll += 1
        if env.state[4] != last:
            changes += 1
        last = env.state[4]
    assert coll == n
    assert 0.45 <= changes / n <= 0.55


# ---- boundaries ----------------------------------------------------------

EDGE_CASES = [
    # A at top edge, B at right edge — every joint attempt out of bounds
    ((0, 1, 3, 5, 0), NORTH, EAST), ((0, 1, 3, 5, 1), NORTH, EAST),
    ((0, 1, 3, 5, 0), WEST, EAST), ((0, 1, 3, 5, 1), WEST, EAST),
    ((0, 1, 3, 5, 0), NORTH, SOUTH), ((0, 1, 3, 5, 1), NORTH, SOUTH),
    ((0, 1, 3, 5, 0), WEST, SOUTH), ((0, 1, 3, 5, 1), WEST, SOUTH),
    # swapped roles: A at right edge, B at top edge
    ((3, 5, 0, 1, 0), EAST, NORTH), ((3, 5, 0, 1, 1), EAST, NORTH),
    ((3, 5, 0, 1, 0), EAST, WEST), ((3, 5, 0, 1, 1), EAST, WEST),
    ((3, 5, 0, 1, 0), SOUTH, NORTH), ((3, 5, 0, 1, 1), SOUTH, NORTH),
    ((3, 5, 0, 1, 0), SOUTH, WEST), ((3, 5, 0, 1, 1), SOUTH, WEST),
    # goal columns are walls without possession
    ((1, 1, 3, 3, 1), WEST, NOOP), ((2, 1, 3, 3, 1), WEST, NOOP),
    ((3, 3, 1, 5, 0), NOOP, EAST), ((3, 3, 2, 5, 0), NOOP, EAST),
    ((3, 3, 1, 1, 0), NOOP, WEST), ((3, 3, 2, 1, 0), NOOP, WEST),
    ((1, 5, 3, 3, 1), EAST, NOOP), ((2, 5, 3, 3, 1), EAST, NOOP),
]


@pytest.mark.parametrize("state,aa,ab", EDGE_CASES)
def test_boundary_bounces(env, state, aa, ab):
    env.state = state
    env.step({'player_a': aa, 'player_b': ab})
    assert env.state == state, "out-of-bounds moves must bounce back"


def test_partial_out_of_bounds(env):
    # One player bounces, the other moves freely (reference :396-407).
    env.state = (0, 1, 3, 4, 1)
    env.step({'player_a': NORTH, 'player_b': EAST})
    assert env.state[3] == 5 and env.state[0] == 0 and env.state[1] == 1


# ---- possession ----------------------------------------------------------

@pytest.mark.parametrize("poss", [0, 1])
def test_possession_stable_without_collision(env, poss):
    env.state = (1, 1, 3, 3, poss)
    env.step({'player_a': EAST, 'player_b': WEST})
    assert env.state[4] == poss


@pytest.mark.parametrize("state,aa,ab", [
    ((1, 1, 1, 2, 0), EAST, EAST), ((1, 1, 1, 2, 1), EAST, EAST),
    ((1, 1, 1, 3, 0), EAST, EAST), ((1, 1, 1, 3, 1), EAST, EAST),
])
def test_chasing_keeps_possession(env, state, aa, ab):
    # Both move the same way: no collision, possession unchanged
    # (reference :354-371).
    env.state = state
    env.step({'player_a': aa, 'player_b': ab})
    assert env.state[4] == state[4]


def test_render_smoke(env, capsys):
    env.reset()
    env.render()
    out = capsys.readouterr().out
    for needle in ("Player A position", "Player B position", "Ball possession"):
        assert needle in out

"""Statistical distribution tests (slip_prob=0.2) against the batched
device kernel.

Mirrors the reference's test_slip_soccer_simultaneous_env.py Monte-Carlo
bands, but each 100k-iteration Python loop becomes ONE vmapped call on the
batched engine (SURVEY.md §4.5) — these validate that the in-kernel
transition sampling reproduces the reference's closed-form probabilities.
The facade path is separately bit-exact-verified against golden fixtures.
"""
import jax
import numpy as np
import pytest

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import batch

NOOP, NORTH, SOUTH, EAST, WEST = 0, 1, 2, 3, 4
CFG = EnvConfig(width=5, height=4, slip_prob=0.2)
N = 100_000


def inject_and_step(state_tuple, aa, ab, seed=0, cfg=CFG, n=N):
    """Set all n instances to `state_tuple`, step once (no autoreset),
    return the next-state field arrays and StepOut."""
    st = batch.init(cfg, jax.random.key(seed), n)
    full = lambda v: np.full(n, v, dtype=np.int32)
    st = st._replace(rows_a=full(state_tuple[0]), cols_a=full(state_tuple[1]),
                     rows_b=full(state_tuple[2]), cols_b=full(state_tuple[3]),
                     poss=full(state_tuple[4]),
                     t=np.zeros(n, dtype=np.int32))
    step = jax.jit(lambda s, a, b: batch.step(cfg, s, a, b, autoreset=False))
    new, out = step(st, full(aa), full(ab))
    new = new._replace(key=None)  # PRNG-key leaves aren't numpy-convertible
    return (jax.tree.map(np.asarray, new),
            jax.tree.map(np.asarray, out))


def unchanged(new, state_tuple):
    return ((new.rows_a == state_tuple[0]) & (new.cols_a == state_tuple[1]) &
            (new.rows_b == state_tuple[2]) & (new.cols_b == state_tuple[3]) &
            (new.poss == state_tuple[4]))


@pytest.mark.parametrize("state,aa,ab", [
    ((1, 5, 3, 1, 0), EAST, NOOP),   # A shooting
    ((3, 5, 1, 1, 1), NOOP, WEST),   # B shooting
])
def test_scoring_ratio(state, aa, ab):
    # P(score) = 1 - slip = 0.8 when shooting from the goal mouth.
    new, out = inject_and_step(state, aa, ab)
    ratio = out.done.mean()
    assert 0.75 <= ratio <= 0.85, ratio
    assert np.all(np.abs(out.reward_a[out.done]) == 1)


SLIP_GOAL_CASES = [
    ((1, 1, 3, 3, 0), NORTH, NOOP), ((2, 1, 3, 3, 0), NORTH, NOOP),
    ((1, 1, 3, 3, 0), SOUTH, NOOP), ((2, 1, 3, 3, 0), SOUTH, NOOP),
    ((1, 5, 3, 3, 0), NORTH, NOOP), ((2, 5, 3, 3, 0), NORTH, NOOP),
    ((1, 5, 3, 3, 0), SOUTH, NOOP), ((2, 5, 3, 3, 0), SOUTH, NOOP),
    ((3, 3, 1, 1, 1), NOOP, NORTH), ((3, 3, 2, 1, 1), NOOP, NORTH),
    ((3, 3, 1, 1, 1), NOOP, SOUTH), ((3, 3, 2, 1, 1), NOOP, SOUTH),
    ((3, 3, 1, 5, 1), NOOP, NORTH), ((3, 3, 2, 5, 1), NOOP, NORTH),
    ((3, 3, 1, 5, 1), NOOP, SOUTH), ((3, 3, 2, 5, 1), NOOP, SOUTH),
]


@pytest.mark.parametrize("state,aa,ab", SLIP_GOAL_CASES)
def test_slip_into_goal(state, aa, ab):
    # Moving N/S beside the goal mouth with the ball: P(slip into goal)
    # = slip/2 = 0.1.
    new, out = inject_and_step(state, aa, ab)
    ratio = out.done.mean()
    assert 0.09 <= ratio <= 0.11, ratio


@pytest.mark.parametrize("state,aa,ab", [
    ((0, 2, 3, 3, 0), NORTH, NOOP), ((0, 3, 3, 3, 0), NORTH, NOOP),
    ((3, 3, 0, 2, 1), NOOP, NORTH), ((3, 3, 0, 3, 1), NOOP, NORTH),
    ((3, 2, 0, 3, 0), SOUTH, NOOP), ((3, 3, 0, 3, 0), SOUTH, NOOP),
    ((0, 3, 3, 2, 0), NOOP, SOUTH), ((0, 3, 3, 3, 0), NOOP, SOUTH),
])
def test_bounce_off_horizontal_edges(state, aa, ab):
    # Pushing into the top/bottom wall: stays with prob 1-slip = 0.8.
    new, out = inject_and_step(state, aa, ab)
    stay = unchanged(new, state).mean()
    assert 0.79 <= stay <= 0.81, stay
    assert 0.19 <= 1 - stay <= 0.21


@pytest.mark.parametrize("state,a", [
    ((0, 1, 3, 3, 1), WEST),   # corner-ish against left goal wall
    ((3, 5, 0, 3, 1), EAST),   # against right goal wall
])
def test_bounce_off_goal_walls(state, a):
    # Pushing into a goal wall without the ball: stays with prob 0.9
    # (only the unclamped orthogonal slip escapes).
    new, out = inject_and_step(state, a, NOOP)
    stay = unchanged(new, state).mean()
    assert 0.89 <= stay <= 0.91, stay


@pytest.mark.parametrize("state,aa,ab", [
    ((2, 2, 2, 3, 0), NORTH, NOOP), ((2, 2, 2, 3, 1), NORTH, NOOP),
    ((2, 3, 2, 2, 0), NOOP, NORTH), ((2, 3, 2, 2, 1), NOOP, NORTH),
])
def test_collision_through_slip(state, aa, ab):
    # A mover beside a stander: P(slip into the stander) = slip/2 = 0.1,
    # causing a positional no-op (collision case 2).
    new, out = inject_and_step(state, aa, ab)
    pos_same = ((new.rows_a == state[0]) & (new.cols_a == state[1]) &
                (new.rows_b == state[2]) & (new.cols_b == state[3]))
    assert np.isclose(pos_same.mean(), 0.1, atol=0.02)


def test_no_slip_on_stand():
    # NOOP's orthogonal "slips" are NOOP itself: joint standing never moves.
    state = (1, 2, 3, 4, 0)
    new, out = inject_and_step(state, NOOP, NOOP)
    assert unchanged(new, state).all()


@pytest.mark.parametrize("state,aa,ab", [
    ((1, 1, 1, 3, 0), EAST, WEST),    # race to the same cell
    ((1, 2, 1, 3, 1), EAST, WEST),    # swap-through
    ((2, 2, 2, 3, 0), NORTH, NOOP),   # slip-into-stander
    ((1, 1, 3, 3, 0), NORTH, NOOP),   # slip beside own goal
    ((2, 3, 1, 2, 1), SOUTH, EAST),   # generic mid-pitch joint move
])
def test_kernel_matches_exact_table_distribution(state, aa, ab):
    """The in-kernel factored sampler must reproduce the reference's exact
    per-(state, joint action) next-state distribution.  Ground truth is the
    float64 transition tensor (itself digest-verified against the executed
    reference); empirical frequencies must sit within 5 sigma."""
    from gym_soccer_tpu.core import rules
    from gym_soccer_tpu.core.tables import build_tables

    tb = build_tables(CFG)
    s = int(tb.raw_to_dense[rules.raw_encode(np, *state, CFG)])
    row = aa * 5 + ab
    probs = tb.t_prob[s, row]
    raws = tb.t_next_raw[s, row]
    exact = {}
    for p, r in zip(probs, raws):
        if p > 0:
            exact[int(r)] = exact.get(int(r), 0.0) + float(p)

    new, out = inject_and_step(state, aa, ab)
    got_raw = np.asarray(rules.raw_encode(
        np, new.rows_a, new.cols_a, new.rows_b, new.cols_b, new.poss, CFG))
    counts = dict(zip(*[a.tolist() for a in np.unique(got_raw,
                                                      return_counts=True)]))
    assert set(counts) <= set(exact), \
        f"kernel produced impossible next states: {set(counts) - set(exact)}"
    for r, p in exact.items():
        emp = counts.get(r, 0) / N
        sigma = max(np.sqrt(p * (1 - p) / N), 1e-9)
        assert abs(emp - p) < 5 * sigma + 1e-12, \
            f"state {r}: empirical {emp:.5f} vs exact {p:.5f}"

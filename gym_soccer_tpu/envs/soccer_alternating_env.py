"""Alternating-turn soccer environment.

Reference counterpart: /root/reference/gym_soccer/envs/soccer_alternating_env.py
(`SoccerGridWorld`) — an untested, unexported prototype.  Per SURVEY.md
§2.9/§7.4 it is a *capability signal* (turn-taking mode), to be
reimplemented sanely rather than bug-for-bug.  Differences from the
prototype's quirks, on purpose:

* goal geometry matches the simultaneous env (goal rows x goal columns,
  possession required) instead of the prototype's whole-edge goals
  (soccer_alternating_env.py:174-189);
* randomness is sampled at step time from the env's seeded RNG, not baked
  into the transition table at build time (:200);
* the state space/`nS` accounting is consistent (the prototype's
  `n_states` is wrong, :27); a constructor seed exists (:24 has none).

Semantics: players move one at a time; ``who_moves_next`` is part of the
state.  The mover's displacement may slip orthogonally (prob `slip_prob`,
split 50/50).  Moving into the opponent's cell bounces back and hands them
possession (the prototype's steal rule, :161-169); board edges and goal
walls bounce like the simultaneous env.  Carrying the ball into a goal
cell ends the episode with the A-perspective reward +-1.

Both a single-env class (dict API mirroring the simultaneous facade) and a
batched jit/vmap kernel (`alt_step`) are provided.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import spaces
from ..config import MOVES, EnvConfig, orthogonal_moves
from ..core import rules


def _mover_next_cell(xp, x, y, mc, mr, has_ball, cfg):
    return rules.next_cell(xp, x, y, mc, mr, has_ball, cfg)


def alt_transition(xp, xa, ya, xb, yb, p, turn, action, mc, mr, cfg):
    """Pure single-move resolution (broadcastable).  ``turn`` 0 = A moves.

    Returns (nxa, nya, nxb, nyb, npz, nturn)."""
    mover_x = xp.where(turn == 0, xa, xb)
    mover_y = xp.where(turn == 0, ya, yb)
    opp_x = xp.where(turn == 0, xb, xa)
    opp_y = xp.where(turn == 0, yb, ya)
    has_ball = p == turn

    nx, ny = _mover_next_cell(xp, mover_x, mover_y, mc, mr, has_ball, cfg)

    # Steal rule: stepping into the opponent bounces back and flips
    # possession to the opponent.
    collide = (nx == opp_x) & (ny == opp_y)
    nx = xp.where(collide, mover_x, nx)
    ny = xp.where(collide, mover_y, ny)
    npz = xp.where(collide, 1 - turn, p)

    nxa = xp.where(turn == 0, nx, xa)
    nya = xp.where(turn == 0, ny, ya)
    nxb = xp.where(turn == 0, xb, nx)
    nyb = xp.where(turn == 0, yb, ny)
    return nxa, nya, nxb, nyb, npz, 1 - turn


class AltEnvState(NamedTuple):
    rows_a: jax.Array
    cols_a: jax.Array
    rows_b: jax.Array
    cols_b: jax.Array
    poss: jax.Array
    turn: jax.Array
    t: jax.Array
    n: jax.Array
    key: jax.Array


def alt_init(cfg: EnvConfig, key: jax.Array, batch: int,
             first_mover: int = 0) -> AltEnvState:
    from ..core import batch as corebatch
    st = corebatch.init(cfg, key, batch)
    return AltEnvState(rows_a=st.rows_a, cols_a=st.cols_a, rows_b=st.rows_b,
                       cols_b=st.cols_b, poss=st.poss,
                       turn=jnp.full_like(st.poss, first_mover),
                       t=st.t, n=st.n, key=st.key)


def alt_step(cfg: EnvConfig, state: AltEnvState, action: jax.Array,
             autoreset: bool = True):
    """Batched alternating-turn step for the current mover of each lane."""
    from ..core import batch as corebatch
    env_view = corebatch.EnvState(state.rows_a, state.cols_a, state.rows_b,
                                  state.cols_b, state.poss, state.t,
                                  state.n, state.key)
    u = corebatch.per_env_uniforms(env_view, 2)
    variant = corebatch._slip_variant(cfg, u[:, 0])
    mc, mr = corebatch._slipped_move_arith(action, variant)

    nra, nca, nrb, ncb, npz, nturn = alt_transition(
        jnp, state.rows_a, state.cols_a, state.rows_b, state.cols_b,
        state.poss, state.turn, action, mc, mr, cfg)

    now_goal = rules.is_goal_state(jnp, nra, nca, nrb, ncb, npz, cfg)
    ball_col = jnp.where(npz == 0, nca, ncb)
    reward_a = jnp.where(
        now_goal, jnp.where(ball_col == cfg.W - 1, 1.0, -1.0), 0.0
    ).astype(jnp.float32)

    t = state.t + 1
    truncated = t >= cfg.max_steps
    mid = AltEnvState(nra, nca, nrb, ncb, npz, nturn, t, state.n + 1,
                      state.key)
    if autoreset:
        term = now_goal | truncated
        env_mid = corebatch.EnvState(mid.rows_a, mid.cols_a, mid.rows_b,
                                     mid.cols_b, mid.poss, mid.t, mid.n,
                                     mid.key)
        env_new = corebatch._reset_where(cfg, env_mid, term)
        mid = AltEnvState(env_new.rows_a, env_new.cols_a, env_new.rows_b,
                          env_new.cols_b, env_new.poss,
                          jnp.where(term, 0, mid.turn),
                          env_new.t, env_new.n, mid.key)
    return mid, (reward_a, now_goal, truncated)


class SoccerAlternatingEnv:
    """Single-env alternating-turn facade (dict API like the simultaneous
    facade; one agent acts per step — the one named by `current_player`)."""

    NOOP, NORTH, SOUTH, EAST, WEST = 0, 1, 2, 3, 4
    ACTION_STRING = ['NOOP', 'NORTH', 'SOUTH', 'EAST', 'WEST']

    def __init__(self, width=5, height=4, slip_prob=0.0, seed=0,
                 first_mover=0, max_steps=100):
        assert width >= 5, "Width must be at least 5 columns."
        assert height >= 4, "Height must be at least 4 rows."
        self.cfg = EnvConfig(width=width, height=height,
                             slip_prob=float(slip_prob),
                             max_steps=int(max_steps))
        self.width, self.height = self.cfg.W, self.cfg.H
        self.slip_prob = float(slip_prob)
        self.goal_rows, self.goal_cols = self.cfg.goal_rows, self.cfg.goal_cols
        self.np_random = np.random.RandomState(seed)
        self.first_mover = first_mover
        self.agents = ['player_a', 'player_b']
        obs_nvec = (self.height, self.width, self.height, self.width, 2)
        self.observation_space = spaces.Dict({
            a: spaces.MultiDiscrete(obs_nvec) for a in self.agents})
        self.action_space = spaces.Dict({
            a: spaces.Discrete(5) for a in self.agents})
        self._isd = self._make_isd()
        self.state = None            # (xa, ya, xb, yb, p, turn)
        self.needs_reset = True
        self.timestep = 0
        self.lastaction = None

    def _make_isd(self):
        from ..core.tables import build_isd
        probs, raws = build_isd(self.cfg)
        return [(float(p), rules.raw_decode(np, int(r), self.cfg))
                for p, r in zip(probs, raws)]

    @property
    def current_player(self):
        assert self.state is not None, "reset first"
        return 'player_a' if self.state[5] == 0 else 'player_b'

    def _obs(self):
        xa, ya, xb, yb, p, turn = self.state
        # Egocentric tuples: own position first, own-possession bit.
        return {
            'player_a': (xa, ya, xb, yb, 1 if p == 0 else 0),
            'player_b': (xb, yb, xa, ya, 1 if p == 1 else 0),
        }

    def reset(self, seed=None, options=None):
        if seed is not None:
            self.np_random.seed(seed)
        u = self.np_random.random()
        cum = np.cumsum([p for p, _ in self._isd])
        i = int(np.argmax(cum > u))
        _, st = self._isd[i]
        self.state = (*st, self.first_mover)
        self.needs_reset = False
        self.timestep = 0
        self.lastaction = None
        return self._obs(), {a: {} for a in self.agents}

    def step(self, action: int):
        """`action` is the CURRENT mover's action (int)."""
        assert not self.needs_reset, "reset the environment first"
        xa, ya, xb, yb, p, turn = self.state
        mc, mr = MOVES[action]
        u = self.np_random.random()
        if u >= 1.0 - self.slip_prob:
            o0, o1 = orthogonal_moves((mc, mr))
            mc, mr = o0 if u < 1.0 - self.slip_prob * 0.5 else o1
        nxa, nya, nxb, nyb, npz, nturn = alt_transition(
            np, xa, ya, xb, yb, p, turn, action, mc, mr, self.cfg)
        state = tuple(int(v) for v in (nxa, nya, nxb, nyb, npz, nturn))
        self.state = state
        self.lastaction = action
        self.timestep += 1
        done = bool(rules.is_goal_state(np, *state[:5], self.cfg))
        ball_col = state[1] if state[4] == 0 else state[3]
        reward_a = (0.0 if not done
                    else 1.0 if ball_col == self.cfg.W - 1 else -1.0)
        truncated = self.timestep >= self.cfg.max_steps
        self.needs_reset = done or truncated
        rewards = {'player_a': reward_a, 'player_b': -reward_a}
        dones = {a: done for a in self.agents}
        truncs = {a: truncated for a in self.agents}
        return self._obs(), rewards, dones, truncs, {a: {} for a in self.agents}

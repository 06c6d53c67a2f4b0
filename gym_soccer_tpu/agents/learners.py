"""On-device tabular self-play learners, fused with batched rollouts.

The reference has NO learners (its solution layer is DP planning over the
exposed tables; SURVEY.md §2.10a requires these as TPU-native additions):

* **Independent Q-learning** — two Q-tables (player A maximizes r, player B
  maximizes -r), epsilon-greedy behavior, batched TD(0) updates applied as
  scatter-adds over the lockstep batch, the whole (rollout chunk + update)
  loop living inside one `lax.scan` under jit.

* **Minimax-Q** (Littman 1994 — the algorithm this environment was built
  for) — joint table Q[s, aa, ab] for player A; V and mixed strategies come
  from solving the 5x5 zero-sum matrix game at every state.  TPU-idiomatic
  schedule: transitions stream into Q via scatter-adds, and the per-state
  game solves are batched over ALL nS states at once every `resolve_every`
  steps (761 simultaneous 5x5 solves are one tiny fused kernel) instead of
  the classical per-visit LP.

Data parallelism: `psum_axis` names a mesh axis to all-reduce Q-table
*deltas* over, keeping replicated tables consistent across env shards
(SURVEY.md §5.8) while each shard steps its own envs.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import EnvConfig, N_ACTIONS
from ..core import batch, tables


# ----------------------------------------------------------------------
# Zero-sum matrix-game solver (batched)
# ----------------------------------------------------------------------

def solve_matrix_games(M: jax.Array, iters: int = 100,
                       eta: float = 0.5) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Approximately solve max_x min_y x^T M y for a batch of zero-sum
    games M [..., nA, nA] via multiplicative-weights self-play with
    iterate averaging (O(1/sqrt(T)) duality gap; `iters`=100 is ~1e-2
    on [-1,1]-bounded games, plenty for control).

    Returns (value, x, y): the game values [...] and the average mixed
    strategies for the row maximizer / column minimizer [..., nA].
    """
    nA = M.shape[-1]
    shape = M.shape[:-2]

    def body(carry, _):
        lx, ly, sx, sy = carry
        x = jax.nn.softmax(lx, axis=-1)
        y = jax.nn.softmax(ly, axis=-1)
        # row player ascends payoff M y; column player descends x^T M
        gx = jnp.einsum('...ij,...j->...i', M, y)
        gy = jnp.einsum('...i,...ij->...j', x, M)
        return (lx + eta * gx, ly - eta * gy, sx + x, sy + y), None

    zeros = jnp.zeros(shape + (nA,), M.dtype)
    (lx, ly, sx, sy), _ = jax.lax.scan(
        body, (zeros, zeros, zeros, zeros), None, length=iters)
    x = sx / iters
    y = sy / iters
    value = jnp.einsum('...i,...ij,...j->...', x, M, y)
    return value, x, y


# ----------------------------------------------------------------------
# Independent Q-learning
# ----------------------------------------------------------------------

class IQLState(NamedTuple):
    q_a: jax.Array      # [nS, 5]
    q_b: jax.Array      # [nS, 5]
    env: batch.EnvState
    step: jax.Array     # int32 scalar


class IQLConfig(NamedTuple):
    lr: float = 0.1
    gamma: float = 0.99
    eps: float = 0.1


def iql_init(cfg: EnvConfig, key: jax.Array, n_envs: int) -> IQLState:
    nS = tables.build_tables(cfg).nS
    return IQLState(
        q_a=jnp.zeros((nS, N_ACTIONS), jnp.float32),
        q_b=jnp.zeros((nS, N_ACTIONS), jnp.float32),
        env=batch.init(cfg, key, n_envs),
        step=jnp.int32(0),
    )


def _eps_greedy(q_row: jax.Array, u_explore: jax.Array,
                u_action: jax.Array, eps: float) -> jax.Array:
    greedy = jnp.argmax(q_row, axis=-1).astype(jnp.int32)
    rand = (u_action * N_ACTIONS).astype(jnp.int32) % N_ACTIONS
    return jnp.where(u_explore < eps, rand, greedy)


def iql_step(cfg: EnvConfig, lcfg: IQLConfig, state: IQLState,
             psum_axis: Optional[str] = None
             ) -> tuple[IQLState, jax.Array]:
    """One fused act/step/update for the whole batch.  Returns mean |TD|.

    Action exploration draws from the env instances' own salted key streams
    (batch.per_env_uniforms) — placement-invariant and shard-safe."""
    obs = batch.observe(cfg, state.env)
    u = batch.per_env_uniforms(state.env, 4, salt=1).T
    aa = _eps_greedy(state.q_a[obs], u[0], u[1], lcfg.eps)
    ab = _eps_greedy(state.q_b[obs], u[2], u[3], lcfg.eps)

    env2, out = batch.step(cfg, state.env, aa, ab)
    term = out.done | out.truncated
    cont = jnp.where(term, 0.0, 1.0)

    # TD targets; B sees the negated reward (zero-sum, reference :400-402)
    tgt_a = out.reward_a + lcfg.gamma * cont * state.q_a[out.final_obs].max(-1)
    tgt_b = -out.reward_a + lcfg.gamma * cont * state.q_b[out.final_obs].max(-1)
    td_a = tgt_a - state.q_a[obs, aa]
    td_b = tgt_b - state.q_b[obs, ab]

    # Scatter-add deltas; all-reduce across env shards so replicated
    # tables stay identical (delta-psum == averaging per-shard updates
    # up to learning-rate scale).
    delta_a = jnp.zeros_like(state.q_a).at[obs, aa].add(lcfg.lr * td_a)
    delta_b = jnp.zeros_like(state.q_b).at[obs, ab].add(lcfg.lr * td_b)
    if psum_axis is not None:
        delta_a = jax.lax.psum(delta_a, psum_axis)
        delta_b = jax.lax.psum(delta_b, psum_axis)

    new = IQLState(q_a=state.q_a + delta_a, q_b=state.q_b + delta_b,
                   env=env2, step=state.step + 1)
    return new, (jnp.abs(td_a).mean() + jnp.abs(td_b).mean()) * 0.5


def iql_train(cfg: EnvConfig, lcfg: IQLConfig, state: IQLState,
              n_steps: int,
              psum_axis: Optional[str] = None) -> tuple[IQLState, jax.Array]:
    """`lax.scan` over fused learner steps (jit this)."""
    def body(carry, _):
        return iql_step(cfg, lcfg, carry, psum_axis)

    return jax.lax.scan(body, state, None, length=n_steps)


# ----------------------------------------------------------------------
# Minimax-Q (Littman 1994)
# ----------------------------------------------------------------------

class MinimaxQState(NamedTuple):
    q: jax.Array        # [nS, 5, 5] — player-A payoff of joint actions
    v: jax.Array        # [nS] — current game values
    pi_a: jax.Array     # [nS, 5] — A's maximin mixed strategy
    pi_b: jax.Array     # [nS, 5] — B's minimax mixed strategy
    env: batch.EnvState
    step: jax.Array


class MinimaxQConfig(NamedTuple):
    lr: float = 0.1
    gamma: float = 0.99
    eps: float = 0.2          # exploration mixed into the policies
    resolve_every: int = 32   # batched all-state game re-solve cadence
    solver_iters: int = 60


def minimax_init(cfg: EnvConfig, key: jax.Array, n_envs: int) -> MinimaxQState:
    nS = tables.build_tables(cfg).nS
    uniform = jnp.full((nS, N_ACTIONS), 1.0 / N_ACTIONS, jnp.float32)
    return MinimaxQState(
        q=jnp.zeros((nS, N_ACTIONS, N_ACTIONS), jnp.float32),
        v=jnp.zeros(nS, jnp.float32),
        pi_a=uniform, pi_b=uniform,
        env=batch.init(cfg, key, n_envs),
        step=jnp.int32(0),
    )


def _sample_mixed(pi_rows: jax.Array, u: jax.Array) -> jax.Array:
    """Sample actions from per-env mixed strategies [B, nA]."""
    cum = jnp.cumsum(pi_rows, axis=-1)
    return jnp.minimum(jnp.sum(cum <= u[:, None], axis=-1),
                       N_ACTIONS - 1).astype(jnp.int32)


def minimax_step(cfg: EnvConfig, lcfg: MinimaxQConfig, state: MinimaxQState,
                 psum_axis: Optional[str] = None
                 ) -> tuple[MinimaxQState, jax.Array]:
    obs = batch.observe(cfg, state.env)
    u = batch.per_env_uniforms(state.env, 2, salt=1).T
    nA = N_ACTIONS
    explore = lcfg.eps / nA
    pa = state.pi_a[obs] * (1 - lcfg.eps) + explore
    pb = state.pi_b[obs] * (1 - lcfg.eps) + explore
    aa = _sample_mixed(pa, u[0])
    ab = _sample_mixed(pb, u[1])

    env2, out = batch.step(cfg, state.env, aa, ab)
    term = out.done | out.truncated
    cont = jnp.where(term, 0.0, 1.0)
    tgt = out.reward_a + lcfg.gamma * cont * state.v[out.final_obs]
    td = tgt - state.q[obs, aa, ab]

    delta = jnp.zeros_like(state.q).at[obs, aa, ab].add(lcfg.lr * td)
    if psum_axis is not None:
        delta = jax.lax.psum(delta, psum_axis)
    q = state.q + delta

    # Periodic batched re-solve of ALL state games (761 x 5x5 at once).
    def resolve(qv):
        value, x, y = solve_matrix_games(qv, iters=lcfg.solver_iters)
        return value, x, y

    do = (state.step % lcfg.resolve_every) == (lcfg.resolve_every - 1)
    v, pi_a, pi_b = jax.lax.cond(
        do, resolve, lambda qv: (state.v, state.pi_a, state.pi_b), q)

    new = MinimaxQState(q=q, v=v, pi_a=pi_a, pi_b=pi_b, env=env2,
                        step=state.step + 1)
    return new, jnp.abs(td).mean()


def minimax_train(cfg: EnvConfig, lcfg: MinimaxQConfig,
                  state: MinimaxQState, n_steps: int,
                  psum_axis: Optional[str] = None
                  ) -> tuple[MinimaxQState, jax.Array]:
    def body(carry, _):
        return minimax_step(cfg, lcfg, carry, psum_axis)

    return jax.lax.scan(body, state, None, length=n_steps)

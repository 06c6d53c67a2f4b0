"""Data parallelism over the env batch via jax.sharding.

The reference is single-process/single-thread (SURVEY.md §5.8: no
communication backend at all); here the scale axis is the env batch
(§5.7 — there are no model weights or sequences to shard, so TP/PP/SP/EP
do not apply; see docs/PARALLELISM.md).  Design:

* a 1-D device mesh with axis ``env``;
* `EnvState` leaves sharded on their leading (batch) dim — env shards are
  embarrassingly parallel, XLA inserts zero collectives for stepping;
* learner Q-tables replicated; their per-step update deltas all-reduced
  with `psum` inside `shard_map`, riding ICI within a slice;
* per-instance keys (fold_in of global instance id) make every env's
  stream placement-invariant: the same instance behaves identically on
  1 device or N, on any host (§7.3.7).

Multi-host: call `distributed_init()` once per process, then build the
mesh over `jax.devices()` (all hosts); per-host addressable shards follow
from the sharding.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EnvConfig
from ..core import batch


def distributed_init(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-host JAX runtime (no-op for single process).
    Replaces the reference's (absent) NCCL/MPI layer with JAX's
    distributed runtime over ICI/DCN."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)


def env_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "env") -> NamedSharding:
    """Leading-dim sharding for every EnvState leaf / per-env array."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_env_state(state: batch.EnvState, mesh: Mesh,
                    axis: str = "env") -> batch.EnvState:
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def sharded_init(cfg: EnvConfig, mesh: Mesh, key: jax.Array, n_envs: int,
                 axis: str = "env"):
    """jit-compiled env init with the batch laid out across the mesh.
    Instance ids are global, so the result is placement-invariant."""
    sh = batch_sharding(mesh, axis)
    fn = jax.jit(lambda k: batch.init(cfg, k, n_envs),
                 out_shardings=batch.EnvState(*([sh] * 8)))
    return fn(key)


def sharded_rollout_fn(cfg: EnvConfig, mesh: Mesh, policy_fn, n_steps: int,
                       axis: str = "env"):
    """jit a rollout whose env batch stays sharded over the mesh.  Stepping
    is elementwise over the batch, so XLA compiles it collective-free; only
    the summary reduction at the end crosses shards."""
    sh = batch_sharding(mesh, axis)
    state_sh = batch.EnvState(*([sh] * 8))

    def fn(state):
        state, out = batch.rollout(cfg, state, policy_fn, n_steps)
        return state, (out.reward_a.sum(), out.done.sum(),
                       out.truncated.sum())

    return jax.jit(fn, in_shardings=(state_sh,),
                   out_shardings=(state_sh, None))


def _env_specs(axis: str):
    from ..core.batch import EnvState
    return EnvState(*([P(axis)] * 8))


def sharded_iql_train_fn(cfg: EnvConfig, lcfg, mesh: Mesh, n_steps: int,
                         axis: str = "env"):
    """Data-parallel fused IQL training: env batch sharded over the mesh,
    Q-tables replicated, per-step deltas all-reduced with psum over ICI."""
    from ..agents import learners

    specs = learners.IQLState(q_a=P(), q_b=P(), env=_env_specs(axis),
                              step=P())

    def local(state):
        st, td = learners.iql_train(cfg, lcfg, state, n_steps,
                                    psum_axis=axis)
        return st, jax.lax.pmean(td, axis)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(specs,),
                       out_specs=(specs, P()))
    return jax.jit(fn)


def sharded_minimax_train_fn(cfg: EnvConfig, lcfg, mesh: Mesh, n_steps: int,
                             axis: str = "env"):
    """Data-parallel fused minimax-Q training (same layout as IQL; the
    periodic all-state game re-solve runs replicated on every shard)."""
    from ..agents import learners

    specs = learners.MinimaxQState(q=P(), v=P(), pi_a=P(), pi_b=P(),
                                   env=_env_specs(axis), step=P(), n=P())

    def local(state):
        st, td = learners.minimax_train(cfg, lcfg, state, n_steps,
                                        psum_axis=axis)
        return st, jax.lax.pmean(td, axis)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(specs,),
                       out_specs=(specs, P()))
    return jax.jit(fn)


def sharded_altq_train_fn(cfg: EnvConfig, lcfg, mesh: Mesh, n_steps: int,
                          axis: str = "env"):
    """Data-parallel fused alternating-turn Q-learning (same layout:
    env lanes sharded, the single Q-table replicated via delta-psum)."""
    from ..agents import learners
    from ..envs.soccer_alternating_env import AltEnvState

    specs = learners.AltQState(q=P(), env=AltEnvState(*([P(axis)] * 9)),
                               step=P())

    def local(state):
        st, td = learners.altq_train(cfg, lcfg, state, n_steps,
                                     psum_axis=axis)
        return st, jax.lax.pmean(td, axis)

    fn = jax.shard_map(local, mesh=mesh, in_specs=(specs,),
                       out_specs=(specs, P()))
    return jax.jit(fn)

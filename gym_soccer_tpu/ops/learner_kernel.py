"""Fused pallas minimax-Q actor/TD kernel.

The XLA learner path tops out at the generic engine's per-step overhead
(~8-12M env-steps/s).  This kernel runs whole act->step->TD chunks
on-chip, expressing every table interaction as an MXU matmul (the
TPU-native form of gather/scatter):

* pi_a / pi_b / Q / v are packed into one VMEM matrix M [SPAD, 128],
  indexed by RAW state code (padded to a lane multiple) — raw indexing
  needs no dense-lookup gather at all; unreachable rows are simply dead;
* per step, per lane block: one_hot(raw) @ M fetches each env's policy
  rows, Q row and (with the post-step one-hot) v[next] — two matmuls;
* TD sums and visit counts accumulate into acc [SPAD, 128] via a
  one_hot^T @ packed-columns matmul (cols 0:25 sum-TD, 32:57 counts);
* the env transition is ops/step_kernel.transition_core (same branchless
  chain and counter PRNG as the 11B-steps/s rollout kernel).

M (and therefore the TD baseline) is FROZEN within a chunk; the wrapper
(`fused_minimax_train`) applies the count-normalized Q update and the
RM+ game re-solve between chunks — the same cadence as
agents/learners.minimax_train with `resolve_every` == chunk length.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EnvConfig, N_ACTIONS
from . import step_kernel as sk

LANES = 128
RB = 4                       # lane-block rows per matmul (512 lanes; RB=8 overflows VMEM)
NJ = N_ACTIONS * N_ACTIONS   # 25 joint actions
COL_PI_A, COL_PI_B, COL_Q, COL_V = 0, 5, 10, 35
ACC_TD, ACC_CNT = 0, 32


def spad(cfg: EnvConfig) -> int:
    return -(-cfg.n_raw // LANES) * LANES


def _learner_kernel(seed_ref, m_ref, ra_ref, ca_ref, rb_ref, cb_ref,
                    p_ref, t_ref,
                    ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                    *, cfg: EnvConfig, n_steps: int, q_int: int,
                    gamma: float):
    seed = seed_ref[0].astype(jnp.uint32)
    R = ra_ref.shape[0]
    n_blocks = R // RB
    SP = m_ref.shape[0]
    blk_shape = (RB, LANES)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    rows_iota = jax.lax.broadcasted_iota(jnp.uint32, blk_shape, 0)
    cols_iota = jax.lax.broadcasted_iota(jnp.uint32, blk_shape, 1)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, blk_shape + (SP,), 2)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, blk_shape + (LANES,), 2)
    M = m_ref[:].astype(jnp.bfloat16)  # gather operands in bf16 (4x MXU
    # rate; one-hots are exact in bf16, and policy/Q/v values tolerate
    # ~0.4% rounding — the TD accumulator itself stays f32)

    def raw_of(ra, ca, rb, cb, p):
        from ..core import rules
        return rules.raw_encode(jnp, ra, ca, rb, cb, p, cfg)

    def gather_rows(raw):
        """one_hot(raw) @ M -> [RB, 128, 128] (policy/Q/v columns)."""
        oh = (s_iota == raw[..., None]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, M, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def sample5(pre, base, u01):
        """First-exceedance sample from 5 probability columns of pre."""
        c = pre[..., base]
        total = c
        for k in range(1, N_ACTIONS):
            total = total + pre[..., base + k]
        target = u01 * total
        a = jnp.zeros(blk_shape, jnp.int32)
        c = pre[..., base]
        for k in range(1, N_ACTIONS):
            a = a + (c <= target).astype(jnp.int32)
            c = c + pre[..., base + k]
        return a

    def body(i, carry):
        rew_acc, goal_acc, trunc_acc = carry

        def block(blk, inner):
            rew_acc, goal_acc, trunc_acc = inner
            sl = pl.ds(blk * RB, RB)
            ra, ca = ra_ref[sl, :], ca_ref[sl, :]
            rb, cb = rb_ref[sl, :], cb_ref[sl, :]
            p, t = p_ref[sl, :], t_ref[sl, :]

            lane = ((blk.astype(jnp.uint32) * RB + rows_iota)
                    * jnp.uint32(LANES) + cols_iota)
            bits0 = sk._random_word(seed, i, 0, lane)
            bits1 = sk._random_word(seed, i, 1, lane)
            bits2 = sk._random_word(seed, i, 2, lane)

            raw = raw_of(ra, ca, rb, cb, p)
            pre = gather_rows(raw)

            inv = jnp.float32(1.0 / 65536.0)
            ua = sk._u16(bits0, 0).astype(jnp.float32) * inv
            ub = sk._u16(bits0, 1).astype(jnp.float32) * inv
            aa = sample5(pre, COL_PI_A, ua)
            ab = sample5(pre, COL_PI_B, ub)

            nra, nca, nrb, ncb, npz, goal, r = sk.transition_core(
                ra, ca, rb, cb, p, aa, ab, bits1, bits2, cfg, q_int)
            raw_next = raw_of(nra, nca, nrb, ncb, npz)
            post = gather_rows(raw_next)
            v_next = post[..., COL_V]

            nra, nca, nrb, ncb, npz, t2, trunc = sk.autoreset_core(
                nra, nca, nrb, ncb, npz, t, goal, bits2, cfg)

            ja = aa * N_ACTIONS + ab
            q_cur = jnp.zeros(blk_shape, jnp.float32)
            for j in range(NJ):
                q_cur = q_cur + jnp.where(
                    ja == j, pre[..., COL_Q + j], 0.0)

            term = goal | trunc
            cont = jnp.where(term, 0.0, jnp.float32(gamma))
            td = r.astype(jnp.float32) + cont * v_next - q_cur

            # packed accumulation columns: [0:25] sum-TD, [32:57] counts
            oh_td = (c_iota == (ja[..., None] + ACC_TD)).astype(jnp.float32)
            oh_ct = (c_iota == (ja[..., None] + ACC_CNT)).astype(jnp.float32)
            X = (oh_td * td[..., None] + oh_ct).astype(jnp.bfloat16)
            oh_s = (s_iota == raw[..., None]).astype(jnp.bfloat16)
            # Mosaic supports single contracting dims only: unroll the
            # block-row axis into RB transposed matmuls [SP,128] each.
            upd = acc_ref[:]
            for rr in range(RB):
                upd = upd + jax.lax.dot_general(
                    oh_s[rr], X[rr], (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc_ref[:] = upd

            ra_ref[sl, :], ca_ref[sl, :] = nra, nca
            rb_ref[sl, :], cb_ref[sl, :] = nrb, ncb
            p_ref[sl, :], t_ref[sl, :] = npz, t2

            return (rew_acc + jnp.sum(r),
                    goal_acc + jnp.sum(goal.astype(jnp.int32)),
                    trunc_acc + jnp.sum(trunc.astype(jnp.int32)))

        return jax.lax.fori_loop(0, n_blocks, block, carry)

    z = jnp.int32(0)
    rew, goals, truncs = jax.lax.fori_loop(0, n_steps, body, (z, z, z))
    ora[:], oca[:] = ra_ref[:], ca_ref[:]
    orb[:], ocb[:] = rb_ref[:], cb_ref[:]
    op[:], ot[:] = p_ref[:], t_ref[:]
    stats_ref[0, 0] = rew
    stats_ref[0, 1] = goals
    stats_ref[0, 2] = truncs


@functools.partial(jax.jit, static_argnames=("cfg", "batch", "n_steps",
                                             "gamma", "interpret"))
def learner_chunk(cfg: EnvConfig, seed, m_packed, state_fields,
                  batch: int, n_steps: int, gamma: float = 0.99,
                  interpret: bool = False):
    """Run one fused chunk.  ``m_packed`` [spad(cfg), 128] float32 (see
    module docstring); ``state_fields`` = 6 int32 [batch/128, 128] arrays.
    Returns (new_fields, acc [spad, 128], stats[3])."""
    assert batch % (RB * LANES) == 0
    shape = (batch // LANES, LANES)
    SP = spad(cfg)
    # M + acc are VMEM-resident [SP, 128] f32 planes; beyond ~14 MB total
    # Mosaic cannot place them.  The generic XLA learner (agents/learners)
    # has no such limit — it keeps tables in HBM.
    vmem_mb = 2 * SP * LANES * 4 / 2**20
    if vmem_mb > 14:
        raise ValueError(
            f"grid too large for the fused learner kernel: packed tables "
            f"need ~{vmem_mb:.0f} MB of VMEM (raw state space {cfg.n_raw}); "
            f"use agents.learners.minimax_train (HBM tables) instead")
    q_int = int(round(cfg.slip_prob * 65536))
    kernel = functools.partial(
        _learner_kernel, cfg=cfg, n_steps=n_steps, q_int=q_int, gamma=gamma)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 6 +
                  [jax.ShapeDtypeStruct((SP, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, 4), jnp.int32)])
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 +
                        [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        input_output_aliases={2 + i: i for i in range(6)},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), m_packed, *state_fields)
    *fields, acc, stats = outs
    return tuple(fields), acc, (stats[0, 0], stats[0, 1], stats[0, 2])


# ----------------------------------------------------------------------
# Chunked training wrapper
# ----------------------------------------------------------------------

def _raw_rows(cfg: EnvConfig) -> np.ndarray:
    """Raw code of each dense state (dense row -> raw row of M)."""
    from ..core import tables
    return tables.build_statespace(cfg).dense_to_raw


def pack_m(cfg: EnvConfig, pi_a, pi_b, q, v, eps: float) -> jnp.ndarray:
    """Pack (exploration-mixed) policies, Q and v into the kernel's
    raw-indexed M [spad, 128]."""
    SP = spad(cfg)
    rows = jnp.asarray(_raw_rows(cfg))
    explore = eps / N_ACTIONS
    m = jnp.zeros((SP, LANES), jnp.float32)
    m = m.at[rows, COL_PI_A:COL_PI_A + 5].set(pi_a * (1 - eps) + explore)
    m = m.at[rows, COL_PI_B:COL_PI_B + 5].set(pi_b * (1 - eps) + explore)
    m = m.at[rows, COL_Q:COL_Q + NJ].set(q.reshape(q.shape[0], NJ))
    m = m.at[rows, COL_V].set(v)
    return m


def unpack_acc(cfg: EnvConfig, acc) -> tuple[jnp.ndarray, jnp.ndarray]:
    """acc [spad, 128] -> dense (sum_td, cnt), each [nS, 5, 5]."""
    rows = jnp.asarray(_raw_rows(cfg))
    nS = rows.shape[0]
    sum_td = acc[rows, ACC_TD:ACC_TD + NJ].reshape(nS, 5, 5)
    cnt = acc[rows, ACC_CNT:ACC_CNT + NJ].reshape(nS, 5, 5)
    return sum_td, cnt


def init_state_fields(cfg: EnvConfig, batch: int):
    """Lane-tiled initial state spread over the ISD (shared helper with
    the rollout kernel) plus a zeroed step counter."""
    shape = (batch // LANES, LANES)
    return sk.isd_spread_fields(cfg, batch, shape) + (
        jnp.zeros(shape, jnp.int32),)


def fused_minimax_train(cfg: EnvConfig, batch: int, n_chunks: int,
                        chunk_len: int = 64, lr: float = 0.3,
                        gamma: float = 0.99, eps: float = 0.3,
                        lr_halflife: int = 0, eps_halflife: int = 0,
                        solver_iters: int = 200, seed: int = 0,
                        interpret: bool = False,
                        single_dispatch: bool = False,
                        init: tuple | None = None):
    """Chunked fused minimax-Q training.  Returns (q, v, pi_a, pi_b,
    stats_history).  Semantics match agents/learners.minimax_train with
    resolve_every == chunk_len (chunk-stale TD baselines).

    ``init``: optional (q, v, pi_a, pi_b) warm start — resume a previous
    run or chain phases with different lr/eps schedules (annealed
    fine-tuning measurably improves final exploitability).

    ``single_dispatch`` wraps the whole run in one jitted lax.scan —
    minimal dispatch overhead, but the long scan over pallas_call bodies
    compiles slowly (minutes on this environment's remote compiler and
    can wedge its relay); the default per-chunk loop pays one round trip
    per chunk instead."""
    from ..agents.learners import solve_matrix_games
    from ..core import tables
    nS = tables.build_statespace(cfg).nS

    if init is None:
        q = jnp.zeros((nS, 5, 5), jnp.float32)
        v = jnp.zeros(nS, jnp.float32)
        pi_a = jnp.full((nS, 5), 0.2, jnp.float32)
        pi_b = jnp.full((nS, 5), 0.2, jnp.float32)
    else:
        q, v, pi_a, pi_b = (jnp.asarray(x, jnp.float32) for x in init)
        assert q.shape == (nS, 5, 5) and v.shape == (nS,)
    fields = init_state_fields(cfg, batch)

    @jax.jit
    def between(q, acc, lr_now, eps_now):
        """Everything between kernel chunks in ONE jitted dispatch
        (tunneled backends pay ~0.4 s per eager op): count-normalized Q
        update, RM+ re-solve, and repacking M with traced lr/eps."""
        sum_td, cnt = unpack_acc(cfg, acc)
        q = q + lr_now * sum_td / jnp.maximum(cnt, 1.0)
        v, pa, pb = solve_matrix_games(q, iters=solver_iters)
        return q, v, pa, pb, pack_m(cfg, pa, pb, q, v, eps_now)

    def decay(base, hl, k):
        return base * (0.5 ** (k * chunk_len / hl) if hl else 1.0)

    m0 = pack_m(cfg, pi_a, pi_b, q, v, eps)

    if single_dispatch:
        @jax.jit
        def whole_run(fields, q, v, pi_a, pi_b, m):
            def chunk_body(carry, k):
                fields, q, v, pa, pb, m = carry
                fields, acc, stats = learner_chunk(
                    cfg, seed * 1_000_003 + k, m, fields, batch, chunk_len,
                    gamma=gamma, interpret=interpret)
                kf = k.astype(jnp.float32)
                q, v, pa, pb, m = between(q, acc,
                                          decay(lr, lr_halflife, kf),
                                          decay(eps, eps_halflife, kf))
                return (fields, q, v, pa, pb, m), jnp.stack(
                    [s.astype(jnp.int32) for s in stats])

            (fields, q, v, pa, pb, m), stats = jax.lax.scan(
                chunk_body, (fields, q, v, pi_a, pi_b, m),
                jnp.arange(n_chunks))
            return q, v, pa, pb, stats

        q, v, pi_a, pi_b, stats = whole_run(fields, q, v, pi_a, pi_b, m0)
        history = [tuple(int(x) for x in row) for row in np.asarray(stats)]
        return q, v, pi_a, pi_b, history

    m = m0
    history = []
    for k in range(n_chunks):
        fields, acc, stats = learner_chunk(
            cfg, seed * 1_000_003 + k, m, fields, batch, chunk_len,
            gamma=gamma, interpret=interpret)
        q, v, pi_a, pi_b, m = between(
            q, acc, jnp.float32(decay(lr, lr_halflife, k)),
            jnp.float32(decay(eps, eps_halflife, k)))
        if k % 16 == 0 or k == n_chunks - 1:
            history.append(tuple(int(x) for x in stats))
    return q, v, pi_a, pi_b, history

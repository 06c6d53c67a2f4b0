"""Fused pallas minimax-Q actor/TD kernel.

The XLA learner path tops out at the generic engine's per-step overhead
(~8-12M env-steps/s).  This kernel runs whole act->step->TD chunks
on-chip, expressing every table interaction as an MXU matmul (the
TPU-native form of gather/scatter):

* pi_a / pi_b / Q / v are packed into one VMEM matrix M [spc, 128]
  bfloat16, indexed by the COMPACT closed-form cellpair code
  (core/rules.cellpair_encode — arithmetic, no dense-lookup gather;
  2.2x fewer rows than raw-code padding on 5x4, and small enough that
  11x7 fits VMEM);
* ONE matmul gather per step: one_hot(cp) @ M fetches each env's policy
  rows, Q row AND the v[next] the PREVIOUS step's TD was waiting for
  (pipelined TD retirement — terminated lanes mask v with cont=0, so the
  autoreset rewrite never corrupts a target);
* TD sums and visit counts accumulate into acc [spc, 128] f32 via a
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
RB = 32                      # lane-block rows per matmul (4096 lanes); the
#                              slabbed big-grid path uses RB_SLABBED to keep
#                              one-hot intermediates inside VMEM
RB_SLABBED = 8
NJ = N_ACTIONS * N_ACTIONS   # 25 joint actions
# M column layout.  Q and v are stored DOUBLE-bf16 (hi = bf16 round, lo =
# f32 residual, recombined after the one-hot gather): the gather matmuls
# run in bf16 for MXU rate, but a bf16-quantized TD baseline/target puts a
# ~2^-9 relative floor under Q — observable as an exploitability plateau.
# Split columns restore ~2^-17 at zero extra matmul cost (one-hot rows
# select exactly; each column's product is exact in the f32 accumulator).
# Policies stay single bf16: they only drive behavior sampling, which is
# already 16-bit fixed-point and does not bias the off-policy fixed point.
COL_PI_A, COL_PI_B, COL_Q, COL_V = 0, 5, 10, 35
COL_V_LO, COL_Q_LO = 36, 37
ACC_TD, ACC_CNT = 0, 32

# PACKED-path layout (the big-grid kernel, `packed_learner_chunk`).
# Because M is frozen within a chunk, the per-visit TD decomposes as
#   (r + gamma*v(s') - v(s))  +  (v(s) - q[s, ja])
# where the second term is CONSTANT per (s, ja): the kernel only needs
# to accumulate the BELLMAN RESIDUAL delta = r + gamma*v(s') - v(s) and
# the visit count, and the host adds cnt*(v - q) between chunks.  That
# shrinks the per-state gather payload from 62 columns (Q hi+lo was 50
# of them) to 12 — so GP = 8 states share one 128-wide M row (16
# columns each), an 8x cut in gather-matmul rows — and lets the
# accumulator pack AP = 2 states per row (25 residual-sum + 25 count
# columns each), a 2x cut in scatter rows.  Accumulating the RESIDUAL
# (not the raw target) matters: the scatter operand is bf16, and near
# convergence the raw target r + gamma*v' is O(1) while the residual is
# small — quantizing the target would put a ~2^-9 absolute BIAS floor
# under Q (measured: exploitability plateaued at 0.036 vs the 0.004
# contract), while quantizing the residual keeps the bf16 error
# proportional to the residual itself.  v(s) costs nothing: the acting
# gather already fetched it.  The host-side (v - q) term uses the EXACT
# f32 q and v (the kernel subtracted the double-bf16 v, ~2^-17 apart).
GP, GCOLS = 8, 16                      # states per M row, cols per state
PCOL_PI_A, PCOL_PI_B, PCOL_V, PCOL_V_LO = 0, 5, 10, 11
AP, ASTRIDE = 2, 50                    # states per acc row, col stride
PACC_RES, PACC_CNT = 0, 25


SLAB_MAX = 1024


def make_gather(m_ref, SLAB: int, n_slabs: int, rb: int):
    """Build the M^T one-hot gather for a VMEM table ``m_ref`` [SP, 128].

    Returns ``gather_rows(cp) -> [rb, 128 M-cols, 128 lanes]`` f32.
    TRANSPOSED on purpose: downstream reads many M-columns per step; with
    columns on the MIDDLE dim each read is a cheap major-dim slice, where
    the natural [lanes, cols] orientation would pay a cross-lane extract
    per read.  Both one-hot operands contract over their sublane dim — no
    relayouts.  Large tables (n_slabs > 1) accumulate SLAB-row slabs so
    one-hot intermediates stay bounded, and only the slabs the block's
    codes actually TOUCH run (locality-adaptive bounds — a skipped slab's
    one-hot is identically zero, so results are bit-identical; in the
    MULTIGRID kernel with variant-major lanes this makes each block pay
    only for its own variant's table rows).  Shared by the minimax and
    alternating-turn learner kernels."""
    sp_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, LANES), 0)

    def gather_rows(cp, slab_bounds=None):
        outs = []
        for rr in range(rb):
            if n_slabs == 1:
                oh = (sp_iota == cp[rr][None, :]).astype(jnp.bfloat16)
                outs.append(jax.lax.dot_general(
                    m_ref[:], oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            else:
                def body(j, acct):
                    off = j * SLAB
                    oh = ((sp_iota + off) == cp[rr][None, :]).astype(
                        jnp.bfloat16)
                    msl = m_ref[pl.ds(off, SLAB), :]
                    return acct + jax.lax.dot_general(
                        msl, oh, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                lo, hi = (0, n_slabs) if slab_bounds is None else slab_bounds
                outs.append(jax.lax.fori_loop(
                    lo, hi, body,
                    jnp.zeros((LANES, LANES), jnp.float32)))
        return jnp.stack(outs)

    return gather_rows


def make_scatter(acc_ref, SLAB: int, n_slabs: int, rb: int, blk_shape):
    """Build ``scatter_add(cp, X)``: acc[cp] += X via one_hot^T matmuls
    (Mosaic takes single contracting dims only, so the rb block rows
    unroll).  One-hots are built per block row from a 2D [lanes, SLAB]
    iota — a [rb, lanes, SLAB] iota would cost rb*lanes*SLAB*4 bytes of
    VMEM and is what used to cap the slabbed path at rb=8.  Shared by
    the minimax and alternating-turn learner kernels."""
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (blk_shape[1], SLAB), 1)

    def add_slab(off, upd, cp, X):
        for rr in range(rb):
            oh = ((s_iota + off) == cp[rr][:, None]).astype(jnp.bfloat16)
            upd = upd + jax.lax.dot_general(
                oh, X[rr], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return upd

    def scatter_add(cp, X, slab_bounds=None):
        if n_slabs == 1:
            acc_ref[:] = add_slab(0, acc_ref[:], cp, X)
            return

        def body(j, _):
            off = j * SLAB
            acc_ref[pl.ds(off, SLAB), :] = add_slab(
                off, acc_ref[pl.ds(off, SLAB), :], cp, X)
            return 0

        lo, hi = (0, n_slabs) if slab_bounds is None else slab_bounds
        jax.lax.fori_loop(lo, hi, body, 0)

    return scatter_add


def _pad_sp(n: int) -> int:
    sp = -(-n // LANES) * LANES
    if sp > 2 * SLAB_MAX:  # slabbed gathers need SLAB_MAX | SP
        sp = -(-sp // SLAB_MAX) * SLAB_MAX
    return sp


def spc(cfg: EnvConfig) -> int:
    """Padded compact state-code count (see core/rules.cellpair_encode):
    one M/acc row per (cell_a, cell_b != cell_a, poss) code — 2.2x fewer
    MXU lanes than raw-code padding on 5x4 and small enough that 11x7
    (nS=11705) fits the kernel's VMEM tables."""
    from ..core import rules
    return _pad_sp(rules.n_cellpairs(cfg))


def spc_mg(cfgs: tuple) -> tuple[int, np.ndarray]:
    """(padded total row count, per-variant row offsets) of the MULTIGRID
    packed tables: variants' compact code blocks are concatenated.
    Offsets are 8-aligned so the PACKED kernel's row/group split
    (cp // GP, cp % GP with GP == 8) maps each variant's block onto
    whole packed rows; the unpacked kernel is offset-agnostic (rows are
    just labels), so the alignment is shared."""
    from ..core import rules
    sizes = [-(-rules.n_cellpairs(c) // GP) * GP for c in cfgs]
    offsets = np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int32)
    return _pad_sp(int(sum(sizes))), offsets


# Backwards-compatible alias (pre-compaction name).
spad = spc


def _learner_body(seed_ref, m_ref, planes, ra_ref, ca_ref, rb_ref, cb_ref,
                  p_ref, t_ref,
                  ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                  *, cfg, n_steps: int, q_int, gamma: float, rb: int,
                  max_steps: int = 0):
    """Block-major fused actor/TD loop.

    Each RB*128-lane block runs its whole n_steps trajectory in one inner
    fori_loop; blocks are independent (the counter PRNG is keyed on global
    lane id) and share only the acc scatter target.

    ONE gather matmul per step: step i's TD needs v[next_i], and step
    i+1's gather fetches exactly that state's row (autoreset only rewrites
    terminated lanes, whose cont is 0, masking v away) — so the TD of step
    i is retired during step i+1's gather, and a single trailing gather
    retires the last step.  Large grids (SP > 2*SLAB_MAX) process M/acc in
    SLAB_MAX-row slabs so one-hot intermediates stay bounded.

    ``planes`` is None (static ``cfg``/``q_int`` geometry) or the 6
    MULTIGRID per-lane plane refs (H, W, glo, ghi, q_int, cellpair-row
    offset): geometry becomes data (ops/step_kernel.GeoPlanes) and each
    lane indexes its own variant's block of M/acc — one compiled kernel
    trains any mixture of board variants.
    """
    from ..core import rules
    RB = rb
    seed = seed_ref[0].astype(jnp.uint32)
    R = ra_ref.shape[0]
    n_blocks = R // RB
    SP = m_ref.shape[0]
    SLAB = SP if SP <= 2 * SLAB_MAX else SLAB_MAX
    n_slabs = SP // SLAB
    blk_shape = (RB, LANES)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    rows_iota = jax.lax.broadcasted_iota(jnp.uint32, blk_shape, 0)
    cols_iota = jax.lax.broadcasted_iota(jnp.uint32, blk_shape, 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, blk_shape + (LANES,), 2)
    gamma_f = jnp.float32(gamma)

    gather_rows = make_gather(m_ref, SLAB, n_slabs, RB)
    scatter_add = make_scatter(acc_ref, SLAB, n_slabs, RB, blk_shape)

    def bounds(cp):
        if n_slabs == 1:
            return None
        return jnp.min(cp) // SLAB, jnp.max(cp) // SLAB + 1

    def col(pre, c):
        return pre[:, c, :]

    def sample5(pre, base, u01):
        """First-exceedance sample from 5 probability columns of pre."""
        c = col(pre, base)
        total = c
        for k in range(1, N_ACTIONS):
            total = total + col(pre, base + k)
        target = u01 * total
        a = jnp.zeros(blk_shape, jnp.int32)
        c = col(pre, base)
        for k in range(1, N_ACTIONS):
            a = a + (c <= target).astype(jnp.int32)
            c = c + col(pre, base + k)
        return a

    def retire(pre, pend):
        """Scatter the previous step's TD using THIS gather's v column."""
        cp, ja, r, cont, q_cur, valid = pend
        v_here = col(pre, COL_V) + col(pre, COL_V_LO)
        td = r + cont * v_here - q_cur
        oh_td = (c_iota == (ja[..., None] + ACC_TD)).astype(jnp.float32)
        oh_ct = (c_iota == (ja[..., None] + ACC_CNT)).astype(jnp.float32)
        X = ((oh_td * td[..., None] + oh_ct)
             * valid[..., None]).astype(jnp.bfloat16)
        scatter_add(cp, X, bounds(cp))

    def block(blk, carry0):
        sl = pl.ds(blk * RB, RB)
        lane = ((blk.astype(jnp.uint32) * RB + rows_iota)
                * jnp.uint32(LANES) + cols_iota)
        zi = jnp.zeros(blk_shape, jnp.int32)
        zf = jnp.zeros(blk_shape, jnp.float32)

        if planes is None:
            geo, q_geo, cpo = cfg, q_int, None
        else:
            h_ref, w_ref, glo_ref, ghi_ref, qp_ref, cpo_ref = planes
            geo = sk.GeoPlanes(H=h_ref[sl, :], W=w_ref[sl, :],
                               glo=glo_ref[sl, :], ghi=ghi_ref[sl, :],
                               q_int=qp_ref[sl, :], max_steps=max_steps)
            q_geo = geo.q_int
            cpo = cpo_ref[sl, :]

        def cell_of(ra, ca, rb, cb, p):
            c = rules.cellpair_encode(jnp, ra, ca, rb, cb, p, geo)
            return c if cpo is None else c + cpo

        def step(i, c):
            (ra, ca, rb, cb, p, t, pend,
             rew_acc, goal_acc, trunc_acc) = c
            bits0 = sk._random_word(seed, i, 0, lane)
            bits1 = sk._random_word(seed, i, 1, lane)
            bits2 = sk._random_word(seed, i, 2, lane)

            cp = cell_of(ra, ca, rb, cb, p)
            pre = gather_rows(cp, bounds(cp))
            retire(pre, pend)

            inv = jnp.float32(1.0 / 65536.0)
            ua = sk._u16(bits0, 0).astype(jnp.float32) * inv
            ub = sk._u16(bits0, 1).astype(jnp.float32) * inv
            aa = sample5(pre, COL_PI_A, ua)
            ab = sample5(pre, COL_PI_B, ub)

            nra, nca, nrb, ncb, npz, goal, r = sk.transition_core(
                ra, ca, rb, cb, p, aa, ab, bits1, bits2, geo, q_geo)
            nra, nca, nrb, ncb, npz, t2, trunc = sk.autoreset_core(
                nra, nca, nrb, ncb, npz, t, goal, bits2, geo)

            ja = aa * N_ACTIONS + ab
            q_cur = jnp.zeros(blk_shape, jnp.float32)
            for j in range(NJ):
                q_cur = q_cur + jnp.where(
                    ja == j, col(pre, COL_Q + j) + col(pre, COL_Q_LO + j),
                    0.0)
            term = goal | trunc
            cont = jnp.where(term, 0.0, gamma_f)
            new_pend = (cp, ja, r.astype(jnp.float32), cont, q_cur,
                        jnp.ones(blk_shape, jnp.float32))
            return (nra, nca, nrb, ncb, npz, t2, new_pend,
                    rew_acc + jnp.sum(r),
                    goal_acc + jnp.sum(goal.astype(jnp.int32)),
                    trunc_acc + jnp.sum(trunc.astype(jnp.int32)))

        init = (ra_ref[sl, :], ca_ref[sl, :], rb_ref[sl, :], cb_ref[sl, :],
                p_ref[sl, :], t_ref[sl, :], (zi, zi, zf, zf, zf, zf),
                *carry0)
        (ra, ca, rb, cb, p, t, pend,
         rew_acc, goal_acc, trunc_acc) = jax.lax.fori_loop(
            0, n_steps, step, init)

        # trailing gather retires the final step's TD
        cp_end = cell_of(ra, ca, rb, cb, p)
        retire(gather_rows(cp_end, bounds(cp_end)), pend)

        ra_ref[sl, :], ca_ref[sl, :] = ra, ca
        rb_ref[sl, :], cb_ref[sl, :] = rb, cb
        p_ref[sl, :], t_ref[sl, :] = p, t
        return (rew_acc, goal_acc, trunc_acc)

    z = jnp.int32(0)
    rew, goals, truncs = jax.lax.fori_loop(0, n_blocks, block, (z, z, z))
    ora[:], oca[:] = ra_ref[:], ca_ref[:]
    orb[:], ocb[:] = rb_ref[:], cb_ref[:]
    op[:], ot[:] = p_ref[:], t_ref[:]
    stats_ref[0, 0] = rew
    stats_ref[0, 1] = goals
    stats_ref[0, 2] = truncs


def _learner_kernel(seed_ref, m_ref, ra_ref, ca_ref, rb_ref, cb_ref,
                    p_ref, t_ref,
                    ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                    *, cfg: EnvConfig, n_steps: int, q_int: int,
                    gamma: float, rb: int):
    """Static-geometry (single-variant) fused learner kernel."""
    _learner_body(seed_ref, m_ref, None, ra_ref, ca_ref, rb_ref, cb_ref,
                  p_ref, t_ref, ora, oca, orb, ocb, op, ot, acc_ref,
                  stats_ref, cfg=cfg, n_steps=n_steps, q_int=q_int,
                  gamma=gamma, rb=rb)


def _mg_learner_kernel(seed_ref, m_ref, h_ref, w_ref, glo_ref, ghi_ref,
                       qp_ref, cpo_ref, ra_ref, ca_ref, rb_ref, cb_ref,
                       p_ref, t_ref,
                       ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                       *, n_steps: int, gamma: float, rb: int,
                       max_steps: int):
    """Multigrid fused learner kernel: geometry + cellpair-row offset are
    per-lane planes (one compilation for any variant mixture)."""
    _learner_body(seed_ref, m_ref,
                  (h_ref, w_ref, glo_ref, ghi_ref, qp_ref, cpo_ref),
                  ra_ref, ca_ref, rb_ref, cb_ref, p_ref, t_ref,
                  ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                  cfg=None, n_steps=n_steps, q_int=0, gamma=gamma, rb=rb,
                  max_steps=max_steps)


@functools.partial(jax.jit, static_argnames=("cfg", "batch", "n_steps",
                                             "gamma", "interpret"))
def learner_chunk(cfg: EnvConfig, seed, m_packed, state_fields,
                  batch: int, n_steps: int, gamma: float = 0.99,
                  interpret: bool = False):
    """Run one fused chunk.  ``m_packed`` [spc(cfg), 128] bfloat16 (see
    module docstring); ``state_fields`` = 6 int32 [batch/128, 128] arrays.
    Returns (new_fields, acc [spc, 128] f32, stats[3])."""
    assert n_steps > 0
    assert batch % LANES == 0, f"batch must be a multiple of {LANES}"
    shape = (batch // LANES, LANES)
    SP = spc(cfg)
    # Largest block height <= the cap that divides the batch's rows.
    cap = RB if SP <= 2 * SLAB_MAX else RB_SLABBED
    rb = next(r for r in range(min(cap, shape[0]), 0, -1)
              if shape[0] % r == 0)

    # M (bf16) + acc (f32) are VMEM-resident [SP, 128] planes; beyond
    # ~14 MB Mosaic cannot place them.  The generic XLA learner
    # (agents/learners) has no such limit — it keeps tables in HBM.
    vmem_mb = SP * LANES * (2 + 4) / 2**20
    if vmem_mb > 14:
        raise ValueError(
            f"grid too large for the fused learner kernel: packed tables "
            f"need ~{vmem_mb:.0f} MB of VMEM (compact state space "
            f"{cfg.width}x{cfg.height} -> {SP} codes); "
            f"use agents.learners.minimax_train (HBM tables) instead")
    q_int = int(round(cfg.slip_prob * 65536))
    kernel = functools.partial(
        _learner_kernel, cfg=cfg, n_steps=n_steps, q_int=q_int, gamma=gamma,
        rb=rb)
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


@functools.partial(jax.jit, static_argnames=("cfgs", "batch", "n_steps",
                                             "gamma", "interpret"))
def multigrid_learner_chunk(cfgs: tuple, seed, m_packed, planes,
                            state_fields, batch: int, n_steps: int,
                            gamma: float = 0.99, interpret: bool = False):
    """Run one fused chunk over a MIXED-geometry batch (BASELINE config 4
    at pallas speed, training edition).  ``m_packed`` [spc_mg(cfgs)[0],
    128] bfloat16 — per-variant table blocks concatenated (pack_m with a
    tuple cfg); ``planes`` = 6 int32 [batch/128, 128] planes (H, W, glo,
    ghi, q_int, cellpair-row offset — from init_state_fields's mg mode);
    ``state_fields`` = 6 int32 planes.  Returns (new_fields,
    acc [SP, 128] f32, stats[3])."""
    assert n_steps > 0
    assert batch % LANES == 0, f"batch must be a multiple of {LANES}"
    assert len({c.max_steps for c in cfgs}) == 1, \
        "variants must share max_steps"
    shape = (batch // LANES, LANES)
    SP, _ = spc_mg(cfgs)
    cap = RB if SP <= 2 * SLAB_MAX else RB_SLABBED
    rb = next(r for r in range(min(cap, shape[0]), 0, -1)
              if shape[0] % r == 0)

    vmem_mb = SP * LANES * (2 + 4) / 2**20
    if vmem_mb > 14:
        raise ValueError(
            f"variant mixture too large for the fused learner kernel: "
            f"packed tables need ~{vmem_mb:.0f} MB of VMEM ({SP} codes); "
            f"use agents.learners.multigrid_minimax_train (HBM tables) "
            f"instead")
    kernel = functools.partial(
        _mg_learner_kernel, n_steps=n_steps, gamma=gamma, rb=rb,
        max_steps=cfgs[0].max_steps)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 6 +
                  [jax.ShapeDtypeStruct((SP, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, 4), jnp.int32)])
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 +
                        [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        input_output_aliases={8 + i: i for i in range(6)},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), m_packed, *planes, *state_fields)
    *fields, acc, stats = outs
    return tuple(fields), acc, (stats[0, 0], stats[0, 1], stats[0, 2])


# ----------------------------------------------------------------------
# PACKED kernel: the big-grid path (see the layout comment at the top).
# ----------------------------------------------------------------------

def _n_codes(cfg) -> int:
    """Total compact cellpair codes (8-aligned per variant for tuples)."""
    from ..core import rules
    if isinstance(cfg, tuple):
        return int(sum(-(-rules.n_cellpairs(c) // GP) * GP for c in cfg))
    return rules.n_cellpairs(cfg)


def spm(cfg) -> int:
    """Packed-M row count: GP states per row, padded like spc."""
    return _pad_sp(-(-_n_codes(cfg) // GP))


def sacc(cfg) -> int:
    """Packed-accumulator row count: AP states per row."""
    return _pad_sp(-(-_n_codes(cfg) // AP))


def _packed_body(seed_ref, m_ref, planes, ra_ref, ca_ref, rb_ref, cb_ref,
                 p_ref, t_ref,
                 ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                 *, cfg, n_steps: int, q_int, gamma: float, rb: int,
                 max_steps: int = 0):
    """Packed fused actor/TD loop (the big-grid twin of `_learner_body`).

    Identical stepping, acting and pipelined-retirement structure; the
    differences are the M/acc layouts (GP states per M row, AP per acc
    row — see the PACKED layout comment at the top) and that the kernel
    accumulates BELLMAN RESIDUAL sums (r + gamma*v' - v) and visit
    counts instead of full TDs: the host completes each cell's TD sum
    with the constant-within-chunk cnt*(v - q) term between chunks.
    Action sampling reads the same bf16 pi values and the same counter
    PRNG as the unpacked kernel, so both kernels step bit-identical
    trajectories for equal M contents."""
    from ..core import rules
    RBk = rb
    seed = seed_ref[0].astype(jnp.uint32)
    R = ra_ref.shape[0]
    n_blocks = R // RBk
    SPM = m_ref.shape[0]
    SLAB_M = SPM if SPM <= 2 * SLAB_MAX else SLAB_MAX
    n_slabs_m = SPM // SLAB_M
    SPA = acc_ref.shape[0]
    SLAB_A = SPA if SPA <= 2 * SLAB_MAX else SLAB_MAX
    n_slabs_a = SPA // SLAB_A
    blk_shape = (RBk, LANES)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    rows_iota = jax.lax.broadcasted_iota(jnp.uint32, blk_shape, 0)
    cols_iota = jax.lax.broadcasted_iota(jnp.uint32, blk_shape, 1)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, blk_shape + (LANES,), 2)
    gamma_f = jnp.float32(gamma)

    gather_rows = make_gather(m_ref, SLAB_M, n_slabs_m, RBk)
    scatter_add = make_scatter(acc_ref, SLAB_A, n_slabs_a, RBk, blk_shape)

    def bounds(codes, SLAB, n_slabs):
        if n_slabs == 1:
            return None
        return jnp.min(codes) // SLAB, jnp.max(codes) // SLAB + 1

    def collapse(pre, g):
        """Select each lane's group columns: [rb, 128 M-cols, 128 lanes]
        + per-lane group id -> the 12 per-state columns [rb, lanes]."""
        outs = []
        for c in range(PCOL_V_LO + 1):
            s = None
            for k in range(GP):
                contrib = jnp.where(g == k, pre[:, k * GCOLS + c, :], 0.0)
                s = contrib if s is None else s + contrib
            outs.append(s)
        return outs

    def sample5(cols5, u01):
        total = cols5[0]
        for k in range(1, N_ACTIONS):
            total = total + cols5[k]
        target = u01 * total
        a = jnp.zeros(blk_shape, jnp.int32)
        c = cols5[0]
        for k in range(1, N_ACTIONS):
            a = a + (c <= target).astype(jnp.int32)
            c = c + cols5[k]
        return a

    def retire(v_here, pend):
        cpa, cbase, r, cont, v_prev, valid = pend
        delta = r + cont * v_here - v_prev   # Bellman residual (see top)
        oh_td = (c_iota == (cbase[..., None] + PACC_RES)).astype(jnp.float32)
        oh_ct = (c_iota == (cbase[..., None] + PACC_CNT)).astype(jnp.float32)
        X = ((oh_td * delta[..., None] + oh_ct)
             * valid[..., None]).astype(jnp.bfloat16)
        scatter_add(cpa, X, bounds(cpa, SLAB_A, n_slabs_a))

    def block(blk, carry0):
        sl = pl.ds(blk * RBk, RBk)
        lane = ((blk.astype(jnp.uint32) * RBk + rows_iota)
                * jnp.uint32(LANES) + cols_iota)
        zi = jnp.zeros(blk_shape, jnp.int32)
        zf = jnp.zeros(blk_shape, jnp.float32)

        if planes is None:
            geo, q_geo, cpo = cfg, q_int, None
        else:
            h_ref, w_ref, glo_ref, ghi_ref, qp_ref, cpo_ref = planes
            geo = sk.GeoPlanes(H=h_ref[sl, :], W=w_ref[sl, :],
                               glo=glo_ref[sl, :], ghi=ghi_ref[sl, :],
                               q_int=qp_ref[sl, :], max_steps=max_steps)
            q_geo = geo.q_int
            cpo = cpo_ref[sl, :]

        def cell_of(ra, ca, rb, cb, p):
            c = rules.cellpair_encode(jnp, ra, ca, rb, cb, p, geo)
            return c if cpo is None else c + cpo

        def step(i, c):
            (ra, ca, rb, cb, p, t, pend,
             rew_acc, goal_acc, trunc_acc) = c
            bits0 = sk._random_word(seed, i, 0, lane)
            bits1 = sk._random_word(seed, i, 1, lane)
            bits2 = sk._random_word(seed, i, 2, lane)

            cp = cell_of(ra, ca, rb, cb, p)
            cpm = cp // GP
            pre = gather_rows(cpm, bounds(cpm, SLAB_M, n_slabs_m))
            cols = collapse(pre, cp % GP)
            v_here = cols[PCOL_V] + cols[PCOL_V_LO]
            retire(v_here, pend)

            inv = jnp.float32(1.0 / 65536.0)
            ua = sk._u16(bits0, 0).astype(jnp.float32) * inv
            ub = sk._u16(bits0, 1).astype(jnp.float32) * inv
            aa = sample5(cols[PCOL_PI_A:PCOL_PI_A + 5], ua)
            ab = sample5(cols[PCOL_PI_B:PCOL_PI_B + 5], ub)

            nra, nca, nrb, ncb, npz, goal, r = sk.transition_core(
                ra, ca, rb, cb, p, aa, ab, bits1, bits2, geo, q_geo)
            nra, nca, nrb, ncb, npz, t2, trunc = sk.autoreset_core(
                nra, nca, nrb, ncb, npz, t, goal, bits2, geo)

            ja = aa * N_ACTIONS + ab
            cbase = (cp % AP) * ASTRIDE + ja
            term = goal | trunc
            cont = jnp.where(term, 0.0, gamma_f)
            new_pend = (cp // AP, cbase, r.astype(jnp.float32), cont,
                        v_here, jnp.ones(blk_shape, jnp.float32))
            return (nra, nca, nrb, ncb, npz, t2, new_pend,
                    rew_acc + jnp.sum(r),
                    goal_acc + jnp.sum(goal.astype(jnp.int32)),
                    trunc_acc + jnp.sum(trunc.astype(jnp.int32)))

        init = (ra_ref[sl, :], ca_ref[sl, :], rb_ref[sl, :], cb_ref[sl, :],
                p_ref[sl, :], t_ref[sl, :], (zi, zi, zf, zf, zf, zf),
                *carry0)
        (ra, ca, rb, cb, p, t, pend,
         rew_acc, goal_acc, trunc_acc) = jax.lax.fori_loop(
            0, n_steps, step, init)

        # trailing gather retires the final step's TD
        cp_end = cell_of(ra, ca, rb, cb, p)
        cpm = cp_end // GP
        cols = collapse(gather_rows(cpm, bounds(cpm, SLAB_M, n_slabs_m)),
                        cp_end % GP)
        retire(cols[PCOL_V] + cols[PCOL_V_LO], pend)

        ra_ref[sl, :], ca_ref[sl, :] = ra, ca
        rb_ref[sl, :], cb_ref[sl, :] = rb, cb
        p_ref[sl, :], t_ref[sl, :] = p, t
        return (rew_acc, goal_acc, trunc_acc)

    z = jnp.int32(0)
    rew, goals, truncs = jax.lax.fori_loop(0, n_blocks, block, (z, z, z))
    ora[:], oca[:] = ra_ref[:], ca_ref[:]
    orb[:], ocb[:] = rb_ref[:], cb_ref[:]
    op[:], ot[:] = p_ref[:], t_ref[:]
    stats_ref[0, 0] = rew
    stats_ref[0, 1] = goals
    stats_ref[0, 2] = truncs


def _packed_kernel(seed_ref, m_ref, ra_ref, ca_ref, rb_ref, cb_ref,
                   p_ref, t_ref,
                   ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                   *, cfg: EnvConfig, n_steps: int, q_int: int,
                   gamma: float, rb: int):
    _packed_body(seed_ref, m_ref, None, ra_ref, ca_ref, rb_ref, cb_ref,
                 p_ref, t_ref, ora, oca, orb, ocb, op, ot, acc_ref,
                 stats_ref, cfg=cfg, n_steps=n_steps, q_int=q_int,
                 gamma=gamma, rb=rb)


def _mg_packed_kernel(seed_ref, m_ref, h_ref, w_ref, glo_ref, ghi_ref,
                      qp_ref, cpo_ref, ra_ref, ca_ref, rb_ref, cb_ref,
                      p_ref, t_ref,
                      ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                      *, n_steps: int, gamma: float, rb: int,
                      max_steps: int):
    _packed_body(seed_ref, m_ref,
                 (h_ref, w_ref, glo_ref, ghi_ref, qp_ref, cpo_ref),
                 ra_ref, ca_ref, rb_ref, cb_ref, p_ref, t_ref,
                 ora, oca, orb, ocb, op, ot, acc_ref, stats_ref,
                 cfg=None, n_steps=n_steps, q_int=0, gamma=gamma, rb=rb,
                 max_steps=max_steps)


def _packed_vmem_guard(cfg, SPM: int, SPA: int):
    vmem_mb = (SPM * 2 + SPA * 4) * LANES / 2**20
    if vmem_mb > 14:
        raise ValueError(
            f"grid too large even for the PACKED fused learner kernel: "
            f"tables need ~{vmem_mb:.0f} MB of VMEM ({_n_codes(cfg)} "
            f"codes); use agents.learners (HBM tables) instead")


@functools.partial(jax.jit, static_argnames=("cfg", "batch", "n_steps",
                                             "gamma", "interpret"))
def packed_learner_chunk(cfg: EnvConfig, seed, m_packed, state_fields,
                         batch: int, n_steps: int, gamma: float = 0.99,
                         interpret: bool = False):
    """Packed-layout fused chunk (the big-grid fast path).  ``m_packed``
    [spm(cfg), 128] bfloat16 from `pack_m2`; returns (new_fields,
    acc [sacc(cfg), 128] f32, stats[3]) — decode acc with `unpack_acc2`
    (Bellman-residual sums + counts; add cnt*(v - q) for TD sums).
    Roughly 3x less matmul work per step than `learner_chunk` on one big
    grid (8x fewer gather rows, 2x fewer scatter rows), because the
    frozen-within-chunk q never needs to live on chip."""
    assert n_steps > 0
    assert batch % LANES == 0, f"batch must be a multiple of {LANES}"
    shape = (batch // LANES, LANES)
    SPM, SPA = spm(cfg), sacc(cfg)
    rb = next(r for r in range(min(RB, shape[0]), 0, -1)
              if shape[0] % r == 0)
    _packed_vmem_guard(cfg, SPM, SPA)
    q_int = int(round(cfg.slip_prob * 65536))
    kernel = functools.partial(
        _packed_kernel, cfg=cfg, n_steps=n_steps, q_int=q_int, gamma=gamma,
        rb=rb)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 6 +
                  [jax.ShapeDtypeStruct((SPA, LANES), jnp.float32),
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


@functools.partial(jax.jit, static_argnames=("cfgs", "batch", "n_steps",
                                             "gamma", "interpret"))
def multigrid_packed_learner_chunk(cfgs: tuple, seed, m_packed, planes,
                                   state_fields, batch: int, n_steps: int,
                                   gamma: float = 0.99,
                                   interpret: bool = False):
    """Packed-layout fused chunk over a MIXED-geometry batch: the packed
    twin of `multigrid_learner_chunk` (same planes; spc_mg's offsets are
    8-aligned so every variant's block maps onto whole packed rows)."""
    assert n_steps > 0
    assert batch % LANES == 0, f"batch must be a multiple of {LANES}"
    assert len({c.max_steps for c in cfgs}) == 1, \
        "variants must share max_steps"
    shape = (batch // LANES, LANES)
    SPM, SPA = spm(cfgs), sacc(cfgs)
    # keep blocks small enough to stay single-variant (blocked lane
    # layout) so the scatter's slab bounds skip other variants' rows
    cap = RB if SPA <= 2 * SLAB_MAX else RB_SLABBED
    rb = next(r for r in range(min(cap, shape[0]), 0, -1)
              if shape[0] % r == 0)
    _packed_vmem_guard(cfgs, SPM, SPA)
    kernel = functools.partial(
        _mg_packed_kernel, n_steps=n_steps, gamma=gamma, rb=rb,
        max_steps=cfgs[0].max_steps)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 6 +
                  [jax.ShapeDtypeStruct((SPA, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((1, 4), jnp.int32)])
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 7 +
                        [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        input_output_aliases={8 + i: i for i in range(6)},
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), m_packed, *planes, *state_fields)
    *fields, acc, stats = outs
    return tuple(fields), acc, (stats[0, 0], stats[0, 1], stats[0, 2])


def pack_m2(cfg, pi_a, pi_b, v, eps, eps_b=None) -> jnp.ndarray:
    """Pack (exploration-mixed) policies and the split double-bf16 v into
    the PACKED kernel's M [spm(cfg), 128] bfloat16 — GP states per row,
    GCOLS columns each (no Q: the packed kernel accumulates target sums
    and the q subtraction happens host-side, see the layout comment)."""
    if eps_b is None:
        eps_b = eps
    codes = jnp.asarray(_cell_rows(cfg))
    SPM = spm(cfg)
    idx = (codes // GP) * LANES + (codes % GP) * GCOLS
    v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    flat = jnp.zeros(SPM * LANES, jnp.float32)
    pa = pi_a * (1 - eps) + eps / N_ACTIONS
    pb = pi_b * (1 - eps_b) + eps_b / N_ACTIONS
    for k in range(N_ACTIONS):
        flat = flat.at[idx + PCOL_PI_A + k].set(pa[:, k])
        flat = flat.at[idx + PCOL_PI_B + k].set(pb[:, k])
    flat = flat.at[idx + PCOL_V].set(v_hi)
    flat = flat.at[idx + PCOL_V_LO].set(v - v_hi)
    return flat.reshape(SPM, LANES).astype(jnp.bfloat16)


def unpack_acc2(cfg, acc) -> tuple[jnp.ndarray, jnp.ndarray]:
    """acc [sacc, 128] -> dense (sum_residual, cnt), each [nS, 5, 5].
    The per-visit TD is residual + (v - q) with v/q frozen in-chunk, so
    sum_td = sum_residual + cnt * (v - q) (see the layout comment)."""
    codes = jnp.asarray(_cell_rows(cfg))
    nS = codes.shape[0]
    idx = (codes // AP) * LANES + (codes % AP) * ASTRIDE
    flat = acc.reshape(-1)
    cols = jnp.arange(NJ)[None, :]
    sum_res = flat[idx[:, None] + PACC_RES + cols].reshape(nS, 5, 5)
    cnt = flat[idx[:, None] + PACC_CNT + cols].reshape(nS, 5, 5)
    return sum_res, cnt


# ----------------------------------------------------------------------
# Chunked training wrapper
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _cell_rows(cfg) -> np.ndarray:
    """Compact cellpair code of each dense state (dense row -> M row).
    A tuple cfg gives the MULTIGRID rows: per-variant codes shifted by
    the variant's block offset, concatenated in codec order
    (core/multigrid.build_codec's offsets)."""
    from ..core import rules, tables
    if isinstance(cfg, tuple):
        _, offs = spc_mg(cfg)
        return np.concatenate([_cell_rows(c) + o
                               for c, o in zip(cfg, offs)])
    d2r = tables.build_statespace(cfg).dense_to_raw.astype(np.int64)
    xa, ya, xb, yb, p = rules.raw_decode(np, d2r, cfg)
    return rules.cellpair_encode(np, xa, ya, xb, yb, p, cfg).astype(np.int32)


def _spc_any(cfg) -> int:
    return spc_mg(cfg)[0] if isinstance(cfg, tuple) else spc(cfg)


# Backwards-compatible alias (pre-compaction name; rows now index the
# compact cellpair space, not raw codes).
_raw_rows = _cell_rows


def pack_m(cfg, pi_a, pi_b, q, v, eps: float, eps_b=None) -> jnp.ndarray:
    """Pack (exploration-mixed) policies, Q and v into the kernel's
    compact-indexed M [spc, 128] bfloat16.  Q and v are split double-bf16
    (see the column-layout comment at the top of this module): the hi
    column is the exact bf16 rounding, the lo column the residual
    (bf16-quantized, leaving ~2^-17 combined relative error).

    ``eps`` mixes uniform exploration into pi_a; ``eps_b`` (default:
    same as ``eps``) into pi_b — per-side epsilons are what let the
    frozen-opponent mode keep the opponent EXACT (eps 0) while the
    learner explores (the reference substitutes the frozen policy
    verbatim at table-build time, soccer_simultaneous_env.py:187-188).

    ``cfg`` may be a tuple of EnvConfigs (MULTIGRID): tables are then
    indexed by the global dense state (variants concatenated in
    core/multigrid.build_codec's offset order)."""
    if eps_b is None:
        eps_b = eps
    SP = _spc_any(cfg)
    rows = jnp.asarray(_cell_rows(cfg))
    hi = lambda x: x.astype(jnp.bfloat16).astype(jnp.float32)
    qf = q.reshape(q.shape[0], NJ)
    q_hi, v_hi = hi(qf), hi(v)
    m = jnp.zeros((SP, LANES), jnp.float32)
    m = m.at[rows, COL_PI_A:COL_PI_A + 5].set(
        pi_a * (1 - eps) + eps / N_ACTIONS)
    m = m.at[rows, COL_PI_B:COL_PI_B + 5].set(
        pi_b * (1 - eps_b) + eps_b / N_ACTIONS)
    m = m.at[rows, COL_Q:COL_Q + NJ].set(q_hi)
    m = m.at[rows, COL_Q_LO:COL_Q_LO + NJ].set(qf - q_hi)
    m = m.at[rows, COL_V].set(v_hi)
    m = m.at[rows, COL_V_LO].set(v - v_hi)
    return m.astype(jnp.bfloat16)


def unpack_acc(cfg, acc) -> tuple[jnp.ndarray, jnp.ndarray]:
    """acc [spc, 128] -> dense (sum_td, cnt), each [nS, 5, 5] (for a
    tuple cfg: nS = the mixture's concatenated state count)."""
    rows = jnp.asarray(_cell_rows(cfg))
    nS = rows.shape[0]
    sum_td = acc[rows, ACC_TD:ACC_TD + NJ].reshape(nS, 5, 5)
    cnt = acc[rows, ACC_CNT:ACC_CNT + NJ].reshape(nS, 5, 5)
    return sum_td, cnt


def init_state_fields(cfg, batch: int):
    """Lane-tiled initial state spread over the ISD (shared helper with
    the rollout kernel) plus a zeroed step counter.

    For a tuple cfg (MULTIGRID) returns ``(planes, fields)``: the 6
    geometry planes the mg kernel needs (H, W, glo, ghi, q_int,
    cellpair-row offset) and the 6 state fields.  Lanes are assigned
    variants in CONTIGUOUS chunks ('blocked' layout) so almost every
    kernel lane-block is single-variant and the locality-adaptive slab
    bounds skip the other variants' table rows."""
    shape = (batch // LANES, LANES)
    if isinstance(cfg, tuple):
        planes, isd_init = sk._mg_planes(cfg, batch, shape,
                                         layout="blocked")
        _, offs = spc_mg(cfg)
        cpo = jnp.asarray(offs)[planes[5]]        # vid -> row offset
        fields = tuple(isd_init) + (jnp.zeros(shape, jnp.int32),)
        return tuple(planes[:5]) + (cpo,), fields
    return sk.isd_spread_fields(cfg, batch, shape) + (
        jnp.zeros(shape, jnp.int32),)


def fused_minimax_train(cfg, batch: int, n_chunks: int,
                        chunk_len: int = 64, lr: float = 0.3,
                        gamma: float = 0.99, eps: float = 0.3,
                        lr_halflife: int = 0, eps_halflife: int = 0,
                        solver_iters: int = 200, seed: int = 0,
                        count_lr_tau: float = 0.0,
                        count_lr_pow: float = 0.85,
                        eps_min: float = 0.0,
                        lr_anneal_start: int = 0,
                        lr_anneal_tau: float = 0.0,
                        lr_anneal_pow: float = 1.0,
                        avg_after: int = 0,
                        avg_q: bool = False,
                        final_solver_iters: int = 0,
                        interpret: bool = False,
                        single_dispatch: bool = False,
                        init: tuple | None = None,
                        mesh=None,
                        start_chunk: int = 0,
                        fields_init: tuple | None = None,
                        return_state: bool = False,
                        packed: bool | None = None,
                        chunks_per_dispatch: int = 1):
    """Chunked fused minimax-Q training.  Returns (q, v, pi_a, pi_b,
    stats_history).  Semantics match agents/learners.minimax_train with
    resolve_every == chunk_len (chunk-stale TD baselines).

    Error model for this chunked learner (empirically verified on 5x4):
    each chunk applies ONE count-normalized mean update per visited cell
    against a chunk-stale V, so values propagate one Bellman backup per
    CHUNK — final bias ~ gamma^n_chunks — while per-chunk sample noise is
    already tiny (hundreds of visits per cell averaged).  Convergence
    therefore wants lr ~= 1.0 (each chunk = one full empirical Bellman
    backup; fastest contraction) followed by a polynomial tail that
    averages the noise: ``lr_anneal_start``/``lr_anneal_tau``/
    ``lr_anneal_pow`` give lr_k = lr * (1 + max(0, k-start)/tau)^(-pow)
    over the CHUNK index k (tau=1, pow=1 after start is exact harmonic
    averaging of the last chunks' backups).  ``count_lr_tau`` instead
    decays per-CELL over lifetime visit counts (Littman's per-visit
    alpha) — appropriate for per-step updates (agents/learners) but too
    aggressive here, where visits per cell per chunk are O(100).

    ``eps_min`` floors the exploration anneal so late training keeps
    visiting off-equilibrium cells.  ``final_solver_iters`` re-solves all
    state games once more at the end with a higher RM+ iteration budget
    (the returned policies' quality is otherwise capped by the in-loop
    ``solver_iters``).

    ``avg_after`` > 0 returns TIME-AVERAGED strategies over chunks
    >= avg_after instead of the final solve's: per-state equilibrium
    strategies of a noisy Q oscillate around near-ties, and (as in
    fictitious play / regret averaging) their average converges much
    faster than the iterates.  The returned (v, q) stay the final
    iterates; only (pi_a, pi_b) are averaged (then re-normalized).

    ``avg_q`` (with avg_after) averages the Q TABLE over the same tail
    window and returns the equilibrium of solve(mean Q) instead of the
    mean of the per-chunk equilibria: the matrix-game solve amplifies Q
    noise at near-ties, so solving the time-averaged game beats
    averaging the per-iterate solutions (see BASELINE.md's round-5 11x7
    sweep).  The final solve uses ``final_solver_iters`` (or
    ``solver_iters`` if 0); returned v is solve(mean Q)'s value while q
    stays the final iterate.

    ``init``: optional (q, v, pi_a, pi_b) or (q, v, pi_a, pi_b, n) warm
    start — resume a previous run or chain phases with different lr/eps
    schedules (annealed fine-tuning measurably improves final
    exploitability).

    ``start_chunk``/``fields_init``/``return_state`` give EXACT
    checkpoint/resume (utils/checkpoint.py is the serializer): with
    ``return_state=True`` a sixth element ``resume`` is returned — a dict
    of (q, v, pi_a, pi_b, n, fields, next_chunk), the raw loop state
    BEFORE any avg_after/final_solver_iters post-processing — and a
    follow-up call with
    ``init=(resume['q'], resume['v'], resume['pi_a'], resume['pi_b'],
    resume['n'])``, ``fields_init=resume['fields']``,
    ``start_chunk=resume['next_chunk']`` continues BIT-IDENTICALLY to an
    uninterrupted run (chunk PRNG seeds, lr/eps schedules and the packed
    M all key off the absolute chunk index; on resume M is repacked with
    the epsilon chunk ``start_chunk`` saw in the continuous run, i.e.
    decayed at index start_chunk-1).  ``avg_after`` averaging windows are
    per-call: a resumed call restarts its strategy average at its own
    ``avg_after`` (pass absolute chunk indices to keep schedules aligned).

    ``single_dispatch`` wraps the whole run in one jitted lax.scan —
    minimal dispatch overhead, but the long scan over pallas_call bodies
    compiles slowly (minutes on this environment's remote compiler and
    can wedge its relay); the default per-chunk loop pays one round trip
    per chunk instead.  ``chunks_per_dispatch`` > 1 is the middle
    ground: a short jitted scan of that many (chunk + between) bodies
    per dispatch — one compile (the scan length is static), g-fold fewer
    round trips.  On relayed backends where dispatch latency dominates
    (the 2.1B-step recipe spends ~90% of its wall clock on round trips,
    not compute) this is the big wall-clock lever; 8-16 compiles in
    seconds.  Like single_dispatch it computes schedules in-graph in
    f32 (can differ from the host f64 schedule by an ulp); the
    exact-resume contract remains on the default per-chunk mode.
    ``avg_after`` works in every dispatch mode (the scan modes carry the
    strategy sums in-graph).  ``stats_history`` cadence differs by mode:
    the default per-chunk loop records every 16th chunk (plus the last)
    while the scan modes record every chunk.

    ``cfg`` may be a TUPLE of EnvConfigs: the run then trains ONE
    concatenated table over a mixed-geometry batch (lanes round-robin
    across variants) through the multigrid kernel — per-variant results
    live at core/multigrid.build_codec's offsets.

    ``mesh`` (a jax.sharding.Mesh with an 'env' axis) shards the lane
    batch over devices: each device runs its own fused chunk and the
    TD/count accumulators are psum'd, so the replicated between-chunk
    update sees the whole batch — DP scaling of the fast path
    (parallel/mesh.sharded_learner_chunk_fn).

    ``packed`` selects the PACKED kernel layout (GP states per M row,
    target-sum accumulation with host-side q subtraction — see the
    layout comment at the top); default None selects it everywhere (it
    measured 406M vs 305M steps/s on 5x4, 64.9M vs 15.1M on 11x7 and
    134M vs 45.5M on the 3-variant mixture, round 4, and its per-visit
    bf16 quantization is no coarser).  Both layouts step bit-identical
    trajectories for equal packed policy values; their accumulated
    updates are equal up to f32 summation order and per-visit bf16
    rounding, so cross-layout runs diverge chaotically but match
    statistically.  Pass packed=False for the legacy layout."""
    from ..agents.learners import solve_matrix_games
    from ..core import tables
    if isinstance(cfg, tuple):
        nS = int(sum(tables.build_statespace(c).nS for c in cfg))
    else:
        nS = tables.build_statespace(cfg).nS
    if packed is None:
        packed = True

    n = jnp.zeros((nS, 5, 5), jnp.float32)
    if init is None:
        q = jnp.zeros((nS, 5, 5), jnp.float32)
        v = jnp.zeros(nS, jnp.float32)
        pi_a = jnp.full((nS, 5), 0.2, jnp.float32)
        pi_b = jnp.full((nS, 5), 0.2, jnp.float32)
    else:
        if len(init) == 5:
            *init, n = init
            n = jnp.asarray(n, jnp.float32)
        q, v, pi_a, pi_b = (jnp.asarray(x, jnp.float32) for x in init)
        assert q.shape == (nS, 5, 5) and v.shape == (nS,)
    planes = None
    if isinstance(cfg, tuple):
        planes, fields = init_state_fields(cfg, batch)
    else:
        fields = init_state_fields(cfg, batch)
    if fields_init is not None:
        fields = tuple(jnp.asarray(f) for f in fields_init)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.mesh import sharded_learner_chunk_fn
        sharded = sharded_learner_chunk_fn(cfg, mesh, batch, chunk_len,
                                           gamma=gamma, interpret=interpret,
                                           packed=packed)
        sh = NamedSharding(mesh, PartitionSpec("env", None))
        fields = tuple(jax.device_put(f, sh) for f in fields)
        if planes is not None:
            planes = tuple(jax.device_put(p, sh) for p in planes)

            def chunk(seed_k, m, fields):
                return sharded(seed_k, m, fields, planes)
        else:
            def chunk(seed_k, m, fields):
                return sharded(seed_k, m, fields)
    elif isinstance(cfg, tuple):
        mg_chunk = (multigrid_packed_learner_chunk if packed
                    else multigrid_learner_chunk)

        def chunk(seed_k, m, fields):
            return mg_chunk(cfg, seed_k, m, planes, fields,
                            batch, chunk_len, gamma=gamma,
                            interpret=interpret)
    else:
        sg_chunk = packed_learner_chunk if packed else learner_chunk

        def chunk(seed_k, m, fields):
            return sg_chunk(cfg, seed_k, m, fields, batch, chunk_len,
                            gamma=gamma, interpret=interpret)

    if mesh is not None:
        # State-sharded re-solve: the solve's natural axis is the STATE,
        # not the env batch — each device solves nS/N games (bit-identical
        # results; see parallel/mesh.sharded_solve_fn).
        from ..parallel.mesh import sharded_solve_fn
        solve = sharded_solve_fn(mesh, solver_iters)
    else:
        def solve(q):
            return solve_matrix_games(q, iters=solver_iters)

    @jax.jit
    def between(q, n, v_chunk, acc, lr_now, eps_now):
        """Everything between kernel chunks in ONE jitted dispatch
        (tunneled backends pay ~0.4 s per eager op): count-normalized Q
        update, RM+ re-solve, and repacking M with traced lr/eps.
        ``v_chunk`` is the v that was packed into the chunk's M (the
        packed kernel accumulates residuals against it)."""
        if packed:
            sum_res, cnt = unpack_acc2(cfg, acc)
            # per-visit td = residual + (v - q); both frozen in-chunk
            sum_td = sum_res + cnt * (v_chunk[:, None, None] - q)
        else:
            sum_td, cnt = unpack_acc(cfg, acc)
        n = n + cnt
        lr_cell = lr_now
        if count_lr_tau > 0:
            lr_cell = lr_now * (1.0 + n / count_lr_tau) ** (-count_lr_pow)
        q = q + lr_cell * sum_td / jnp.maximum(cnt, 1.0)
        v, pa, pb = solve(q)
        m = (pack_m2(cfg, pa, pb, v, eps_now) if packed
             else pack_m(cfg, pa, pb, q, v, eps_now))
        return q, n, v, pa, pb, m

    def decay(base, hl, k, floor=0.0):
        d = base * (0.5 ** (k * chunk_len / hl) if hl else 1.0)
        return jnp.maximum(d, floor) if isinstance(k, jax.Array) \
            else max(d, floor)

    def lr_at(k):
        d = decay(lr, lr_halflife, k)
        if lr_anneal_tau > 0:
            over = jnp.maximum(k - lr_anneal_start, 0.0) \
                if isinstance(k, jax.Array) else max(k - lr_anneal_start, 0)
            d = d * (1.0 + over / lr_anneal_tau) ** (-lr_anneal_pow)
        return d

    # On resume, chunk ``start_chunk`` must see the M the continuous run's
    # `between` packed after chunk start_chunk-1 — i.e. with THAT chunk's
    # decayed epsilon.  The resume dict below captures the raw loop state
    # BEFORE the avg_after/final_solver_iters post-processing, so those
    # options do not affect resume exactness.
    # (f32 scalar to match `between`'s jnp.float32 eps_now bit-for-bit;
    # the exact-resume contract is for the default per-chunk dispatch
    # mode — single_dispatch recomputes schedules in-graph in f32, which
    # can differ from the host f64 schedule by an ulp.)
    eps0 = eps if start_chunk == 0 else jnp.float32(
        decay(eps, eps_halflife, start_chunk - 1, eps_min))
    if packed:
        m0 = jax.jit(pack_m2, static_argnums=(0,))(cfg, pi_a, pi_b, v, eps0)
    else:
        m0 = jax.jit(pack_m, static_argnums=(0,))(cfg, pi_a, pi_b, q, v,
                                                  eps0)
    end_chunk = start_chunk + n_chunks

    zsum = jnp.zeros((nS, N_ACTIONS), jnp.float32)
    zq = jnp.zeros((nS, N_ACTIONS, N_ACTIONS), jnp.float32)

    def chunk_body(carry, k):
        # Shared by the single_dispatch and chunks_per_dispatch scans.
        # pa_sum/pb_sum (+ q_sum under avg_q) carry the avg_after
        # time-averages (zeros, and statically elided, when avg_after
        # == 0).
        fields, q, n, v, pa, pb, m, pa_sum, pb_sum, q_sum = carry
        fields, acc, stats = chunk(seed * 1_000_003 + k, m, fields)
        kf = k.astype(jnp.float32)
        q, n, v, pa, pb, m = between(
            q, n, v, acc, lr_at(kf),
            decay(eps, eps_halflife, kf, eps_min))
        if avg_after:
            w = (k >= avg_after).astype(jnp.float32)
            pa_sum = pa_sum + w * pa
            pb_sum = pb_sum + w * pb
            if avg_q:
                q_sum = q_sum + w * q
        return (fields, q, n, v, pa, pb, m, pa_sum, pb_sum,
                q_sum), jnp.stack([s.astype(jnp.int32) for s in stats])

    pa_sum = pb_sum = q_sum = None
    if single_dispatch:
        @jax.jit
        def whole_run(fields, q, n, v, pi_a, pi_b, m):
            carry, stats = jax.lax.scan(
                chunk_body,
                (fields, q, n, v, pi_a, pi_b, m, zsum, zsum, zq),
                jnp.arange(start_chunk, end_chunk))
            return carry + (stats,)

        (fields, q, n, v, pi_a, pi_b, _, pa_sum, pb_sum, q_sum,
         stats) = whole_run(fields, q, n, v, pi_a, pi_b, m0)
        history = [tuple(int(x) for x in row) for row in np.asarray(stats)]
    elif chunks_per_dispatch > 1:
        g = chunks_per_dispatch

        @jax.jit
        def seg_run(carry, ks):
            # ONE compile serves every segment: the scan length is the
            # static g, the chunk indices are traced data.
            carry, stats = jax.lax.scan(chunk_body, carry, ks)
            return carry, stats

        rem_body = jax.jit(chunk_body)
        carry = (fields, q, n, v, pi_a, pi_b, m0, zsum, zsum, zq)
        stats_rows = []
        full_end = start_chunk + ((end_chunk - start_chunk) // g) * g
        for s0 in range(start_chunk, full_end, g):
            carry, stats = seg_run(carry, jnp.arange(s0, s0 + g))
            stats_rows.append(stats)  # device arrays; fetched at the end
        for k in range(full_end, end_chunk):  # remainder, per chunk
            carry, stats = rem_body(carry, jnp.int32(k))
            stats_rows.append(stats[None])
        fields, q, n, v, pi_a, pi_b, _, pa_sum, pb_sum, q_sum = carry
        history = [tuple(int(x) for x in row)
                   for s in stats_rows for row in np.asarray(s)]
    else:
        m = m0
        history = []

        @jax.jit
        def accum(s, x):
            return x if s is None else s + x

        for k in range(start_chunk, end_chunk):
            fields, acc, stats = chunk(seed * 1_000_003 + k, m, fields)
            q, n, v, pi_a, pi_b, m = between(
                q, n, v, acc, jnp.float32(lr_at(k)),
                jnp.float32(decay(eps, eps_halflife, k, eps_min)))
            if avg_after and k >= avg_after:
                pa_sum = pi_a if pa_sum is None else accum(pa_sum, pi_a)
                pb_sum = pi_b if pb_sum is None else accum(pb_sum, pi_b)
                if avg_q:
                    q_sum = q if q_sum is None else accum(q_sum, q)
            if k % 16 == 0 or k == end_chunk - 1:
                # keep device scalars — a host int() here would drain the
                # whole async dispatch pipeline every 16 chunks (the relay
                # makes that the dominant wall-clock cost)
                history.append(stats)
        history = [tuple(int(np.asarray(x)) for x in row) for row in history]
    raw_pis = (pi_a, pi_b)
    # Resume state captures `between`'s raw loop outputs BEFORE the
    # avg_after / final_solver_iters post-processing below can replace
    # pi/v — a continuation must see exactly what the next chunk of an
    # uninterrupted run would have seen.  ``packed`` records the kernel
    # layout the trajectories were stepped under: resuming under the
    # OTHER layout diverges (statistically, not bit-exactly), so restore
    # with packed=bool(resume['packed']).
    resume = {"q": q, "v": v, "pi_a": raw_pis[0], "pi_b": raw_pis[1],
              "n": n, "fields": fields, "next_chunk": end_chunk,
              "packed": packed}
    averaged = avg_after and end_chunk - 1 >= avg_after
    if averaged and avg_q:
        W = end_chunk - max(avg_after, start_chunk)
        v, pi_a, pi_b = jax.jit(
            lambda qs: solve_matrix_games(
                qs / W, iters=final_solver_iters or solver_iters))(q_sum)
    elif averaged:
        norm = jax.jit(lambda s: s / s.sum(-1, keepdims=True))
        pi_a, pi_b = norm(pa_sum), norm(pb_sum)
    if final_solver_iters and not averaged:
        v, pi_a, pi_b = jax.jit(
            lambda q: solve_matrix_games(q, iters=final_solver_iters))(q)
    if return_state:
        return q, v, pi_a, pi_b, history, resume
    return q, v, pi_a, pi_b, history


def fused_best_response_train(cfg: EnvConfig, opp_policy, side: str,
                              batch: int, n_chunks: int,
                              chunk_len: int = 64, lr: float = 1.0,
                              gamma: float = 0.99, eps: float = 0.3,
                              eps_halflife: int = 0, eps_min: float = 0.05,
                              lr_anneal_start: int = 0,
                              lr_anneal_tau: float = 0.0,
                              lr_anneal_pow: float = 1.0,
                              seed: int = 0, interpret: bool = False,
                              mesh=None, init: tuple | None = None,
                              packed: bool | None = None,
                              start_chunk: int = 0,
                              fields_init: tuple | None = None,
                              return_state: bool = False,
                              chunks_per_dispatch: int = 1):
    """Fused SINGLE-AGENT training: best response against a FROZEN
    opponent at full kernel speed — the training shape of the reference's
    single-agent mode, where the opponent's policy is substituted at
    table-build time (soccer_simultaneous_env.py:187-188, reward flip for
    a B-learner :242-244) and which all its planners and its main() demo
    require (:507-520).

    Runs the SAME fused chunk kernel as `fused_minimax_train`; only the
    packing and the between-chunk update differ:

    * the frozen side's pi columns hold the one-hot policy with ZERO
      exploration (pack_m's per-side eps), so the opponent plays its
      policy exactly, as in the reference;
    * the learner's pi columns hold its greedy policy, eps-mixed;
    * between chunks the game solve is replaced by the best-response
      backup: for a learning A, v[s] = max_a q[s, a, opp[s]]; for a
      learning B (which maximizes -reward_a), v[s] = min_b q[s, opp[s],
      b].  Both leave q/v in A's reward perspective, matching the
      kernel's TD accumulation.

    ``opp_policy`` is a dense int policy [nS] (utils/policies array
    form); ``side`` is the LEARNING side ('player_a' or 'player_b').
    Returns (q, v, pi_a, pi_b, history) — v is A-perspective, so the
    learner's achieved value is v for A and -v for B; the learner's
    returned policy is its greedy one-hot, the opponent's its frozen
    one-hot.  ``init``: optional (q, n) warm start.  ``mesh`` shards the
    lane batch over devices exactly as in `fused_minimax_train`.

    ``start_chunk``/``fields_init``/``return_state`` give EXACT
    checkpoint/resume like the other fused trainers: with
    ``return_state=True`` a sixth element ``resume`` is returned — a
    dict of (q, n, fields, next_chunk) — and a follow-up call with
    ``init=(resume['q'], resume['n'])``,
    ``fields_init=resume['fields']``,
    ``start_chunk=resume['next_chunk']`` continues BIT-IDENTICALLY to an
    uninterrupted run (chunk seeds and schedules key off the absolute
    chunk index; the greedy pi/v and the packed M are pure functions of
    q, so only (q, n, fields) need saving).  The resume dict also
    records ``packed`` — restore with the same layout, or the
    continuation steps different trajectories.  ``stats_history``
    cadence differs by dispatch mode: the per-chunk loop records every
    16th chunk (plus the last); grouped dispatches record every
    chunk."""
    from ..core import tables
    assert side in ("player_a", "player_b")
    nS = tables.build_statespace(cfg).nS
    opp = jnp.asarray(opp_policy, jnp.int32)
    assert opp.shape == (nS,), f"opp_policy must be dense [{nS}]"
    opp_oh = jax.nn.one_hot(opp, N_ACTIONS, dtype=jnp.float32)
    learn_a = side == "player_a"
    if packed is None:
        packed = True

    q = jnp.zeros((nS, 5, 5), jnp.float32)
    n = jnp.zeros((nS, 5, 5), jnp.float32)
    if init is not None:
        q = jnp.asarray(init[0], jnp.float32)
        if len(init) > 1:
            n = jnp.asarray(init[1], jnp.float32)
    fields = init_state_fields(cfg, batch)
    if fields_init is not None:
        fields = tuple(jnp.asarray(f) for f in fields_init)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel.mesh import sharded_learner_chunk_fn
        sharded = sharded_learner_chunk_fn(cfg, mesh, batch, chunk_len,
                                           gamma=gamma, interpret=interpret,
                                           packed=packed)
        sh = NamedSharding(mesh, PartitionSpec("env", None))
        fields = tuple(jax.device_put(f, sh) for f in fields)
        chunk = sharded
    else:
        sg_chunk = packed_learner_chunk if packed else learner_chunk

        def chunk(seed_k, m, fields):
            return sg_chunk(cfg, seed_k, m, fields, batch, chunk_len,
                            gamma=gamma, interpret=interpret)

    def repack(pa, pb, q, v, ea, eb):
        if packed:
            return pack_m2(cfg, pa, pb, v, ea, eps_b=eb)
        return pack_m(cfg, pa, pb, q, v, ea, eps_b=eb)

    @jax.jit
    def between(q, n, v_chunk, acc, lr_now, eps_now):
        if packed:
            sum_res, cnt = unpack_acc2(cfg, acc)
            sum_td = sum_res + cnt * (v_chunk[:, None, None] - q)
        else:
            sum_td, cnt = unpack_acc(cfg, acc)
        n = n + cnt
        q = q + lr_now * sum_td / jnp.maximum(cnt, 1.0)
        if learn_a:
            q_eff = jnp.take_along_axis(
                q, opp[:, None, None], axis=2)[..., 0]      # [nS, 5] on a
            v = q_eff.max(-1)
            pi_l = jax.nn.one_hot(q_eff.argmax(-1), N_ACTIONS,
                                   dtype=jnp.float32)
            pa, pb = pi_l, opp_oh
            m = repack(pa, pb, q, v, eps_now, 0.0)
        else:
            q_eff = jnp.take_along_axis(
                q, opp[:, None, None], axis=1)[:, 0, :]     # [nS, 5] on b
            v = q_eff.min(-1)
            pi_l = jax.nn.one_hot(q_eff.argmin(-1), N_ACTIONS,
                                   dtype=jnp.float32)
            pa, pb = opp_oh, pi_l
            m = repack(pa, pb, q, v, 0.0, eps_now)
        return q, n, v, pa, pb, m

    def eps_at(k):
        d = eps * (0.5 ** (k * chunk_len / eps_halflife)
                   if eps_halflife else 1.0)
        return jnp.maximum(d, eps_min) if isinstance(k, jax.Array) \
            else max(d, eps_min)

    def lr_at(k):
        d = lr
        if lr_anneal_tau > 0:
            over = jnp.maximum(k - lr_anneal_start, 0.0) \
                if isinstance(k, jax.Array) else max(k - lr_anneal_start, 0)
            d = d * (1.0 + over / lr_anneal_tau) ** (-lr_anneal_pow)
        return d

    end_chunk = start_chunk + n_chunks
    if start_chunk == 0:
        uni = jnp.full((nS, 5), 0.2, jnp.float32)
        pa0, pb0 = (uni, opp_oh) if learn_a else (opp_oh, uni)
        ea0, eb0 = (eps, 0.0) if learn_a else (0.0, eps)
        v = jnp.zeros(nS, jnp.float32)
        m = jax.jit(repack)(pa0, pb0, q, v, ea0, eb0)
        pi_a, pi_b = pa0, pb0
    else:
        # Reconstruct exactly what the continuous run's `between` packed
        # after chunk start_chunk-1: greedy pi/v are pure functions of
        # the restored q, and that chunk saw eps_at(start_chunk-1) —
        # re-running `between` with a zero accumulator and lr 0 performs
        # precisely that recomputation (bit-identical jitted ops).
        zacc = jnp.zeros((sacc(cfg) if packed else spc(cfg), LANES),
                        jnp.float32)
        q, n, v, pi_a, pi_b, m = between(
            q, n, jnp.zeros(nS, jnp.float32), zacc, jnp.float32(0.0),
            jnp.float32(eps_at(start_chunk - 1)))
    history = []
    if chunks_per_dispatch > 1:
        # Grouped dispatches (see fused_minimax_train): one jitted scan
        # of g (chunk + between) bodies per dispatch; schedules computed
        # in-graph in f32 (host-f64 per-chunk schedules can differ by an
        # ulp, so the exact-resume contract stays on the default mode).
        g = chunks_per_dispatch

        def chunk_body(carry, k):
            fields, q, n, v, pa, pb, m = carry
            fields, acc, stats = chunk(seed * 1_000_003 + k, m, fields)
            kf = k.astype(jnp.float32)
            q, n, v, pa, pb, m = between(q, n, v, acc, lr_at(kf),
                                         eps_at(kf))
            return (fields, q, n, v, pa, pb, m), jnp.stack(
                [s.astype(jnp.int32) for s in stats])

        @jax.jit
        def seg_run(carry, ks):
            return jax.lax.scan(chunk_body, carry, ks)

        rem_body = jax.jit(chunk_body)
        carry = (fields, q, n, v, pi_a, pi_b, m)
        stats_rows = []
        full_end = start_chunk + ((end_chunk - start_chunk) // g) * g
        for s0 in range(start_chunk, full_end, g):
            carry, stats = seg_run(carry, jnp.arange(s0, s0 + g))
            stats_rows.append(stats)
        for k in range(full_end, end_chunk):
            carry, stats = rem_body(carry, jnp.int32(k))
            stats_rows.append(stats[None])
        fields, q, n, v, pi_a, pi_b, m = carry
        history = [tuple(int(x) for x in row)
                   for s in stats_rows for row in np.asarray(s)]
    else:
        for k in range(start_chunk, end_chunk):
            fields, acc, stats = chunk(seed * 1_000_003 + k, m, fields)
            q, n, v, pi_a, pi_b, m = between(
                q, n, v, acc, jnp.float32(lr_at(k)), jnp.float32(eps_at(k)))
            if k % 16 == 0 or k == end_chunk - 1:
                history.append(stats)
        history = [tuple(int(np.asarray(x)) for x in row)
                   for row in history]
    if return_state:
        return q, v, pi_a, pi_b, history, {
            "q": q, "n": n, "fields": fields, "next_chunk": end_chunk,
            "packed": packed}
    return q, v, pi_a, pi_b, history

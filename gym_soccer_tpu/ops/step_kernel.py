"""Fused pallas TPU rollout kernel.

The generic XLA engine (core/batch.py) reaches ~15.8M env-steps/s/chip;
its costs are per-step threefry calls, small gathers (move tables,
take_along_axis, dense-obs lookup) and scan overhead.  This kernel removes
all of them: the entire T-step rollout runs inside one pallas kernel with

* state resident in VMEM as (B/128, 128) int32 tiles,
* a counter-based in-register PRNG (murmur3 finalizer over
  (seed, step, word, lane) counters — the hardware `pltpu.prng_*`
  primitives hang this environment's remote Mosaic compiler, and plain
  VPU integer ops are just as cheap here) — one 32-bit word per decision
  pair, 16-bit fixed-point thresholds (bias <= 2^-16, statistically
  negligible; the bit-exact path is core/parity.py),
* transitions computed purely arithmetically (the same branchless collision
  chain as core/rules.py:resolve_outcomes, specialized inline — see the
  cross-distribution test in tests/test_pallas_kernel.py),
* random-vs-random behavior policy and episode statistics accumulated
  in-register, so nothing leaves the chip until the end.

Scope: throughput/bench path (BASELINE configs 2).  Learner integration
keeps the XLA engine (scatter updates need HBM tables anyway).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import EnvConfig

LANES = 128


class GeoPlanes:
    """Per-lane geometry as int32 planes — duck-types EnvConfig inside the
    kernel helpers (which are all elementwise, so static ints and planes
    are interchangeable).  This is what makes the MULTIGRID kernel one
    compilation for any mixture of board geometries (BASELINE config 4):
    geometry is data, not code."""

    def __init__(self, H, W, glo, ghi, q_int, max_steps: int):
        self.H, self.W = H, W
        self.glo, self.ghi = glo, ghi        # inclusive goal-row range
        self.q_int = q_int                    # round(slip * 65536)
        self.max_steps = max_steps            # static (shared across lanes)

    @property
    def goal_row_bounds(self):
        """Duck-types EnvConfig.goal_row_bounds so the closed-form cell
        codes (core/rules.cell_encode/cellpair_encode) work per-lane —
        what lets the fused MULTIGRID learner index its packed tables."""
        return self.glo, self.ghi


def _in_goal_rows(x, cfg):
    if isinstance(cfg, GeoPlanes):
        return (x >= cfg.glo) & (x <= cfg.ghi)
    m = x == cfg.goal_rows[0]
    for r in cfg.goal_rows[1:]:
        m = m | (x == r)
    return m


def _next_cell(x, y, mc, mr, ball, cfg: EnvConfig):
    nx = jnp.clip(x + mr, 0, cfg.H - 1)
    nyt = y + mc
    xoob = (nyt == 0) | (nyt == cfg.W - 1)
    goal = xoob & _in_goal_rows(nx, cfg) & ball
    ny = jnp.where(xoob & ~goal, y, nyt)
    return nx, ny


def _fmix32(x):
    """murmur3 finalizer: full-avalanche 32-bit mix (uint32 in/out)."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _random_word(seed, step, widx, lane_ctr):
    """One uint32 of pseudo-randomness per lane from a unique counter
    (seed, step, word-index, lane)."""
    c = (seed * jnp.uint32(0x9E3779B9)
         + step.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         + jnp.uint32(widx) * jnp.uint32(0xC2B2AE3D))
    return _fmix32(_fmix32(lane_ctr ^ c) + c)


def _action_move(a):
    """(dcol, drow) of an action, arithmetically (no table gather)."""
    mc = (a == 3).astype(jnp.int32) - (a == 4).astype(jnp.int32)
    mr = (a == 2).astype(jnp.int32) - (a == 1).astype(jnp.int32)
    return mc, mr


def _slipped_move(a, u16, q_int: int):
    """Apply the orthogonal-slip rule: keep the intended move with
    p = 1-q, else one of the two orthogonals (q/2 each).  ``u16`` uniform
    in [0, 65536); ``q_int`` = round(q * 65536)."""
    mc, mr = _action_move(a)
    t_keep = 65536 - q_int
    t_half = 65536 - q_int // 2
    keep = u16 < t_keep
    first = u16 < t_half
    # orthogonals of (mc, mr): (-mr, mc) then (mr, -mc)
    omc = jnp.where(first, -mr, mr)
    omr = jnp.where(first, mc, -mc)
    return jnp.where(keep, mc, omc), jnp.where(keep, mr, omr)


def isd_spread_fields(cfg: EnvConfig, batch: int, shape):
    """Lane-tiled initial state fields spread uniformly over the ISD.
    (Starting every lane in the same ISD entry measurably biases aggregate
    rewards: possession near your own goal is an own-goal risk under random
    play — a ~5-sigma effect over 8192 first episodes.)"""
    import numpy as np
    from ..core import rules, tables
    _, raws = tables.build_isd(cfg)
    fs = np.stack([np.array(rules.raw_decode(np, int(r), cfg), np.int32)
                   for r in raws])  # [nI, 5]
    lane_isd = (np.arange(batch, dtype=np.int64) % len(raws)).reshape(shape)
    return tuple(jnp.asarray(fs[lane_isd, f]) for f in range(5))


def _isd_lookup(idx, cfg: EnvConfig):
    """Initial state fields by ISD index, arithmetically (nI is 2 or 4)."""
    from ..core import tables
    import numpy as np
    from ..core import rules as _rules
    _, raws = tables.build_isd(cfg)
    fields = [tuple(int(v) for v in _rules.raw_decode(np, int(r), cfg))
              for r in raws]
    outs = []
    for f in range(5):
        v = jnp.full_like(idx, fields[0][f])
        for i in range(1, len(fields)):
            v = jnp.where(idx == i, fields[i][f], v)
        outs.append(v)
    return outs


def _u16(w, hi):
    return ((w >> (16 if hi else 0)) & 0xFFFF).astype(jnp.int32)


def transition_core(ra, ca, rb, cb, p, aa, ab, bits1, bits2,
                    cfg: EnvConfig, q_int: int):
    """Pure game transition given CHOSEN actions: slips, collision chain,
    goal detection.  Returns (nra, nca, nrb, ncb, npz, goal, r) WITHOUT
    autoreset/bookkeeping — shared by the random-rollout and learner
    kernels."""
    u = _u16
    mca, mra = _slipped_move(aa, u(bits1, 0), q_int)
    mcb, mrb = _slipped_move(ab, u(bits1, 1), q_int)

    has_a, has_b = p == 0, p == 1
    nxa, nya = _next_cell(ra, ca, mca, mra, has_a, cfg)
    nxb, nyb = _next_cell(rb, cb, mcb, mrb, has_b, cfg)

    # collision chain (reference priority order; see core/rules.py)
    c1 = ((ra == rb) & (jnp.abs(ca - cb) == 1) & (nya == cb) & (nyb == ca)) | \
         ((ca == cb) & (jnp.abs(ra - rb) == 1) & (nxa == rb) & (nxb == ra))
    c2 = ~c1 & (((nxa == rb) & (nya == cb) & (ab == 0)) |
                ((nxb == ra) & (nyb == ca) & (aa == 0)))
    c3 = ~c1 & ~c2 & (
        ((ra == nxa) & (ca == nya) & (aa != 0) & (nxb == ra) & (nyb == ca)) |
        ((rb == nxb) & (cb == nyb) & (ab != 0) & (nxa == rb) & (nya == cb)))
    c4 = ~c1 & ~c2 & ~c3 & (nxa == nxb) & (nya == nyb)
    c5 = ~c1 & ~c2 & ~c3 & ~c4

    coin_poss = (u(bits2, 0) & 1).astype(jnp.int32)   # 50/50 possession
    coin_who = ((u(bits2, 0) >> 1) & 1) == 1          # c4: who advances

    a_moves = c5 | (c4 & coin_who)
    b_moves = c5 | (c4 & ~coin_who)
    nra = jnp.where(a_moves, nxa, ra)
    nca = jnp.where(a_moves, nya, ca)
    nrb = jnp.where(b_moves, nxb, rb)
    ncb = jnp.where(b_moves, nyb, cb)
    npz = jnp.where(c2, 1 - p, jnp.where(c1 | c3 | c4, coin_poss, p))

    ball_col = jnp.where(npz == 0, nca, ncb)
    # logical (not select) combination: Mosaic has no i1 select
    a_ball = npz == 0
    gr = (a_ball & _in_goal_rows(nra, cfg)) | (~a_ball & _in_goal_rows(nrb, cfg))
    goal = gr & ((ball_col == 0) | (ball_col == cfg.W - 1))
    r = jnp.where(goal,
                  jnp.where(ball_col == cfg.W - 1, 1, -1), 0).astype(jnp.int32)
    return nra, nca, nrb, ncb, npz, goal, r


def _isd_fields_arith(idx, H, W, xp=jnp):
    """Initial state fields from the geometry, arithmetically (the kernel
    twin of core/multigrid._isd_fields — reference _generate_isd,
    soccer_simultaneous_env.py:146-165).  ``idx`` uniform in [0, 4) for
    even-H boards, [0, 2) for odd-H.  (For odd H the two middle-row
    formulas coincide: H//2 == (H-1)//2.)"""
    even = (H % 2) == 0
    mid_hi = H // 2
    mid_lo = (H - 1) // 2
    swap = (idx // 2) == 1
    ira = xp.where(even & swap, mid_hi, mid_lo)
    irb = xp.where(even & swap, mid_lo, mid_hi)
    ip = idx % 2
    ica = xp.full_like(ira, 2)
    icb = W - 3
    return ira, ica, irb, icb, ip


def autoreset_core(nra, nca, nrb, ncb, npz, t, goal, bits2,
                   cfg):
    """Truncation + uniform-ISD autoreset; returns updated fields, t,
    trunc flag.  ``cfg`` is a static EnvConfig or per-lane GeoPlanes."""
    t = t + 1
    trunc = (t >= cfg.max_steps) & ~goal
    term = goal | trunc
    if isinstance(cfg, GeoPlanes):
        n_entries = jnp.where((cfg.H % 2) == 0, 4, 2)
        isd_idx = _u16(bits2, 1) % n_entries    # exact: 65536 % {2,4} == 0
        ira, ica, irb, icb, ip = _isd_fields_arith(isd_idx, cfg.H, cfg.W)
    else:
        nI = 4 if len(cfg.goal_rows) % 2 == 0 else 2
        isd_idx = _u16(bits2, 1) % nI
        ira, ica, irb, icb, ip = _isd_lookup(isd_idx, cfg)
    nra = jnp.where(term, ira, nra)
    nca = jnp.where(term, ica, nca)
    nrb = jnp.where(term, irb, nrb)
    ncb = jnp.where(term, icb, ncb)
    npz = jnp.where(term, ip, npz)
    t = jnp.where(term, 0, t)
    return nra, nca, nrb, ncb, npz, t, trunc


def _step_once(carry, bits0, bits1, bits2, cfg: EnvConfig, q_int: int):
    ra, ca, rb, cb, p, t, rew, goals, truncs = carry
    aa = _u16(bits0, 0) % 5
    ab = _u16(bits0, 1) % 5
    nra, nca, nrb, ncb, npz, goal, r = transition_core(
        ra, ca, rb, cb, p, aa, ab, bits1, bits2, cfg, q_int)
    nra, nca, nrb, ncb, npz, t, trunc = autoreset_core(
        nra, nca, nrb, ncb, npz, t, goal, bits2, cfg)
    return (nra, nca, nrb, ncb, npz, t,
            rew + r, goals + goal.astype(jnp.int32),
            truncs + trunc.astype(jnp.int32))


def _rollout_kernel(seed_ref, ra_ref, ca_ref, rb_ref, cb_ref, p_ref, t_ref,
                    ora, oca, orb, ocb, op, ot, stats_ref,
                    *, cfg: EnvConfig, n_steps: int, q_int: int):
    seed = seed_ref[0].astype(jnp.uint32)
    off = seed_ref[1]  # absolute step offset (chained dispatch)
    shape = ra_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    # GLOBAL lane id (batches beyond one VMEM block run as a grid over
    # batch blocks; each block must draw from disjoint counter streams)
    block = pl.program_id(0).astype(jnp.uint32)
    lane_ctr = (block * jnp.uint32(shape[0] * shape[1])
                + rows * jnp.uint32(shape[1]) + cols)

    def body(i, carry):
        bits0 = _random_word(seed, i + off, 0, lane_ctr)
        bits1 = _random_word(seed, i + off, 1, lane_ctr)
        bits2 = _random_word(seed, i + off, 2, lane_ctr)
        return _step_once(carry, bits0, bits1, bits2, cfg, q_int)

    zeros = jnp.zeros(shape, jnp.int32)
    carry = (ra_ref[:], ca_ref[:], rb_ref[:], cb_ref[:], p_ref[:], t_ref[:],
             zeros, zeros, zeros)
    carry = jax.lax.fori_loop(0, n_steps, body, carry)
    ra, ca, rb, cb, p, t, rew, goals, truncs = carry
    ora[:], oca[:], orb[:], ocb[:], op[:], ot[:] = ra, ca, rb, cb, p, t
    b = pl.program_id(0)  # stats_ref is the whole [n_blocks, 3] SMEM array
    stats_ref[b, 0] = jnp.sum(rew)
    stats_ref[b, 1] = jnp.sum(goals)
    stats_ref[b, 2] = jnp.sum(truncs)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "batch", "interpret",
                                    "block_rows"))
def pallas_rollout(cfg: EnvConfig, seed: jax.Array, batch: int,
                   n_steps: int, interpret: bool = False,
                   block_rows: int | None = None,
                   init_fields=None, step_offset=0):
    """Run `n_steps` of random-vs-random self-play for `batch` envs fully
    on-chip.  Returns (final_state_fields, (reward_sum, goals, truncs)).

    `batch` must be a multiple of 1024 (tiled as [batch/128, 128] int32).
    ``block_rows`` overrides the batch-block height (testing hook); the
    counter PRNG is keyed on GLOBAL lane id, so results are bit-invariant
    to the blocking.  ``init_fields``/``step_offset`` resume from a prior
    call's final fields at absolute step ``step_offset`` — chaining calls
    reproduces one long call's bit stream exactly (the PRNG counter is
    the absolute step index); see `pallas_rollout_chained`.
    """
    assert batch % (8 * LANES) == 0, "batch must be a multiple of 1024"
    shape = (batch // LANES, LANES)
    q_int = int(round(cfg.slip_prob * 65536))

    # VMEM holds ~12 int32 planes of the batch (6 state in + carry/out);
    # block the batch and run a grid when it would exceed ~half of VMEM.
    # 32768 lanes x 12 planes x 4 B ~= 1.6 MB/plane block, well clear of
    # the 16 MB scoped limit; 131072 lanes in one block OOMs the compiler.
    if block_rows:
        if shape[0] % block_rows:
            raise ValueError(
                f"block_rows={block_rows} does not divide the batch's "
                f"{shape[0]} rows")
        BLOCK_ROWS = block_rows
    else:
        # Largest divisor of the row count within the VMEM cap.  Rows are
        # always a multiple of 8 (batch % 1024 == 0), so a divisor <= 256
        # always exists — never silently fall back to one giant block (the
        # compiler OOMs / wedges the relay above ~32768-lane blocks).
        cap = min(shape[0], 32768 // LANES)
        BLOCK_ROWS = next(r for r in range(cap, 0, -1) if shape[0] % r == 0)
    n_blocks = shape[0] // BLOCK_ROWS
    blk = (BLOCK_ROWS, LANES)

    if init_fields is None:
        init = list(isd_spread_fields(cfg, batch, shape))
        init.append(jnp.zeros(shape, jnp.int32))          # t
    else:
        init = [jnp.asarray(f) for f in init_fields]
        assert len(init) == 6, "init_fields = 6 arrays (ra,ca,rb,cb,p,t)"

    kernel = functools.partial(_rollout_kernel, cfg=cfg, n_steps=n_steps,
                               q_int=q_int)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 6 +
                  [jax.ShapeDtypeStruct((n_blocks, 3), jnp.int32)])
    state_spec = pl.BlockSpec(blk, lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    smem_in = jnp.stack([jnp.asarray(seed, jnp.int32),
                         jnp.asarray(step_offset, jnp.int32)])
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [state_spec] * 6,
        out_specs=tuple([state_spec] * 6 +
                        [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        interpret=interpret,
    )(smem_in, *init)
    *fields, stats = outs
    stats = stats.sum(axis=0)
    return tuple(fields), (stats[0], stats[1], stats[2])


def pallas_rollout_chained(cfg: EnvConfig, seed, batch: int, n_steps: int,
                           steps_per_call: int = 12288,
                           interpret: bool = False,
                           block_rows: int | None = None):
    """`pallas_rollout` split into chained shorter dispatches (state and
    stats carried between calls) — bit-identical to one long call, but
    each kernel stays under the ~20k fused-steps ceiling beyond which a
    single pallas dispatch has wedged the tunneled relay (CLAUDE.md).
    Use this for any leg longer than ~15k steps."""
    fields = None
    stats = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    done = 0
    while done < n_steps:
        t = min(steps_per_call, n_steps - done)
        fields, st = pallas_rollout(cfg, seed, batch, t, interpret=interpret,
                                    block_rows=block_rows,
                                    init_fields=fields, step_offset=done)
        stats = tuple(a + b for a, b in zip(stats, st))
        done += t
    return fields, stats


# ----------------------------------------------------------------------
# Alternating-turn fused rollout (envs/soccer_alternating_env semantics)
# ----------------------------------------------------------------------

def alt_transition_core(ra, ca, rb, cb, p, turn, a, bits1, cfg: EnvConfig,
                        q_int: int):
    """Alternating-turn transition, arithmetically (the kernel twin of
    envs/soccer_alternating_env.alt_transition): the mover's slipped move,
    steal-on-contact (possession to the invaded opponent), goal check.
    Returns (nra, nca, nrb, ncb, npz, goal, r); the caller flips turn."""
    u = _u16
    mc, mr = _slipped_move(a, u(bits1, 0), q_int)
    a_moves = turn == 0
    mx = jnp.where(a_moves, ra, rb)
    my = jnp.where(a_moves, ca, cb)
    ox = jnp.where(a_moves, rb, ra)
    oy = jnp.where(a_moves, cb, ca)
    ball = p == turn
    nx, ny = _next_cell(mx, my, mc, mr, ball, cfg)
    collide = (nx == ox) & (ny == oy)
    nx = jnp.where(collide, mx, nx)
    ny = jnp.where(collide, my, ny)
    npz = jnp.where(collide, 1 - turn, p)
    nra = jnp.where(a_moves, nx, ra)
    nca = jnp.where(a_moves, ny, ca)
    nrb = jnp.where(a_moves, rb, nx)
    ncb = jnp.where(a_moves, cb, ny)
    a_ball = npz == 0
    ball_col = jnp.where(a_ball, nca, ncb)
    gr = (a_ball & _in_goal_rows(nra, cfg)) | \
         (~a_ball & _in_goal_rows(nrb, cfg))
    goal = gr & ((ball_col == 0) | (ball_col == cfg.W - 1))
    r = jnp.where(goal, jnp.where(ball_col == cfg.W - 1, 1, -1),
                  0).astype(jnp.int32)
    return nra, nca, nrb, ncb, npz, goal, r


def _alt_step_once(carry, bits0, bits1, bits2, cfg: EnvConfig, q_int: int):
    ra, ca, rb, cb, p, turn, t, rew, goals, truncs = carry
    a = _u16(bits0, 0) % 5
    nra, nca, nrb, ncb, npz, goal, r = alt_transition_core(
        ra, ca, rb, cb, p, turn, a, bits1, cfg, q_int)
    nra, nca, nrb, ncb, npz, t, trunc = autoreset_core(
        nra, nca, nrb, ncb, npz, t, goal, bits2, cfg)
    term = goal | trunc
    nturn = jnp.where(term, 0, 1 - turn)
    return (nra, nca, nrb, ncb, npz, nturn, t,
            rew + r, goals + goal.astype(jnp.int32),
            truncs + trunc.astype(jnp.int32))


def _alt_rollout_kernel(seed_ref, ra_ref, ca_ref, rb_ref, cb_ref, p_ref,
                        turn_ref, t_ref,
                        ora, oca, orb, ocb, op, oturn, ot, stats_ref,
                        *, cfg: EnvConfig, n_steps: int, q_int: int):
    seed = seed_ref[0].astype(jnp.uint32)
    off = seed_ref[1]  # absolute step offset (chained dispatch)
    shape = ra_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    block = pl.program_id(0).astype(jnp.uint32)
    lane_ctr = (block * jnp.uint32(shape[0] * shape[1])
                + rows * jnp.uint32(shape[1]) + cols)

    def body(i, carry):
        bits0 = _random_word(seed, i + off, 0, lane_ctr)
        bits1 = _random_word(seed, i + off, 1, lane_ctr)
        bits2 = _random_word(seed, i + off, 2, lane_ctr)
        return _alt_step_once(carry, bits0, bits1, bits2, cfg, q_int)

    zeros = jnp.zeros(shape, jnp.int32)
    carry = (ra_ref[:], ca_ref[:], rb_ref[:], cb_ref[:], p_ref[:],
             turn_ref[:], t_ref[:], zeros, zeros, zeros)
    carry = jax.lax.fori_loop(0, n_steps, body, carry)
    ra, ca, rb, cb, p, turn, t, rew, goals, truncs = carry
    ora[:], oca[:], orb[:], ocb[:] = ra, ca, rb, cb
    op[:], oturn[:], ot[:] = p, turn, t
    b = pl.program_id(0)
    stats_ref[b, 0] = jnp.sum(rew)
    stats_ref[b, 1] = jnp.sum(goals)
    stats_ref[b, 2] = jnp.sum(truncs)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "batch", "interpret",
                                    "block_rows"))
def pallas_alt_rollout(cfg: EnvConfig, seed: jax.Array, batch: int,
                       n_steps: int, interpret: bool = False,
                       block_rows: int | None = None,
                       init_fields=None, step_offset=0):
    """Fused random-play rollout of the ALTERNATING-turn game: `n_steps`
    single-mover ticks for `batch` envs fully on-chip (same VMEM/blocking/
    counter-PRNG/chaining scheme as `pallas_rollout`).  Returns
    (final fields (ra, ca, rb, cb, p, turn, t), (reward_sum, goals,
    truncs))."""
    assert batch % (8 * LANES) == 0, "batch must be a multiple of 1024"
    shape = (batch // LANES, LANES)
    q_int = int(round(cfg.slip_prob * 65536))

    if block_rows:
        if shape[0] % block_rows:
            raise ValueError(
                f"block_rows={block_rows} does not divide the batch's "
                f"{shape[0]} rows")
        BLOCK_ROWS = block_rows
    else:
        cap = min(shape[0], 32768 // LANES)
        BLOCK_ROWS = next(r for r in range(cap, 0, -1) if shape[0] % r == 0)
    n_blocks = shape[0] // BLOCK_ROWS
    blk = (BLOCK_ROWS, LANES)

    if init_fields is None:
        init = list(isd_spread_fields(cfg, batch, shape))
        init.append(jnp.zeros(shape, jnp.int32))          # turn
        init.append(jnp.zeros(shape, jnp.int32))          # t
    else:
        init = [jnp.asarray(f) for f in init_fields]
        assert len(init) == 7, \
            "init_fields = 7 arrays (ra,ca,rb,cb,p,turn,t)"

    kernel = functools.partial(_alt_rollout_kernel, cfg=cfg,
                               n_steps=n_steps, q_int=q_int)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 7 +
                  [jax.ShapeDtypeStruct((n_blocks, 3), jnp.int32)])
    state_spec = pl.BlockSpec(blk, lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    smem_in = jnp.stack([jnp.asarray(seed, jnp.int32),
                         jnp.asarray(step_offset, jnp.int32)])
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [state_spec] * 7,
        out_specs=tuple([state_spec] * 7 +
                        [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        interpret=interpret,
    )(smem_in, *init)
    *fields, stats = outs
    stats = stats.sum(axis=0)
    return tuple(fields), (stats[0], stats[1], stats[2])


# ----------------------------------------------------------------------
# Multigrid fused rollout: a MIXTURE of geometries in one kernel
# (BASELINE config 4 at pallas speed — the kernel twin of core/multigrid)
# ----------------------------------------------------------------------

def _mg_rollout_kernel(seed_ref, h_ref, w_ref, glo_ref, ghi_ref, q_ref,
                       vid_ref, ra_ref, ca_ref, rb_ref, cb_ref, p_ref, t_ref,
                       ora, oca, orb, ocb, op, ot, stats_ref,
                       *, n_steps: int, n_variants: int, max_steps: int):
    seed = seed_ref[0].astype(jnp.uint32)
    off = seed_ref[1]
    shape = ra_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    block = pl.program_id(0).astype(jnp.uint32)
    lane_ctr = (block * jnp.uint32(shape[0] * shape[1])
                + rows * jnp.uint32(shape[1]) + cols)

    geo = GeoPlanes(H=h_ref[:], W=w_ref[:], glo=glo_ref[:], ghi=ghi_ref[:],
                    q_int=q_ref[:], max_steps=max_steps)

    def body(i, carry):
        bits0 = _random_word(seed, i + off, 0, lane_ctr)
        bits1 = _random_word(seed, i + off, 1, lane_ctr)
        bits2 = _random_word(seed, i + off, 2, lane_ctr)
        return _step_once(carry, bits0, bits1, bits2, geo, geo.q_int)

    zeros = jnp.zeros(shape, jnp.int32)
    carry = (ra_ref[:], ca_ref[:], rb_ref[:], cb_ref[:], p_ref[:], t_ref[:],
             zeros, zeros, zeros)
    carry = jax.lax.fori_loop(0, n_steps, body, carry)
    ra, ca, rb, cb, p, t, rew, goals, truncs = carry
    ora[:], oca[:], orb[:], ocb[:], op[:], ot[:] = ra, ca, rb, cb, p, t
    b = pl.program_id(0)
    vid = vid_ref[:]
    for v in range(n_variants):   # static unroll: per-variant masked sums
        m = (vid == v).astype(jnp.int32)
        stats_ref[b, v, 0] = jnp.sum(rew * m)
        stats_ref[b, v, 1] = jnp.sum(goals * m)
        stats_ref[b, v, 2] = jnp.sum(truncs * m)


def _mg_planes(cfgs, batch: int, shape, layout: str = "roundrobin"):
    """Host-side per-lane geometry planes + arithmetic-ISD-spread initial
    state.  ``layout``: 'roundrobin' assigns lane i -> cfgs[i % nV]
    (matching core/multigrid.lane_geometry); 'blocked' assigns variants
    in contiguous near-equal chunks, which makes almost every kernel
    lane-block single-variant — that is what lets the fused MULTIGRID
    learner's locality-adaptive slab bounds touch only the block's own
    variant's table rows.  Either layout is correct; they differ only in
    which lane runs which board."""
    import numpy as np
    nV = len(cfgs)
    lanes = np.arange(batch, dtype=np.int64)
    if layout == "blocked":
        idx = lanes * nV // batch
    else:
        idx = lanes % nV
    H = np.asarray([c.H for c in cfgs], np.int32)[idx]
    W = np.asarray([c.W for c in cfgs], np.int32)[idx]
    glo = np.asarray([c.goal_row_bounds[0] for c in cfgs], np.int32)[idx]
    ghi = np.asarray([c.goal_row_bounds[1] for c in cfgs], np.int32)[idx]
    q = np.asarray([int(round(c.slip_prob * 65536)) for c in cfgs],
                   np.int32)[idx]
    vid = idx.astype(np.int32)

    n_entries = np.where(H % 2 == 0, 4, 2)
    isd = (np.arange(batch, dtype=np.int64) // nV) % n_entries
    ira, ica, irb, icb, ip = _isd_fields_arith(isd.astype(np.int32),
                                               H, W, xp=np)
    planes = [H, W, glo, ghi, q, vid]
    init = [np.asarray(a, np.int32) for a in (ira, ica, irb, icb, ip)]
    return ([jnp.asarray(p.reshape(shape)) for p in planes],
            [jnp.asarray(f.reshape(shape)) for f in init])


@functools.partial(jax.jit,
                   static_argnames=("cfgs", "n_steps", "batch", "interpret",
                                    "block_rows"))
def pallas_multigrid_rollout(cfgs: tuple, seed: jax.Array, batch: int,
                             n_steps: int, interpret: bool = False,
                             block_rows: int | None = None,
                             init_fields=None, step_offset=0):
    """Fused random-vs-random rollout over a MIXED-geometry batch: board
    height/width, goal-row range and slip probability are per-lane int32
    PLANES (GeoPlanes), so ONE compiled kernel steps any mixture of
    Littman-soccer variants at full pallas speed — the kernel twin of
    core/multigrid.step (BASELINE config 4).  Lanes are assigned variants
    round-robin (lane i -> cfgs[i % len(cfgs)]).

    Returns (final fields (ra, ca, rb, cb, p, t),
    per-variant stats int32 [len(cfgs), 3] = (reward_sum, goals, truncs)).
    Chaining via (init_fields, step_offset) as in `pallas_rollout`."""
    assert batch % (8 * LANES) == 0, "batch must be a multiple of 1024"
    assert len({c.max_steps for c in cfgs}) == 1, \
        "variants must share max_steps (truncation plane otherwise)"
    shape = (batch // LANES, LANES)

    if block_rows:
        if shape[0] % block_rows:
            raise ValueError(
                f"block_rows={block_rows} does not divide the batch's "
                f"{shape[0]} rows")
        BLOCK_ROWS = block_rows
    else:
        cap = min(shape[0], 32768 // LANES)
        BLOCK_ROWS = next(r for r in range(cap, 0, -1) if shape[0] % r == 0)
    n_blocks = shape[0] // BLOCK_ROWS
    blk = (BLOCK_ROWS, LANES)

    planes, isd_init = _mg_planes(cfgs, batch, shape)
    if init_fields is None:
        init = isd_init + [jnp.zeros(shape, jnp.int32)]       # t
    else:
        init = [jnp.asarray(f) for f in init_fields]
        assert len(init) == 6, "init_fields = 6 arrays (ra,ca,rb,cb,p,t)"

    nV = len(cfgs)
    kernel = functools.partial(_mg_rollout_kernel, n_steps=n_steps,
                               n_variants=nV,
                               max_steps=cfgs[0].max_steps)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 6 +
                  [jax.ShapeDtypeStruct((n_blocks, nV, 3), jnp.int32)])
    state_spec = pl.BlockSpec(blk, lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
    smem_in = jnp.stack([jnp.asarray(seed, jnp.int32),
                         jnp.asarray(step_offset, jnp.int32)])
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=tuple(out_shapes),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)]
                  + [state_spec] * 12),
        out_specs=tuple([state_spec] * 6 +
                        [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        interpret=interpret,
    )(smem_in, *planes, *init)
    *fields, stats = outs
    return tuple(fields), stats.sum(axis=0)


def pallas_multigrid_rollout_chained(cfgs: tuple, seed, batch: int,
                                     n_steps: int,
                                     steps_per_call: int = 12288,
                                     interpret: bool = False,
                                     block_rows: int | None = None):
    """`pallas_multigrid_rollout` as chained shorter dispatches — see
    `pallas_rollout_chained`."""
    fields = None
    stats = jnp.zeros((len(cfgs), 3), jnp.int32)
    done = 0
    while done < n_steps:
        t = min(steps_per_call, n_steps - done)
        fields, st = pallas_multigrid_rollout(
            cfgs, seed, batch, t, interpret=interpret,
            block_rows=block_rows, init_fields=fields, step_offset=done)
        stats = stats + st
        done += t
    return fields, stats


# ----------------------------------------------------------------------
# JOURNALED fused rollout: full per-step trajectories at pallas speed
# ----------------------------------------------------------------------
# The reference's step() emits the full transition every tick — obs,
# rewards, dones, truncateds, infos (soccer_simultaneous_env.py:375-408).
# The stats-only fused kernel above discards that stream; the XLA
# journaling path (core/batch.rollout) keeps it but tops out ~100M
# steps/s (HBM-bound [T, B] StepOut stacking plus per-step overheads).
# This kernel journals ONE packed int32 word per lane-step into an HBM
# ring while stepping at fused-kernel speed: the time axis becomes the
# inner grid dimension, so each (T_inner, rows, 128) journal slab is
# pipelined out to HBM by pallas while the next slab is computed —
# state stays VMEM-resident across the whole dispatch.
#
# Word layout (little end first):
#   bits  0-15  raw state code of the PRE-autoreset next state
#               (mixed-radix, core/rules.raw_encode; needs H*W*H*W*2
#               <= 65536 — holds for every BASELINE grid incl. 11x7's
#               16562)
#   bits 16-20  joint action aa * 5 + ab
#   bit  21     goal (done)
#   bit  22     truncation
#   bit  23     reward sign (set iff reward_a == +1; with bit 21 this
#               reconstructs the exact reward in {-1, 0, +1})
#   bits 24-25  autoreset ISD index (which initial state a terminated
#               lane teleported to) — makes the journal self-contained:
#               the post-reset observation is recovered WITHOUT replaying
#               the RNG
# `unpack_journal` decodes the stream into the reference-shaped
# per-step arrays (obs / final_obs / actions / reward / done / trunc).


def _journal_kernel(seed_ref, ra_ref, ca_ref, rb_ref, cb_ref, p_ref, t_ref,
                    ora, oca, orb, ocb, op, ot, stats_ref, jr_ref,
                    *, cfg: EnvConfig, t_inner: int, q_int: int):
    from ..core import rules
    seed = seed_ref[0].astype(jnp.uint32)
    off = seed_ref[1]
    b = pl.program_id(0)
    j = pl.program_id(1)          # time-slab index (inner grid dim)
    shape = ra_ref.shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    block = b.astype(jnp.uint32)
    lane_ctr = (block * jnp.uint32(shape[0] * shape[1])
                + rows * jnp.uint32(shape[1]) + cols)
    nI = 4 if len(cfg.goal_rows) % 2 == 0 else 2

    @pl.when(j == 0)
    def _init():
        # first time slab of this lane block: state comes from the inputs;
        # later slabs continue from the VMEM-resident output refs (their
        # index map is constant in j, so the block is never written back
        # until the last slab)
        ora[:], oca[:] = ra_ref[:], ca_ref[:]
        orb[:], ocb[:] = rb_ref[:], cb_ref[:]
        op[:], ot[:] = p_ref[:], t_ref[:]
        stats_ref[b, 0] = 0
        stats_ref[b, 1] = 0
        stats_ref[b, 2] = 0

    def body(i, carry):
        ra, ca, rb, cb, p, t, rew, goals, truncs = carry
        step_idx = j * t_inner + i + off
        bits0 = _random_word(seed, step_idx, 0, lane_ctr)
        bits1 = _random_word(seed, step_idx, 1, lane_ctr)
        bits2 = _random_word(seed, step_idx, 2, lane_ctr)
        aa = _u16(bits0, 0) % 5
        ab = _u16(bits0, 1) % 5
        nra, nca, nrb, ncb, npz, goal, r = transition_core(
            ra, ca, rb, cb, p, aa, ab, bits1, bits2, cfg, q_int)
        raw = rules.raw_encode(jnp, nra, nca, nrb, ncb, npz, cfg)
        fra, fca, frb, fcb, fpz, t2, trunc = autoreset_core(
            nra, nca, nrb, ncb, npz, t, goal, bits2, cfg)
        isd_idx = _u16(bits2, 1) % nI     # same draw autoreset_core used
        word = (raw
                | ((aa * 5 + ab) << 16)
                | (goal.astype(jnp.int32) << 21)
                | (trunc.astype(jnp.int32) << 22)
                | ((r == 1).astype(jnp.int32) << 23)
                | (isd_idx << 24))
        jr_ref[pl.ds(i, 1)] = word[None]
        return (fra, fca, frb, fcb, fpz, t2,
                rew + r, goals + goal.astype(jnp.int32),
                truncs + trunc.astype(jnp.int32))

    zeros = jnp.zeros(shape, jnp.int32)
    carry = (ora[:], oca[:], orb[:], ocb[:], op[:], ot[:],
             zeros, zeros, zeros)
    ra, ca, rb, cb, p, t, rew, goals, truncs = jax.lax.fori_loop(
        0, t_inner, body, carry)
    ora[:], oca[:], orb[:], ocb[:] = ra, ca, rb, cb
    op[:], ot[:] = p, t
    stats_ref[b, 0] = stats_ref[b, 0] + jnp.sum(rew)
    stats_ref[b, 1] = stats_ref[b, 1] + jnp.sum(goals)
    stats_ref[b, 2] = stats_ref[b, 2] + jnp.sum(truncs)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "batch", "interpret",
                                    "block_rows", "t_inner"))
def pallas_journal_rollout(cfg: EnvConfig, seed: jax.Array, batch: int,
                           n_steps: int, interpret: bool = False,
                           block_rows: int | None = None,
                           t_inner: int | None = None,
                           init_fields=None, step_offset=0):
    """Random-vs-random fused rollout that JOURNALS every transition.

    Bit-identical trajectories to `pallas_rollout` (same counter PRNG on
    global lane ids, same transition path) plus a packed int32 journal
    [n_steps, batch/128, 128] — one word per lane-step, layout above;
    decode with `unpack_journal`.  Returns (final_fields, stats, journal).

    ``t_inner`` (default auto) is the time-slab height: the journal is
    written as (t_inner, block_rows, 128) VMEM slabs that pallas pipelines
    to HBM while the next slab computes.  n_steps must be divisible by the
    chosen t_inner.  Chain long measurement legs with
    `pallas_journal_rollout_chained` (the per-dispatch fused-step ceiling
    applies here like everywhere else, CLAUDE.md)."""
    assert batch % (8 * LANES) == 0, "batch must be a multiple of 1024"
    n_raw = cfg.H * cfg.W * cfg.H * cfg.W * 2
    assert n_raw <= 65536, \
        f"raw state code needs {n_raw} values; journal word holds 16 bits"
    shape = (batch // LANES, LANES)
    q_int = int(round(cfg.slip_prob * 65536))

    if block_rows:
        if shape[0] % block_rows:
            raise ValueError(
                f"block_rows={block_rows} does not divide the batch's "
                f"{shape[0]} rows")
        BR = block_rows
    else:
        BR = next(r for r in range(min(shape[0], 64), 0, -1)
                  if shape[0] % r == 0)
    n_blocks = shape[0] // BR
    blk = (BR, LANES)

    if t_inner is None:
        # journal slab <= ~2 MB (double-buffered 4 MB): BR * t_inner <= 4096
        cap = max(1, 4096 // BR)
        t_inner = next(t for t in range(min(n_steps, cap), 0, -1)
                       if n_steps % t == 0)
    if n_steps % t_inner:
        raise ValueError(f"t_inner={t_inner} does not divide {n_steps}")
    n_outer = n_steps // t_inner

    if init_fields is None:
        init = list(isd_spread_fields(cfg, batch, shape))
        init.append(jnp.zeros(shape, jnp.int32))          # t
    else:
        init = [jnp.asarray(f) for f in init_fields]
        assert len(init) == 6, "init_fields = 6 arrays (ra,ca,rb,cb,p,t)"

    kernel = functools.partial(_journal_kernel, cfg=cfg, t_inner=t_inner,
                               q_int=q_int)
    out_shapes = ([jax.ShapeDtypeStruct(shape, jnp.int32)] * 6 +
                  [jax.ShapeDtypeStruct((n_blocks, 3), jnp.int32),
                   jax.ShapeDtypeStruct((n_steps,) + shape, jnp.int32)])
    state_spec = pl.BlockSpec(blk, lambda b, j: (b, 0),
                              memory_space=pltpu.VMEM)
    journal_spec = pl.BlockSpec((t_inner,) + blk, lambda b, j: (j, b, 0),
                                memory_space=pltpu.VMEM)
    smem_in = jnp.stack([jnp.asarray(seed, jnp.int32),
                         jnp.asarray(step_offset, jnp.int32)])
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_outer),
        out_shape=tuple(out_shapes),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [state_spec] * 6,
        out_specs=tuple([state_spec] * 6 +
                        [pl.BlockSpec(memory_space=pltpu.SMEM),
                         journal_spec]),
        interpret=interpret,
    )(smem_in, *init)
    *fields, stats, journal = outs
    stats = stats.sum(axis=0)
    return tuple(fields), (stats[0], stats[1], stats[2]), journal


def pallas_journal_rollout_chained(cfg: EnvConfig, seed, batch: int,
                                   n_steps: int,
                                   steps_per_call: int = 4096,
                                   interpret: bool = False,
                                   block_rows: int | None = None,
                                   consume=None):
    """`pallas_journal_rollout` as chained dispatches — bit-identical to
    one long call.  Journals are yielded per call: ``consume(journal,
    step_offset)`` is invoked with each chunk's [T_call, B/128, 128]
    device array (e.g. to host-fetch, decode, or hand off); by default
    the chunks are collected and returned as a list.  Returns
    (final_fields, stats, journals_or_None)."""
    fields = None
    stats = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    chunks = [] if consume is None else None
    done = 0
    while done < n_steps:
        t = min(steps_per_call, n_steps - done)
        fields, st, journal = pallas_journal_rollout(
            cfg, seed, batch, t, interpret=interpret,
            block_rows=block_rows, init_fields=fields, step_offset=done)
        stats = tuple(a + b for a, b in zip(stats, st))
        if consume is None:
            chunks.append(journal)
        else:
            consume(journal, done)
        done += t
    return fields, stats, chunks


def xla_journal_twin(cfg: EnvConfig, seed, batch: int, n_steps: int,
                     init_fields=None, step_offset=0):
    """Pure-XLA bit-twin of `pallas_journal_rollout` (same counter PRNG
    keyed on global lane ids, same transition helpers) — the verification
    oracle for the journal's bit-exactness.  Test-sized use only."""
    shape = (batch // LANES, LANES)
    q_int = int(round(cfg.slip_prob * 65536))
    nI = 4 if len(cfg.goal_rows) % 2 == 0 else 2
    from ..core import rules

    if init_fields is None:
        init = list(isd_spread_fields(cfg, batch, shape))
        init.append(jnp.zeros(shape, jnp.int32))
    else:
        init = [jnp.asarray(f) for f in init_fields]
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    lane_ctr = rows * jnp.uint32(LANES) + cols
    seed_u = jnp.uint32(seed)

    def body(carry, i):
        ra, ca, rb, cb, p, t = carry
        step_idx = i + step_offset
        bits0 = _random_word(seed_u, step_idx, 0, lane_ctr)
        bits1 = _random_word(seed_u, step_idx, 1, lane_ctr)
        bits2 = _random_word(seed_u, step_idx, 2, lane_ctr)
        aa = _u16(bits0, 0) % 5
        ab = _u16(bits0, 1) % 5
        nra, nca, nrb, ncb, npz, goal, r = transition_core(
            ra, ca, rb, cb, p, aa, ab, bits1, bits2, cfg, q_int)
        raw = rules.raw_encode(jnp, nra, nca, nrb, ncb, npz, cfg)
        fra, fca, frb, fcb, fpz, t2, trunc = autoreset_core(
            nra, nca, nrb, ncb, npz, t, goal, bits2, cfg)
        isd_idx = _u16(bits2, 1) % nI
        word = (raw
                | ((aa * 5 + ab) << 16)
                | (goal.astype(jnp.int32) << 21)
                | (trunc.astype(jnp.int32) << 22)
                | ((r == 1).astype(jnp.int32) << 23)
                | (isd_idx << 24))
        return (fra, fca, frb, fcb, fpz, t2), word

    carry, journal = jax.lax.scan(body, tuple(init),
                                  jnp.arange(n_steps, dtype=jnp.int32))
    return carry, journal


def unpack_journal(cfg: EnvConfig, journal):
    """Decode a packed journal [T, B/128, 128] (or [T, B]) into the
    reference-shaped per-step stream (soccer_simultaneous_env.py:375-408
    emits exactly these fields each tick; core/batch.StepOut is the XLA
    twin).  Returns a dict of [T, B] arrays:

    obs        int32  post-step observation (post-autoreset, like the
                      batched engine's StepOut.obs)
    final_obs  int32  pre-autoreset observation — goal states map to
                      dense index 0, the reference's terminal obs codec
    actions_a/actions_b  int32  the actions the lanes played
    reward_a   float32  +1 / -1 / 0 (player-A perspective)
    done       bool   goal this step
    truncated  bool   truncation this step
    """
    from ..core import tables
    ss = tables.build_statespace(cfg)
    T = journal.shape[0]
    w = journal.reshape(T, -1)
    raw = w & 0xFFFF
    ja = (w >> 16) & 31
    goal = ((w >> 21) & 1).astype(bool)
    trunc = ((w >> 22) & 1).astype(bool)
    rpos = (w >> 23) & 1
    isd_idx = (w >> 24) & 3
    final_obs = jnp.asarray(ss.raw_to_dense)[raw]
    isd_dense = jnp.asarray(ss.raw_to_dense[ss.isd_raw])
    term = goal | trunc
    return {
        "obs": jnp.where(term, isd_dense[isd_idx], final_obs),
        "final_obs": final_obs,
        "actions_a": ja // 5,
        "actions_b": ja % 5,
        "reward_a": jnp.where(goal, jnp.where(rpos == 1, 1.0, -1.0),
                              0.0).astype(jnp.float32),
        "done": goal,
        "truncated": trunc,
    }


def pallas_alt_rollout_chained(cfg: EnvConfig, seed, batch: int,
                               n_steps: int, steps_per_call: int = 12288,
                               interpret: bool = False,
                               block_rows: int | None = None):
    """`pallas_alt_rollout` split into chained shorter dispatches —
    bit-identical to one long call; see `pallas_rollout_chained` for the
    relay-wedge rationale."""
    fields = None
    stats = (jnp.int32(0), jnp.int32(0), jnp.int32(0))
    done = 0
    while done < n_steps:
        t = min(steps_per_call, n_steps - done)
        fields, st = pallas_alt_rollout(cfg, seed, batch, t,
                                        interpret=interpret,
                                        block_rows=block_rows,
                                        init_fields=fields, step_offset=done)
        stats = tuple(a + b for a, b in zip(stats, st))
        done += t
    return fields, stats

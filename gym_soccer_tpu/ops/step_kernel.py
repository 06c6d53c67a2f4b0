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

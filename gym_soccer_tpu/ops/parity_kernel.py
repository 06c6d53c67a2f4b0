"""Fused pallas TPU parity kernel: BIT-EXACT reference trajectories at
rollout-kernel throughput.

The XLA parity path (core/parity.py) reproduces the reference's MT19937 /
float64-cumsum / first-exceedance sampling exactly, but tops out at
~11-13M steps/s: every scan step pays three un-fusable TPU gather kernels
(cum row, meta slot, dense obs).  This kernel removes all of them — the
whole rollout runs inside one pallas kernel, gather-free, built on four
ideas:

1. **Event time.**  The reference consumes one MT19937 double per reset
   and one per step (soccer_simultaneous_env.py:395, :414), so lanes'
   stream positions diverge as episodes end at different times — fatal
   for a lockstep kernel.  Re-timing the loop over EVENTS (a reset OR a
   transition, exactly one draw each; see core/parity.parity_event_step)
   keeps every lane's stream cursor identical forever: per-lane draw
   order still matches the reference's reset/step/step/... sequence.

2. **On-chip vectorized MT19937.**  Each lane carries its own 624-word
   generator state in VMEM ([624, lanes] tiles); because cursors are
   synchronized, ALL lanes twist together every 312 events (the 3-phase
   vectorized twist + numpy's (a>>5, b>>6) double construction from
   core/mt19937.py, which builds the float64 BIT PATTERN in integer ops —
   TPU has no f64).

3. **Thresholds by CLASS, not by state.**  The float64 cumulative-sum row
   of a (state, joint-action) pair is fully determined by the 9-combo
   outcome-count pattern (1/2/4 outcomes per slip combo — a base-3
   pattern code computed arithmetically from the collision-case flags):
   across every reachable (s, row) there are only ~71 distinct rows
   (verified at build time).  The kernel computes the pattern code with
   the same branchless collision chain as core/rules.resolve_outcomes,
   maps it to a class id by comparing against the occurring codes, and
   fetches the class's 36x(hi,lo) thresholds as 16-bit limbs with ONE
   exact one-hot f32 MXU matmul (a one-hot row selects exactly; every
   limb < 2^16 is exact in f32).

4. **Closed-loop policy by factored one-hot gather.**  The joint table
   row pol_a[s]*5+pol_b[s], precomposed over RAW codes, is fetched as
   e_q^T T e_r over a [ceil(n_raw/128), 128] table — two small one-hots
   instead of an n_raw-wide one.

Outputs: a per-event journal word per lane (post-event raw state, done /
truncated / was_reset flags, reward sign) streamed to HBM, plus final
per-lane state — enough to reconstruct full bit-exact trajectories and
episode statistics (tests compare against core/parity.parity_policy_events
which is itself pinned to the reference's golden fixtures).

Scope: closed-loop (policy-driven) parity rollouts — the reference
main()'s evaluation shape (soccer_simultaneous_env.py:569-613) — AND
scripted per-step action rows (`parity_scripted_events`), the shape the
golden-fixture suites exercise (soccer_simultaneous_env.py:394-396 with
a host-chosen action each step).  Scripted mode re-times the same event
loop: the script cursor is the lane's transition count (resets consume a
draw but not a script row, exactly like the XLA path's
parity_step/parity_rollout), and the cursor-indexed fetch from the
VMEM-resident script is a slab-bounded masked sum — cursors across a
lane block stay within a narrow band (they differ only by reset-count
differences), so only the touched 8-row slabs are scanned; no per-lane
gather exists on TPU (CLAUDE.md) and none is needed.  Script length is
VMEM-capped (~1024 rows/lane-block); longer scripts stay on the XLA
path.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import COMBO_VARIANT_A, COMBO_VARIANT_B, EnvConfig, N_ACTIONS
from ..core import mt19937, parity, rules, tables

LANES = 128
TWIST_DOUBLES = mt19937.N // 2  # 312 doubles per twist


class ParityKernelTables(NamedTuple):
    """Host-side (numpy) constants for one EnvConfig."""
    n_raw: int
    n_raw_pad: int           # padded to a multiple of LANES
    occ_codes: tuple         # occurring base-3 pattern codes, sorted
    cum_limbs: np.ndarray    # [Ppad, 288] f32: per class, 36 slots x
    #                          8 byte limbs of (hi, lo), MSB first
    #                          (bf16-exact — see _limbs8)
    isd_limbs: tuple         # nI x 4 python floats (cum thresholds)
    isd_fields: tuple        # nI x 5 python ints
    r2d_clipped: np.ndarray  # [n_raw] int32 (unreachable -> 0)


def _limbs4(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """uint32 (hi, lo) -> 4 x uint16 limbs as f32, most significant first."""
    return np.stack([hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF],
                    axis=-1).astype(np.float32)


def _limbs8(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """uint32 (hi, lo) -> 8 x uint8 limbs as f32, most significant first.

    8-bit limbs (< 256) are exact in bfloat16, so the one-hot gather
    matmul is EXACT no matter what precision the TPU MXU runs at (f32
    matmuls default to bf16 passes on TPU — 16-bit limbs silently round).
    """
    words = np.stack([hi, lo], axis=-1)
    out = np.empty(words.shape[:-1] + (8,), np.float32)
    for w in range(2):
        for b in range(4):
            out[..., 4 * w + b] = (words[..., w] >> (8 * (3 - b))) & 0xFF
    return out


@functools.lru_cache(maxsize=None)
def build_pk(cfg: EnvConfig) -> ParityKernelTables:
    """Build (cached) the kernel's class tables, verifying the pattern-code
    -> cum-row bijection that idea 3 rests on."""
    if cfg.n_raw >= 1 << 15:
        raise ValueError(
            f"grid too large for the parity kernel's journal packing "
            f"(n_raw={cfg.n_raw} needs >=15 bits); use core/parity.py")
    tb = tables.build_tables(cfg)

    # Outcome-count digits per combo.  t_mask folds in (combo_prob != 0),
    # so dropped combos get count 0 -> digit 0 — exactly the kernel's
    # static masking of zero-probability combos.
    counts = tb.t_mask.reshape(-1, 9, 4).sum(-1)
    digits = np.select([counts == 2, counts == 4], [1, 2], 0)
    code = (digits * (3 ** np.arange(9))).sum(-1)          # [nS*25]
    cum = tb.t_cum.reshape(-1, 36)

    occ, first = np.unique(code, return_index=True)
    for c, f in zip(occ, first):
        rows = cum[code == c]
        if not (rows == rows[0]).all():
            raise AssertionError(
                "pattern code does not determine the cum row "
                f"(code {c}) — parity kernel invariant broken")
    assert 0 in occ, "absorbing pattern (code 0) missing from tables"
    P = len(occ)
    if P > 512:
        raise ValueError(f"too many threshold classes ({P})")
    ppad = -(-P // 8) * 8
    hi, lo = parity.f64_bits(cum[first])                   # [P, 36] each
    cum_limbs = np.zeros((ppad, 288), np.float32)
    cum_limbs[:P] = _limbs8(hi, lo).reshape(P, 288)

    isd_hi, isd_lo = parity.f64_bits(np.cumsum(tb.isd_probs))
    isd_limbs = tuple(tuple(float(x) for x in row)
                      for row in _limbs4(isd_hi, isd_lo))
    isd_fields = tuple(
        tuple(int(v) for v in rules.raw_decode(np, int(r), cfg))
        for r in tb.isd_raw)

    return ParityKernelTables(
        n_raw=cfg.n_raw,
        n_raw_pad=-(-cfg.n_raw // LANES) * LANES,
        occ_codes=tuple(int(c) for c in occ),
        cum_limbs=cum_limbs,
        isd_limbs=isd_limbs,
        isd_fields=isd_fields,
        r2d_clipped=np.maximum(tb.raw_to_dense, 0).astype(np.int32),
    )


def jointrow_raw(cfg: EnvConfig, pol_a, pol_b) -> np.ndarray:
    """Precompose the closed-loop joint table row pol_a[s]*5 + pol_b[s]
    over RAW codes (goal states hit dense 0, like the facade obs codec).
    Single-agent (frozen-opponent) runs are the same thing: the collapsed
    table's row for (s, aa) IS the joint row (aa, frozen[s])."""
    pk = build_pk(cfg)
    pa = np.asarray(pol_a, np.int64)[pk.r2d_clipped]
    pb = np.asarray(pol_b, np.int64)[pk.r2d_clipped]
    return (pa * N_ACTIONS + pb).astype(np.int32)


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------

def _le4(c3, c2, c1, c0, u3, u2, u1, u0):
    """Lexicographic (hi, lo) uint32-pair compare cum <= u, on 16-bit
    limbs held exactly in f32 (non-negative doubles order like their bit
    patterns — same trick as core/parity._le_bits)."""
    return (c3 < u3) | ((c3 == u3) & (
        (c2 < u2) | ((c2 == u2) & (
            (c1 < u1) | ((c1 == u1) & (c0 <= u0))))))


SCRIPT_SLAB = 8
SCRIPT_PACK = 6   # script entries (5-bit joint rows) packed per int32


def _parity_kernel(mt_ref, jr_ref, cum_ref,
                   journal_ref, ora, oca, orb, ocb, op, ot, onr, osteps,
                   mt_scr, st_scr, dma_sem,
                   *, cfg: EnvConfig, chunk_events: int, n_chunks: int,
                   rblk: int, pk_static: dict, scripted: bool = False):
    """One lane-block x event-chunk grid cell.

    st_scr [10, rblk, 128] carries (ra, ca, rb, cb, p, t, needs_reset,
    steps, episodes, reward_sum) across chunks; mt_scr holds the lane
    block's MT19937 states (DMA'd from HBM once per lane block — a VMEM
    input block would be double-buffered by the pipeline and blow the
    scoped-VMEM budget).  Doubles are tempered on demand per event from
    word columns 2*cursor, 2*cursor+1.

    ``scripted``: jr_ref is then a [T_script, rblk, 128] int32 per-step
    joint-row SCRIPT instead of the raw-state joint-row table; each
    transition event plays script[steps] (steps = the lane's transition
    count, which resets do not advance — matching core/parity.parity_step
    where a reset consumes a draw but not a script row).  The fetch is a
    masked sum over the 8-row slabs [min(steps), max(steps)] of the
    block — no per-lane gather.
    """
    lb = pl.program_id(0)
    chunk = pl.program_id(1)
    blk = (rblk, LANES)
    occ_codes = pk_static["occ_codes"]
    isd_limbs = pk_static["isd_limbs"]
    isd_fields = pk_static["isd_fields"]
    combo_probs = pk_static["combo_probs"]
    PPAD = cum_ref.shape[0]

    if not scripted:
        NRQ = jr_ref.shape[0]
        q_iota = jax.lax.broadcasted_iota(jnp.int32, (NRQ, LANES), 0)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (PPAD, LANES), 0)

    @pl.when(chunk == 0)
    def _init():
        copy = pltpu.make_async_copy(
            mt_ref.at[:, pl.ds(lb * rblk, rblk), :], mt_scr, dma_sem)
        copy.start()
        copy.wait()
        z = jnp.zeros(blk, jnp.int32)
        for f in range(10):
            st_scr[f] = z
        st_scr[6] = jnp.ones(blk, jnp.int32)  # needs_reset

    def twist_and_fill():
        mt = mt_scr[:]
        K = mt19937.N - mt19937.M  # 227

        def mix(cur, nxt, src):
            y = ((cur & jnp.uint32(mt19937.UPPER))
                 | (nxt & jnp.uint32(mt19937.LOWER)))
            mag = jnp.where((y & 1) == 1, jnp.uint32(mt19937.MATRIX_A),
                            jnp.uint32(0))
            return src ^ (y >> 1) ^ mag

        p1 = mix(mt[0:K], mt[1:K + 1], mt[mt19937.M:mt19937.N])
        p2a = mix(mt[K:2 * K], mt[K + 1:2 * K + 1], p1)
        p2b = mix(mt[2 * K:mt19937.N - 1], mt[2 * K + 1:mt19937.N],
                  p2a[0:mt19937.N - 1 - 2 * K])
        p3 = mix(mt[mt19937.N - 1:mt19937.N], p1[0:1],
                 p2a[mt19937.M - 1 - K:mt19937.M - K])
        mt_scr[:] = jnp.concatenate([p1, p2a, p2b, p3], axis=0)

    def event(i, carry):
        ra, ca, rb, cb, p, t, nr, steps, eps_n, rsum = carry
        k = chunk * chunk_events + i
        cursor = k - (k // TWIST_DOUBLES) * TWIST_DOUBLES

        @pl.when(cursor == 0)
        def _():
            twist_and_fill()

        # numpy random_sample: double d = ((w[2d]>>5)*2^26 + (w[2d+1]>>6))
        # / 2^53, built as an IEEE-754 bit pattern (core/mt19937).
        w0 = mt19937.temper(mt_scr[pl.ds(2 * cursor, 1)].reshape(blk))
        w1 = mt19937.temper(mt_scr[pl.ds(2 * cursor + 1, 1)].reshape(blk))
        u_hi, u_lo = mt19937.double_bits(w0 >> 5, w1 >> 6)
        # (mosaic has no uint32 -> f32 cast; limbs < 2^16 go via int32)
        f32 = lambda x: x.astype(jnp.int32).astype(jnp.float32)
        u3 = f32(u_hi >> 16)
        u2 = f32(u_hi & 0xFFFF)
        u1 = f32(u_lo >> 16)
        u0 = f32(u_lo & 0xFFFF)

        raw = rules.raw_encode(jnp, ra, ca, rb, cb, p, cfg)

        if scripted:
            # ---- script row: STATIC masked scan over the 6-PACKED
            # script (SCRIPT_PACK rows of 5 bits per int32 word — joint
            # rows are < 25).  Design history: a dynamic slab-bounded
            # loop over only the block's cursor band LOOKS cheapest, but
            # a dynamic-trip-count loop per event serializes against the
            # scalar core (measured 17M vs the closed-loop ~420M
            # events/s on-chip); an UNPACKED static scan is pure
            # predicated VPU work but pays ~3 int ops per script row per
            # event (measured 30M at 800 rows).  Packing 6 entries per
            # word cuts the scan 6x: match on the packed-row index
            # steps // 6, then one shift/mask extracts the lane's
            # subfield after the scan. ----
            T_p = jr_ref.shape[0]
            pk_idx = steps // SCRIPT_PACK
            sub = steps - pk_idx * SCRIPT_PACK
            word = jnp.zeros(blk, jnp.int32)
            for j in range(T_p // SCRIPT_SLAB):
                rows8 = jr_ref[j * SCRIPT_SLAB:(j + 1) * SCRIPT_SLAB]
                for s in range(SCRIPT_SLAB):
                    word = word + jnp.where(pk_idx == j * SCRIPT_SLAB + s,
                                            rows8[s], 0)
            # constant-shift select beats a per-lane variable shift
            # (Mosaic synthesizes the latter expensively)
            row = jnp.zeros(blk, jnp.int32)
            for s in range(SCRIPT_PACK):
                row = row + jnp.where(sub == s, (word >> (5 * s)) & 31, 0)
        else:
            # ---- closed-loop joint row: factored one-hot gather ----
            qv = raw >> 7
            rv = raw & (LANES - 1)
            # (row values < 25 are exact in bf16; the one-hot selects a
            # single term, so the f32 accumulations are exact too)
            jr_bf = jr_ref[:].astype(jnp.bfloat16)
            rows_out = []
            for rr in range(rblk):
                ohq = (q_iota == qv[rr][None, :]).astype(jnp.bfloat16)
                mq = jax.lax.dot_general(
                    jr_bf, ohq, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [128 r, 128 lanes]
                ohr = (r_iota == rv[rr][None, :]).astype(jnp.float32)
                rows_out.append(jnp.sum(mq * ohr, axis=0))
            row = jnp.stack(rows_out).astype(jnp.int32)   # [rblk, 128]
        aa = row // N_ACTIONS
        ab = row - aa * N_ACTIONS

        # ---- 9 slip combos: moves, collision cases, pattern code ----
        mc0a = (aa == 3).astype(jnp.int32) - (aa == 4).astype(jnp.int32)
        mr0a = (aa == 2).astype(jnp.int32) - (aa == 1).astype(jnp.int32)
        mc0b = (ab == 3).astype(jnp.int32) - (ab == 4).astype(jnp.int32)
        mr0b = (ab == 2).astype(jnp.int32) - (ab == 1).astype(jnp.int32)
        a_noop = aa == 0
        b_noop = ab == 0
        has_a = p == 0
        has_b = p == 1

        def variant(mc0, mr0, v):
            # orthogonal_moves order: v1 = (-mr, mc), v2 = (mr, -mc)
            if v == 0:
                return mc0, mr0
            if v == 1:
                return -mr0, mc0
            return mr0, -mc0

        code = jnp.zeros(blk, jnp.int32)
        NXA, NYA, NXB, NYB = [], [], [], []
        C2, C4, C5, C13 = [], [], [], []
        for c in range(9):
            mca, mra = variant(mc0a, mr0a, COMBO_VARIANT_A[c])
            mcb, mrb = variant(mc0b, mr0b, COMBO_VARIANT_B[c])
            nxa, nya = rules.next_cell(jnp, ra, ca, mca, mra, has_a, cfg)
            nxb, nyb = rules.next_cell(jnp, rb, cb, mcb, mrb, has_b, cfg)
            c1 = (((ra == rb) & (jnp.abs(ca - cb) == 1)
                   & (nya == cb) & (nyb == ca)) |
                  ((ca == cb) & (jnp.abs(ra - rb) == 1)
                   & (nxa == rb) & (nxb == ra)))
            c2 = ~c1 & (((nxa == rb) & (nya == cb) & b_noop) |
                        ((nxb == ra) & (nyb == ca) & a_noop))
            c3 = ~c1 & ~c2 & (
                ((ra == nxa) & (ca == nya) & ~a_noop
                 & (nxb == ra) & (nyb == ca)) |
                ((rb == nxb) & (cb == nyb) & ~b_noop
                 & (nxa == rb) & (nya == cb)))
            c4 = ~c1 & ~c2 & ~c3 & (nxa == nxb) & (nya == nyb)
            c5 = ~(c1 | c2 | c3 | c4)
            c13 = c1 | c3
            if combo_probs[c] != 0.0:
                digit = c13.astype(jnp.int32) + 2 * c4.astype(jnp.int32)
                code = code + digit * (3 ** c)
            NXA.append(nxa)
            NYA.append(nya)
            NXB.append(nxb)
            NYB.append(nyb)
            C2.append(c2)
            C4.append(c4)
            C5.append(c5)
            C13.append(c13)

        absorbed = rules.is_goal_state(jnp, ra, ca, rb, cb, p, cfg)
        code = jnp.where(absorbed, 0, code)

        cls = jnp.zeros(blk, jnp.int32)
        for pi, oc in enumerate(occ_codes):
            if pi:
                cls = cls + pi * (code == oc).astype(jnp.int32)

        # ---- class thresholds: EXACT one-hot MXU gather.  The table
        # holds 8-bit limbs and the one-hot is 0/1, so every product and
        # the single-nonzero-term sum are exact even at the MXU's bf16
        # rate (TPU f32 matmuls are bf16 passes — 16-bit limbs would
        # silently round). ----
        cum_bf = cum_ref[:].astype(jnp.bfloat16)
        pres = []
        for rr in range(rblk):
            ohc = (p_iota == cls[rr][None, :]).astype(jnp.bfloat16)
            pres.append(jax.lax.dot_general(
                cum_bf, ohc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))     # [288, 128]
        pre = jnp.stack(pres)                            # [rblk, 288, 128]

        def limb16(j, h):
            """16-bit limb h (0=most significant) of slot j, recombined
            from the two exact byte limbs."""
            return (pre[:, 8 * j + 2 * h, :] * 256.0
                    + pre[:, 8 * j + 2 * h + 1, :])

        i_sel = jnp.zeros(blk, jnp.int32)
        for j in range(36):
            le = _le4(limb16(j, 0), limb16(j, 1), limb16(j, 2), limb16(j, 3),
                      u3, u2, u1, u0)
            i_sel = i_sel + le.astype(jnp.int32)
        i_sel = jnp.minimum(i_sel, 35)

        # ---- select the sampled outcome (combo = i>>2, slot = i&3) ----
        cstar = i_sel >> 2
        o = i_sel & 3
        zi = jnp.zeros(blk, jnp.int32)
        zb = jnp.zeros(blk, jnp.bool_)
        nxa_s, nya_s, nxb_s, nyb_s = zi, zi, zi, zi
        c2_s, c4_s, c5_s, c13_s = zb, zb, zb, zb
        for c in range(9):
            m = cstar == c
            mi = m.astype(jnp.int32)
            nxa_s = nxa_s + mi * NXA[c]
            nya_s = nya_s + mi * NYA[c]
            nxb_s = nxb_s + mi * NXB[c]
            nyb_s = nyb_s + mi * NYB[c]
            c2_s = c2_s | (m & C2[c])
            c4_s = c4_s | (m & C4[c])
            c5_s = c5_s | (m & C5[c])
            c13_s = c13_s | (m & C13[c])

        # slot fields in the reference's outcome order
        # (core/rules.resolve_outcomes slots 0..3)
        c45 = c4_s | c5_s
        ra0 = jnp.where(c5_s, nxa_s, ra)
        ca0 = jnp.where(c5_s, nya_s, ca)
        rb0 = jnp.where(c45, nxb_s, rb)
        cb0 = jnp.where(c45, nyb_s, cb)
        p0 = jnp.where(c2_s, 1 - p, jnp.where(c5_s, p, 0))
        o0 = o == 0
        o1 = o == 1
        nra = jnp.where(o0, ra0, jnp.where(o1, ra, nxa_s))
        nca = jnp.where(o0, ca0, jnp.where(o1, ca, nya_s))
        rb1 = jnp.where(c4_s, nxb_s, rb)
        cb1 = jnp.where(c4_s, nyb_s, cb)
        nrb = jnp.where(o0, rb0, jnp.where(o1, rb1, rb))
        ncb = jnp.where(o0, cb0, jnp.where(o1, cb1, cb))
        npz = jnp.where(o0, p0, jnp.where(o1, 1, jnp.where(o == 2, 0, 1)))

        # absorbing self-loop (reference :300-301)
        nra = jnp.where(absorbed, ra, nra)
        nca = jnp.where(absorbed, ca, nca)
        nrb = jnp.where(absorbed, rb, nrb)
        ncb = jnp.where(absorbed, cb, ncb)
        npz = jnp.where(absorbed, p, npz)

        done = rules.is_goal_state(jnp, nra, nca, nrb, ncb, npz, cfg)
        ball_col = jnp.where(npz == 0, nca, ncb)
        rwd = jnp.where(done & ~absorbed,
                        jnp.where(ball_col == cfg.W - 1, 1, -1), 0)
        t2 = t + 1
        trunc = t2 >= cfg.max_steps

        # ---- reset interpretation of the SAME draw (ISD categorical) ----
        nI = len(isd_fields)
        ii = jnp.zeros(blk, jnp.int32)
        for e in range(nI):
            l3, l2, l1, l0 = isd_limbs[e]
            ii = ii + _le4(l3, l2, l1, l0, u3, u2, u1, u0).astype(jnp.int32)
        ii = jnp.minimum(ii, nI - 1)
        isd_f = []
        for f in range(5):
            v = jnp.full(blk, isd_fields[0][f], jnp.int32)
            for e in range(1, nI):
                v = jnp.where(ii == e, isd_fields[e][f], v)
            isd_f.append(v)

        # ---- merge: reset lanes take the ISD state, others transition ----
        nrb_ = nr != 0
        new_ra = jnp.where(nrb_, isd_f[0], nra)
        new_ca = jnp.where(nrb_, isd_f[1], nca)
        new_rb = jnp.where(nrb_, isd_f[2], nrb)
        new_cb = jnp.where(nrb_, isd_f[3], ncb)
        new_p = jnp.where(nrb_, isd_f[4], npz)
        new_t = jnp.where(nrb_, 0, t2)
        done_j = ~nrb_ & done
        trunc_j = ~nrb_ & trunc
        # int-valued select: Mosaic has no i1 select (see ops/step_kernel)
        new_nr = jnp.where(nrb_, 0, (done_j | trunc_j).astype(jnp.int32))
        rj = jnp.where(nrb_, 0, rwd)

        raw_new = rules.raw_encode(jnp, new_ra, new_ca, new_rb, new_cb,
                                   new_p, cfg)
        packed = (raw_new
                  | (done_j.astype(jnp.int32) << 15)
                  | (trunc_j.astype(jnp.int32) << 16)
                  | (nr << 17)
                  | ((rj + 1) << 18))
        journal_ref[pl.ds(i, 1)] = packed.reshape(1, rblk, LANES)

        return (new_ra, new_ca, new_rb, new_cb, new_p, new_t, new_nr,
                steps + (1 - nr), eps_n + (done_j | trunc_j).astype(jnp.int32),
                rsum + rj)

    carry = tuple(st_scr[f] for f in range(10))
    carry = jax.lax.fori_loop(0, chunk_events, event, carry)
    for f in range(10):
        st_scr[f] = carry[f]

    ora[:], oca[:], orb[:], ocb[:] = carry[0], carry[1], carry[2], carry[3]
    op[:], ot[:], onr[:], osteps[:] = carry[4], carry[5], carry[6], carry[7]


class ParityEventsOut(NamedTuple):
    journal: jax.Array   # [n_events, B] int32 packed (see unpack_journal)
    rows_a: jax.Array    # final per-lane state fields [B]
    cols_a: jax.Array
    rows_b: jax.Array
    cols_b: jax.Array
    poss: jax.Array
    t: jax.Array
    needs_reset: jax.Array
    steps: jax.Array     # transition events completed per lane


@functools.partial(jax.jit, static_argnames=("cfg", "n_events",
                                             "chunk_events", "interpret",
                                             "max_rblk"))
def parity_events(cfg: EnvConfig, seeds: jax.Array, jr: jax.Array,
                  n_events: int, chunk_events: int | None = None,
                  interpret: bool = False,
                  max_rblk: int = 16) -> ParityEventsOut:
    """Run ``n_events`` reference-exact events for ``len(seeds)`` lanes.

    ``seeds``: uint32 [B] — lane i reproduces the reference env seeded
    RandomState(seeds[i]).  ``jr``: int32 [n_raw] joint-row table from
    `jointrow_raw`.  B must be a multiple of 128.  ``max_rblk`` caps the
    lane-block height (the per-lane 624-word MT19937 state costs
    rblk x 320 KB of scratch VMEM; 16 — ~7.5 MB scoped — processes
    twice the tile per instruction and measured 1.5x over 8 on-chip:
    597M vs 396M events/s.  Results are bit-invariant to the blocking,
    verified on-chip).
    """
    pk = build_pk(cfg)
    seeds = jnp.asarray(seeds, jnp.uint32)
    B = seeds.shape[0]
    assert B % LANES == 0, f"batch must be a multiple of {LANES}"
    R = B // LANES
    rblk = next(r for r in range(min(max_rblk, R), 0, -1) if R % r == 0)
    n_blocks = R // rblk
    if chunk_events is None:  # largest divisor of n_events <= 128
        chunk_events = next(c for c in range(min(128, n_events), 0, -1)
                            if n_events % c == 0)
    assert n_events % chunk_events == 0, \
        f"n_events must be a multiple of chunk_events={chunk_events}"
    n_chunks = n_events // chunk_events

    mt0 = mt19937.seed_states(seeds).T.reshape(mt19937.N, R, LANES)
    jr_pad = jnp.zeros(pk.n_raw_pad, jnp.float32).at[:pk.n_raw].set(
        jnp.asarray(jr, jnp.float32)).reshape(-1, LANES)
    cum = jnp.asarray(pk.cum_limbs)

    kernel = functools.partial(
        _parity_kernel, cfg=cfg, chunk_events=chunk_events,
        n_chunks=n_chunks, rblk=rblk,
        pk_static=dict(occ_codes=pk.occ_codes, isd_limbs=pk.isd_limbs,
                       isd_fields=pk.isd_fields,
                       combo_probs=cfg.combo_probs()))

    lane_blk = pl.BlockSpec((rblk, LANES), lambda b, k: (b, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[
            # MT seed states stay in HBM; the kernel DMAs its lane block
            # into scratch once (a VMEM input block would be
            # double-buffered across grid steps: +5 MB scoped VMEM).
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=tuple(
            [jax.ShapeDtypeStruct((n_events, R, LANES), jnp.int32)] +
            [jax.ShapeDtypeStruct((R, LANES), jnp.int32)] * 8),
        out_specs=tuple(
            [pl.BlockSpec((chunk_events, rblk, LANES),
                          lambda b, k: (k, b, 0),
                          memory_space=pltpu.VMEM)] + [lane_blk] * 8),
        scratch_shapes=[
            pltpu.VMEM((mt19937.N, rblk, LANES), jnp.uint32),
            pltpu.VMEM((10, rblk, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(mt0, jr_pad, cum)
    journal, *fin = outs
    return ParityEventsOut(journal.reshape(n_events, B),
                           *(f.reshape(B) for f in fin))


@functools.partial(jax.jit, static_argnames=("cfg", "n_events",
                                             "chunk_events", "interpret"))
def parity_scripted_events(cfg: EnvConfig, seeds: jax.Array,
                           rows: jax.Array, n_events: int,
                           chunk_events: int | None = None,
                           interpret: bool = False,
                           max_rblk: int = 8) -> ParityEventsOut:
    """SCRIPTED bit-exact parity rollout on-chip (the golden-fixture
    harness shape: one host-chosen action row per step,
    soccer_simultaneous_env.py:394-396).

    ``rows``: int32 [T, B] per-step joint-row script (aa*5+ab, or the
    single-agent action — same convention as core/parity.parity_rollout,
    which this kernel reproduces event-for-event: lane i's k-th
    transition plays rows[k, i]; interleaved reset draws advance the
    MT19937 stream but not the script cursor).  Run enough events to
    cover the script: n_events >= T + (resets incurred); the returned
    per-lane ``steps`` says how many script rows were consumed — lanes
    past the script's end play row 0, so size n_events to taste and cut
    per lane when decoding.

    The script lives 6-PACKED in VMEM per lane block (rows are < 25, so
    SCRIPT_PACK=6 entries of 5 bits share one int32); scripts longer
    than ~6000 rows exceed the budget — use the XLA path
    (core/parity.parity_rollout) for those.  ``max_rblk`` stays 8 here:
    the closed-loop kernel gains 1.5x at 16, but with the script scan's
    working set the 16-row blocks measured 7x SLOWER on-chip (21M vs
    149M steps/s) — do not raise it."""
    pk = build_pk(cfg)
    seeds = jnp.asarray(seeds, jnp.uint32)
    B = seeds.shape[0]
    assert B % LANES == 0, f"batch must be a multiple of {LANES}"
    R = B // LANES
    rows = jnp.asarray(rows, jnp.int32)
    assert rows.ndim == 2 and rows.shape[1] == B, \
        f"rows must be [T, {B}]"
    T = rows.shape[0]
    T_pack = -(-(-(-T // SCRIPT_PACK)) // SCRIPT_SLAB) * SCRIPT_SLAB
    rblk = next(r for r in range(min(max_rblk, R), 0, -1) if R % r == 0)
    script_mb = T_pack * rblk * LANES * 4 / 2**20
    if script_mb > 4:
        raise ValueError(
            f"script too long for the fused parity kernel (~{script_mb:.0f}"
            f" MB of VMEM per lane block at T={T}); use "
            f"core/parity.parity_rollout")
    n_blocks = R // rblk
    if chunk_events is None:
        chunk_events = next(c for c in range(min(128, n_events), 0, -1)
                            if n_events % c == 0)
    assert n_events % chunk_events == 0, \
        f"n_events must be a multiple of chunk_events={chunk_events}"
    n_chunks = n_events // chunk_events

    mt0 = mt19937.seed_states(seeds).T.reshape(mt19937.N, R, LANES)
    padded = jnp.zeros((T_pack * SCRIPT_PACK, B), jnp.int32).at[:T].set(rows)
    script = jnp.zeros((T_pack, B), jnp.int32)
    for s in range(SCRIPT_PACK):
        script = script + (padded[s::SCRIPT_PACK] << (5 * s))
    script = script.reshape(T_pack, R, LANES)
    cum = jnp.asarray(pk.cum_limbs)

    kernel = functools.partial(
        _parity_kernel, cfg=cfg, chunk_events=chunk_events,
        n_chunks=n_chunks, rblk=rblk, scripted=True,
        pk_static=dict(occ_codes=pk.occ_codes, isd_limbs=pk.isd_limbs,
                       isd_fields=pk.isd_fields,
                       combo_probs=cfg.combo_probs()))

    lane_blk = pl.BlockSpec((rblk, LANES), lambda b, k: (b, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((T_pack, rblk, LANES), lambda b, k: (0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=tuple(
            [jax.ShapeDtypeStruct((n_events, R, LANES), jnp.int32)] +
            [jax.ShapeDtypeStruct((R, LANES), jnp.int32)] * 8),
        out_specs=tuple(
            [pl.BlockSpec((chunk_events, rblk, LANES),
                          lambda b, k: (k, b, 0),
                          memory_space=pltpu.VMEM)] + [lane_blk] * 8),
        scratch_shapes=[
            pltpu.VMEM((mt19937.N, rblk, LANES), jnp.uint32),
            pltpu.VMEM((10, rblk, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(mt0, script, cum)
    journal, *fin = outs
    return ParityEventsOut(journal.reshape(n_events, B),
                           *(f.reshape(B) for f in fin))


def unpack_journal(journal):
    """Packed event words -> dict of arrays (see _parity_kernel)."""
    j = np.asarray(journal)
    return {
        "raw": j & 0x7FFF,
        "done": (j >> 15) & 1,
        "truncated": (j >> 16) & 1,
        "was_reset": (j >> 17) & 1,
        "reward_a": ((j >> 18) & 3) - 1,
    }

"""Comprehensive benchmark sweep: one row per engine/path.

Unlike bench.py (the driver's single headline line), this prints a table
covering every execution path, each timed with host-fetch barriers (see
CLAUDE.md on why block_until_ready can't be trusted on tunneled backends).

Run: python tools/bench_all.py [--quick]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gym_soccer_tpu.config import EnvConfig  # noqa: E402
from gym_soccer_tpu.core import batch, parity  # noqa: E402

CFG = EnvConfig(5, 4, 0.2)


def fetch(x):
    return np.asarray(x)


def timed(fn, n=3):
    fn()  # warmup/compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[n // 2]


def bench_facade(quick):
    from gym_soccer_tpu.envs import SoccerSimultaneousEnv
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2)
    env.reset(seed=0)
    n = 2000 if quick else 20000
    t0 = time.perf_counter()
    for _ in range(n):
        if env.needs_reset:
            env.reset()
        env.step({"player_a": 0, "player_b": 0})
    return n / (time.perf_counter() - t0)


def bench_xla(quick):
    """Stacked-trajectory rollout (journals [T, B] StepOut to HBM), with
    on-device episode aggregation (utils/metrics.chunk_stats)."""
    from gym_soccer_tpu.utils.metrics import chunk_stats
    B, T = 8192, 200 if quick else 1000
    pol = batch.random_policy_fn(CFG, jax.random.key(1), B)
    st = jax.jit(lambda k: batch.init(CFG, k, B))(jax.random.key(0))

    @jax.jit
    def roll(s):
        s, out = batch.rollout(CFG, s, pol, T)
        return s, chunk_stats(out)

    stats = None

    def run():
        nonlocal st, stats
        st, stats = roll(st)
        fetch(stats.reward_a_sum)

    dt = timed(run)
    print(json.dumps({"path": "xla_batch_engine_traj/episode_stats",
                      "episodes": int(fetch(stats.episodes)),
                      "goals": int(fetch(stats.goals)),
                      "mean_length": round(stats.mean_length, 2)}))
    return B * T / dt


def _bench_stats_rollout(quick, rng):
    B, T = 8192, 200 if quick else 1000
    st = jax.jit(lambda k: batch.init(CFG, k, B))(jax.random.key(0))
    roll = jax.jit(lambda s: batch.random_rollout_stats(CFG, s, T, rng=rng))

    def run():
        nonlocal st
        st, acc = roll(st)
        fetch(acc.reward_sum)

    dt = timed(run)
    return B * T / dt


def bench_xla_stats_threefry(quick):
    return _bench_stats_rollout(quick, "threefry")


def bench_xla_stats_counter(quick):
    return _bench_stats_rollout(quick, "counter")


def bench_multigrid(quick):
    """Mixed-geometry lockstep batch (5x4 / 6x5 / 9x6 in one kernel)."""
    from gym_soccer_tpu.core import multigrid
    B, T = 8192, 200 if quick else 1000
    cfgs = [EnvConfig(5, 4, 0.2), EnvConfig(6, 5, 0.1), EnvConfig(9, 6, 0.3)]
    st = jax.jit(lambda k: multigrid.init(cfgs, k, B))(jax.random.key(0))

    def pol(s, i):
        u = multigrid.uniforms(s, 2, salt=9)
        return (jnp.minimum((u[:, 0] * 5).astype(jnp.int32), 4),
                jnp.minimum((u[:, 1] * 5).astype(jnp.int32), 4))

    roll = jax.jit(lambda s: multigrid.rollout(s, pol, T))

    def run():
        nonlocal st
        st, (r, g, tr) = roll(st)
        fetch(r.sum())

    dt = timed(run)
    return B * T / dt


def bench_alternating(quick):
    """Batched alternating-turn engine under a minimax-VI policy pair."""
    from gym_soccer_tpu.envs.soccer_alternating_env import (
        alt_init, alt_raw_encode, alt_step, alt_value_iteration,
        build_alt_tables)
    B, T = 8192, 200 if quick else 1000
    tb = build_alt_tables(CFG)
    pi, V, Q, _ = alt_value_iteration(tb, theta=1e-6)
    r2d = jnp.asarray(tb.raw_to_dense)
    pol = jnp.asarray(pi)

    def body(st, _):
        raw2 = alt_raw_encode(jnp, st.rows_a, st.cols_a, st.rows_b,
                              st.cols_b, st.poss, st.turn, CFG)
        st2, (rew, goal, trunc) = alt_step(CFG, st, pol[r2d[raw2]],
                                           autoreset=True)
        return st2, rew.sum()

    @jax.jit
    def roll(s):
        return jax.lax.scan(body, s, None, length=T)

    st = jax.jit(lambda k: alt_init(CFG, k, B))(jax.random.key(0))

    def run():
        nonlocal st
        st, r = roll(st)
        fetch(r.sum())

    dt = timed(run)
    return B * T / dt


def bench_altq_learner(quick):
    """Fused alternating-turn Q-learning (act/step/TD under one scan)."""
    from gym_soccer_tpu.agents import learners
    B, T = 8192, 100 if quick else 500
    lcfg = learners.AltQConfig()
    st = jax.jit(lambda k: learners.altq_init(CFG, k, B))(jax.random.key(0))
    train = jax.jit(lambda s: learners.altq_train(CFG, lcfg, s, T))

    def run():
        nonlocal st
        st, td = train(st)
        fetch(td.sum())

    dt = timed(run)
    return B * T / dt


def bench_pallas_minimax_learner(quick):
    """Fused pallas minimax-Q learner (ops/learner_kernel.learner_chunk):
    on-chip act/step/TD chunks with the M table frozen per chunk — the
    training analogue of the pallas_fused rollout row."""
    from gym_soccer_tpu.core import tables
    from gym_soccer_tpu.ops import learner_kernel as lk
    B, T = 8192, 64
    K = 4 if quick else 16
    nS = tables.build_statespace(CFG).nS
    m = lk.pack_m(CFG, jnp.full((nS, 5), 0.2), jnp.full((nS, 5), 0.2),
                  jnp.zeros((nS, 5, 5)), jnp.zeros(nS), eps=0.3)
    fields0 = lk.init_state_fields(CFG, B)

    def run():
        fields = fields0
        for k in range(K):
            fields, acc, stats = lk.learner_chunk(CFG, k, m, fields, B, T)
        fetch(acc.sum())

    dt = timed(run)
    return B * T * K / dt


def _bench_learner_chunks(cfg, packed, B, T, K, mg=False):
    """Shared driver: K chained fused chunks, real host fetch."""
    from gym_soccer_tpu.core import tables
    from gym_soccer_tpu.ops import learner_kernel as lk
    if mg:
        nS = sum(tables.build_statespace(c).nS for c in cfg)
    else:
        nS = tables.build_statespace(cfg).nS
    uni = jnp.full((nS, 5), 0.2, jnp.float32)
    if packed:
        m = lk.pack_m2(cfg, uni, uni, jnp.zeros(nS), eps=0.3)
    else:
        m = lk.pack_m(cfg, uni, uni, jnp.zeros((nS, 5, 5)), jnp.zeros(nS),
                      eps=0.3)
    if mg:
        planes, fields0 = lk.init_state_fields(cfg, B)
        f = (lk.multigrid_packed_learner_chunk if packed
             else lk.multigrid_learner_chunk)
        call = lambda k, fl: f(cfg, k, m, planes, fl, B, T)
    else:
        fields0 = lk.init_state_fields(cfg, B)
        f = lk.packed_learner_chunk if packed else lk.learner_chunk
        call = lambda k, fl: f(cfg, k, m, fl, B, T)

    def run():
        fields = fields0
        for k in range(K):
            fields, acc, stats = call(k, fields)
        fetch(acc.sum())

    dt = timed(run)
    return B * T * K / dt


def bench_pallas_minimax_learner_packed(quick):
    """Fused minimax-Q learner, PACKED layout (8 states per M row,
    target-sum accumulation; ops/learner_kernel.packed_learner_chunk)."""
    return _bench_learner_chunks(CFG, True, 32768, 64, 4 if quick else 16)


def bench_pallas_learner_11x7(quick):
    """Fused learner on the reference's own big grid (nS=11705,
    soccer_simultaneous_env.py:501) — the packed layout is what makes
    this fast (the unpacked kernel walks 14 table slabs per block)."""
    return _bench_learner_chunks(EnvConfig(11, 7, 0.2), True, 32768, 64,
                                 2 if quick else 8)


def bench_pallas_br_learner(quick):
    """Fused frozen-opponent best response (the reference's single-agent
    training shape, soccer_simultaneous_env.py:187-188) — same chunk
    kernel, opponent's packed columns one-hot with zero exploration."""
    from gym_soccer_tpu.core import tables
    from gym_soccer_tpu.ops import learner_kernel as lk
    from gym_soccer_tpu.utils.policies import get_random_policy_array
    B, T = 32768, 64
    K = 4 if quick else 16
    nS = tables.build_statespace(CFG).nS
    opp = jnp.asarray(get_random_policy_array(nS, 5, seed=42))
    opp_oh = jax.nn.one_hot(opp, 5, dtype=jnp.float32)
    uni = jnp.full((nS, 5), 0.2, jnp.float32)
    m = lk.pack_m2(CFG, uni, opp_oh, jnp.zeros(nS), eps=0.3, eps_b=0.0)
    fields0 = lk.init_state_fields(CFG, B)

    def run():
        fields = fields0
        for k in range(K):
            fields, acc, stats = lk.packed_learner_chunk(CFG, k, m, fields,
                                                         B, T)
        fetch(acc.sum())

    dt = timed(run)
    return B * T * K / dt


def bench_pallas_iql_learner(quick):
    """Fused independent-Q learner (both players' act/step/TD on-chip)."""
    return _bench_iql(quick, packed=False)


def bench_pallas_iql_learner_packed(quick):
    """Packed-layout fused IQL (6 states per M/acc row)."""
    return _bench_iql(quick, packed=True, B=32768)


def _bench_iql(quick, packed, B=8192):
    from gym_soccer_tpu.core import tables
    from gym_soccer_tpu.ops import iql_kernel as ik
    T = 64
    K = 4 if quick else 16
    nS = tables.build_statespace(CFG).nS
    z = jnp.zeros((nS, 5))
    m = (ik.pack_iql_m2 if packed else ik.pack_iql_m)(CFG, z, z)
    chunk = ik.iql_packed_chunk if packed else ik.iql_chunk
    fields0 = ik.init_iql_state_fields(CFG, B)
    eps = int(0.3 * 65536)

    def run():
        fields = fields0
        for k in range(K):
            fields, acc, stats = chunk(CFG, k, eps, m, fields, B, T,
                                       step_offset=k * T)
        fetch(acc.sum())

    dt = timed(run)
    return B * T * K / dt


def bench_pallas_multigrid_learner(quick):
    """Fused minimax-Q learner over a MIXED-geometry batch (one kernel,
    geometry and table offsets as per-lane planes)."""
    from gym_soccer_tpu.core import tables
    from gym_soccer_tpu.ops import learner_kernel as lk
    cfgs = (CFG, EnvConfig(6, 5, 0.1), EnvConfig(8, 6, 0.3))
    B, T = 8192, 64
    K = 4 if quick else 16
    nS = sum(tables.build_statespace(c).nS for c in cfgs)
    m = lk.pack_m(cfgs, jnp.full((nS, 5), 0.2), jnp.full((nS, 5), 0.2),
                  jnp.zeros((nS, 5, 5)), jnp.zeros(nS), eps=0.3)
    planes, fields0 = lk.init_state_fields(cfgs, B)

    def run():
        fields = fields0
        for k in range(K):
            fields, acc, stats = lk.multigrid_learner_chunk(
                cfgs, k, m, planes, fields, B, T)
        fetch(acc.sum())

    dt = timed(run)
    return B * T * K / dt


def bench_pallas_multigrid_packed(quick):
    """Packed-layout fused learner over the 3-variant mixture."""
    cfgs = (CFG, EnvConfig(6, 5, 0.1), EnvConfig(8, 6, 0.3))
    return _bench_learner_chunks(cfgs, True, 32768, 64,
                                 2 if quick else 8, mg=True)


def bench_pallas_altq_learner(quick):
    """Fused pallas alternating-turn Q-learner (ops/altq_kernel)."""
    return _bench_altq(quick, packed=False)


def bench_pallas_altq_learner_packed(quick):
    """Packed-layout fused alternating-turn Q-learner."""
    return _bench_altq(quick, packed=True, B=32768)


def _bench_altq(quick, packed, B=8192):
    from gym_soccer_tpu.ops import altq_kernel as ak
    from gym_soccer_tpu.envs.soccer_alternating_env import build_alt_tables
    T = 64
    K = 4 if quick else 16
    nS = build_alt_tables(CFG).nS
    m = (ak.pack_alt_m2 if packed else ak.pack_alt_m)(CFG,
                                                      jnp.zeros((nS, 5)))
    chunk = ak.altq_packed_chunk if packed else ak.altq_chunk
    fields0 = ak.init_alt_state_fields(CFG, B)
    eps = int(0.3 * 65536)

    def run():
        fields = fields0
        for k in range(K):
            fields, acc, stats = chunk(CFG, k, eps, m, fields, B, T,
                                       step_offset=k * T)
        fetch(acc.sum())

    dt = timed(run)
    return B * T * K / dt


def bench_parity(quick):
    B, T = 8192, 200 if quick else 1000
    pt = parity.parity_tables(CFG)
    hi, lo = parity.gen_streams(np.arange(B) % 64, 2 * T + 2)
    hi, lo = jnp.asarray(hi), jnp.asarray(lo)
    rows = jnp.asarray(np.random.RandomState(0).randint(
        0, 25, size=(T, B)).astype(np.int32))
    st0 = parity.parity_init(CFG, B)
    roll = jax.jit(lambda s, r: parity.parity_rollout(CFG, pt, s, r, hi, lo))

    def run():
        final, out = roll(st0, rows)
        fetch(out.reward_a.sum())

    dt = timed(run)
    return B * T / dt


def bench_parity_kernel(quick):
    """Fused pallas parity kernel (bit-exact closed-loop, event-timed)."""
    from gym_soccer_tpu.core import tables
    from gym_soccer_tpu.ops import parity_kernel as pkm
    B = 8192
    e_s, e_l = (256, 512) if quick else (512, 1536)
    nS = tables.build_statespace(CFG).nS
    pol_a = np.random.RandomState(1).randint(0, 5, nS).astype(np.int32)
    pol_b = np.random.RandomState(7).randint(0, 5, nS).astype(np.int32)
    jr = pkm.jointrow_raw(CFG, pol_a, pol_b)
    seeds = (np.arange(B) % 997).astype(np.uint32)

    def run(E):
        out = pkm.parity_events(CFG, seeds, jr, E)
        return int(fetch(out.steps).sum())

    def measure(E):
        run(E)
        return timed(lambda: run(E))

    w_s, w_l = measure(e_s), measure(e_l)
    steps = run(e_l)
    return (e_l - e_s) * B / max(w_l - w_s, 1e-9) * (steps / (e_l * B))


def bench_pallas_multigrid(quick):
    """Fused MIXED-geometry rollout: 3 board variants stepped by one
    pallas kernel with per-lane geometry planes (chained dispatches)."""
    from gym_soccer_tpu.ops.step_kernel import pallas_multigrid_rollout_chained
    B = 8192
    cfgs = (EnvConfig(5, 4, 0.2), EnvConfig(6, 5, 0.1), EnvConfig(8, 6, 0.3))
    t_short, t_long = (1000, 5000) if quick else (2000, 20000)

    def measure(T):
        def run():
            _, st = pallas_multigrid_rollout_chained(
                cfgs, jnp.int32(1), B, T, steps_per_call=10000)
            fetch(st[0, 1])
        return timed(run, n=5)

    w_s, w_l = measure(t_short), measure(t_long)
    return (t_long - t_short) * B / max(w_l - w_s, 1e-9)


def bench_pallas(quick):
    """Fused simultaneous rollout, chained dispatches (<=10k fused steps
    per pallas call — single calls beyond ~20k wedge the relay)."""
    from gym_soccer_tpu.ops.step_kernel import pallas_rollout_chained
    B = 8192
    t_short, t_long = (1000, 5000) if quick else (2000, 20000)

    def measure(T):
        def run():
            _, st = pallas_rollout_chained(CFG, jnp.int32(1), B, T,
                                           steps_per_call=10000)
            fetch(st[1])
        return timed(run, n=5)

    w_s, w_l = measure(t_short), measure(t_long)
    return (t_long - t_short) * B / max(w_l - w_s, 1e-9)


def bench_pallas_journal(quick):
    """JOURNALED fused rollout: the full per-step transition stream (one
    packed int32 per lane-step — the reference emits this every tick,
    soccer_simultaneous_env.py:375-408) written to HBM while stepping.
    Journal chunks stay on device (a consumer would overlap decode/fetch);
    the slope includes every journal HBM write because each dispatch's
    stats depend on the whole kernel having run."""
    from gym_soccer_tpu.ops.step_kernel import pallas_journal_rollout_chained
    B = 8192
    t_short, t_long = (512, 2048) if quick else (1024, 8192)

    def measure(T):
        def run():
            _, st, _ = pallas_journal_rollout_chained(
                CFG, jnp.int32(1), B, T, steps_per_call=2048,
                consume=lambda j, off: None)
            fetch(st[1])
        return timed(run, n=5)

    w_s, w_l = measure(t_short), measure(t_long)
    return (t_long - t_short) * B / max(w_l - w_s, 1e-9)


def bench_pallas_alt(quick):
    """Fused alternating-turn rollout (single-mover ticks).  The tick is
    ~2.6x cheaper than the simultaneous game's, so the slope needs a wider
    baseline (2k->20k is noise-dominated on the tunneled relay); the long
    leg is CHAINED shorter dispatches so no single pallas call exceeds the
    documented ~20k fused-step relay-wedge ceiling."""
    from gym_soccer_tpu.ops.step_kernel import pallas_alt_rollout_chained
    B = 8192
    t_short, t_long = (1000, 5000) if quick else (2000, 60000)

    def measure(T):
        def run():
            _, st = pallas_alt_rollout_chained(CFG, jnp.int32(1), B, T,
                                               steps_per_call=12000)
            fetch(st[1])
        return timed(run, n=5)

    w_s, w_l = measure(t_short), measure(t_long)
    return (t_long - t_short) * B / max(w_l - w_s, 1e-9)


def bench_table_build(quick):
    """Native C++ transition-table build — 11x7 grid (reference: 35.7 s),
    or 5x4 under --quick.  Returns dense transition entries built per
    second (nS * 25 joint actions * 36 slots)."""
    from gym_soccer_tpu.core import tables
    cfg = EnvConfig(5, 4, 0.2) if quick else EnvConfig(11, 7, 0.2)
    ss = tables.build_statespace(cfg)
    t0 = time.perf_counter()
    tb = tables._build_tables_native(cfg, ss)
    dt = time.perf_counter() - t0
    if tb is None:
        raise RuntimeError("native builder unavailable")
    return tb.nS * 25 * 36 / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    ref = 2.7e4
    rowspec = [
        ("facade_single_env", bench_facade),
        ("xla_batch_engine_traj", bench_xla),
        ("xla_stats_threefry", bench_xla_stats_threefry),
        ("xla_stats_counter", bench_xla_stats_counter),
        ("xla_multigrid_mixed", bench_multigrid),
        ("xla_alternating_engine", bench_alternating),
        ("xla_altq_learner", bench_altq_learner),
        ("pallas_minimax_learner", bench_pallas_minimax_learner),
        ("pallas_minimax_learner_packed", bench_pallas_minimax_learner_packed),
        ("pallas_learner_11x7_packed", bench_pallas_learner_11x7),
        ("pallas_br_learner", bench_pallas_br_learner),
        ("pallas_iql_learner", bench_pallas_iql_learner),
        ("pallas_iql_learner_packed", bench_pallas_iql_learner_packed),
        ("pallas_multigrid_learner", bench_pallas_multigrid_learner),
        ("pallas_multigrid_learner_packed", bench_pallas_multigrid_packed),
        ("pallas_altq_learner", bench_pallas_altq_learner),
        ("pallas_altq_learner_packed", bench_pallas_altq_learner_packed),
        ("parity_bit_exact", bench_parity),
        ("parity_kernel_fused", bench_parity_kernel),
        ("pallas_fused", bench_pallas),
        ("pallas_fused_journal", bench_pallas_journal),
        ("pallas_multigrid_fused", bench_pallas_multigrid),
        ("pallas_alt_fused", bench_pallas_alt),
        ("table_build_native", bench_table_build),
    ]
    for name, fn in rowspec:
        try:
            v = fn(args.quick)
            print(json.dumps({"path": name, "env_steps_per_s": round(v),
                              "vs_reference": round(v / ref, 1)}))
        except Exception as e:  # keep the sweep going
            print(json.dumps({"path": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()

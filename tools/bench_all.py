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
    B, T = 8192, 200 if quick else 1000
    pol = batch.random_policy_fn(CFG, jax.random.key(1), B)
    st = jax.jit(lambda k: batch.init(CFG, k, B))(jax.random.key(0))
    roll = jax.jit(lambda s: batch.rollout(CFG, s, pol, T))

    def run():
        nonlocal st
        st, out = roll(st)
        fetch(out.reward_a.sum())

    dt = timed(run)
    return B * T / dt


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


def bench_pallas(quick):
    from gym_soccer_tpu.ops.step_kernel import pallas_rollout
    B = 8192
    t_short, t_long = (1000, 5000) if quick else (2000, 20000)

    def measure(T):
        def run():
            _, st = pallas_rollout(CFG, jnp.int32(1), B, T)
            fetch(st[1])
        return timed(run, n=5)

    w_s, w_l = measure(t_short), measure(t_long)
    return (t_long - t_short) * B / max(w_l - w_s, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    ref = 2.7e4
    rowspec = [
        ("facade_single_env", bench_facade),
        ("xla_batch_engine", bench_xla),
        ("parity_bit_exact", bench_parity),
        ("pallas_fused", bench_pallas),
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

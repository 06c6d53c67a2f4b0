"""Headline benchmark: batched env-step throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config matches BASELINE.json config 2/3 territory: 8192 env instances in
lockstep, random-vs-random joint actions, default 5x4 Littman grid,
slip 0.2.  ``vs_baseline`` is measured against the reference
implementation's single-env step loop at ~2.7e4 steps/s (the only
measurable reference number — it publishes none; SURVEY.md §6).
"""
import json
import time

import jax

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import batch

REFERENCE_STEPS_PER_S = 2.7e4  # reference step() loop, 1 CPU core (SURVEY §6)


def main():
    cfg = EnvConfig(width=5, height=4, slip_prob=0.2)
    B, T = 8192, 1000
    pol = batch.random_policy_fn(cfg, jax.random.key(1), B)

    @jax.jit
    def init(key):
        return batch.init(cfg, key, B)

    @jax.jit
    def chunk(s):
        s, out = batch.rollout(cfg, s, pol, T)
        return s, (out.reward_a.sum(), out.done.sum(), out.truncated.sum())

    st = jax.block_until_ready(init(jax.random.key(0)))
    st, _ = jax.block_until_ready(chunk(st))  # compile + warmup

    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        st, stats = chunk(st)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / n

    steps_per_s = B * T / dt
    print(json.dumps({
        "metric": "env_steps_per_s_per_chip_8192envs",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()

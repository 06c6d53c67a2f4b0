"""Headline benchmark: batched env-step throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config is BASELINE.json config 2/3 territory: 8192 env instances in
lockstep, random-vs-random joint actions, default 5x4 Littman grid,
slip 0.2.  Primary path is the fused pallas rollout kernel
(gym_soccer_tpu/ops/step_kernel.py, whole rollout on-chip); falls back to
the generic XLA engine (core/batch.py) if pallas is unavailable on the
backend.  ``vs_baseline`` compares against the reference implementation's
single-env step loop at ~2.7e4 steps/s (the only measurable reference
number — it publishes none; SURVEY.md §6).
"""
import json
import os
import subprocess
import sys
import time

REFERENCE_STEPS_PER_S = 2.7e4  # reference step() loop, 1 CPU core (SURVEY §6)


def device_alive(timeout_s: int = 150) -> bool:
    """The tunneled TPU occasionally wedges (CLAUDE.md); probe it in a
    subprocess so a dead device can't hang the whole benchmark."""
    probe = ("import jax, numpy as np, jax.numpy as jnp;"
             "print(int(np.asarray(jnp.arange(3).sum())))")
    try:
        out = subprocess.run([sys.executable, "-c", probe],
                             capture_output=True, timeout=timeout_s)
        return out.returncode == 0 and b"3" in out.stdout
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__" and not device_alive():
    # Fall back to the CPU backend so the driver still gets a JSON line.
    os.environ["BENCH_FORCE_CPU"] = "1"

import jax  # noqa: E402

if os.environ.get("BENCH_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from gym_soccer_tpu.config import EnvConfig  # noqa: E402
from gym_soccer_tpu.core import batch  # noqa: E402

CFG = EnvConfig(width=5, height=4, slip_prob=0.2)
B, T = 8192, 1000


def bench_pallas():
    """Slope methodology: median wall time (with a real host value fetch as
    the barrier — block_until_ready is unreliable on tunneled backends) at
    two kernel lengths; throughput = d(steps)/d(wall).  This cancels
    dispatch/transfer latency exactly.  T capped at 20k — this
    environment's relay wedges on longer-running kernels."""
    import numpy as np
    from gym_soccer_tpu.ops.step_kernel import pallas_rollout

    def measure(T, n=8):
        _, st = pallas_rollout(CFG, jax.numpy.int32(0), B, T)
        int(np.asarray(st[1]))  # warmup + compile
        ws = []
        for i in range(n):
            t0 = time.perf_counter()
            _, st = pallas_rollout(CFG, jax.numpy.int32(i + 1), B, T)
            int(np.asarray(st[1]))
            ws.append(time.perf_counter() - t0)
        return sorted(ws)[n // 2]

    t_short, t_long = 2000, 20000
    w_short = measure(t_short)
    w_long = measure(t_long)
    assert w_long > w_short, "timing anomaly"
    return (t_long - t_short) * B / (w_long - w_short), \
        "pallas_fused_rollout"


def bench_xla():
    pol = batch.random_policy_fn(CFG, jax.random.key(1), B)

    @jax.jit
    def init(key):
        return batch.init(CFG, key, B)

    @jax.jit
    def chunk(s):
        s, out = batch.rollout(CFG, s, pol, T)
        return s, out.reward_a.sum()

    st = jax.block_until_ready(init(jax.random.key(0)))
    st, _ = jax.block_until_ready(chunk(st))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        st, _ = chunk(st)
    jax.block_until_ready(st)
    dt = (time.perf_counter() - t0) / n
    return B * T / dt, "xla_engine"


def main():
    if os.environ.get("BENCH_FORCE_CPU"):
        steps_per_s, path = bench_xla()
        path = "xla_engine_CPU_FALLBACK_tpu_relay_unresponsive"
    else:
        try:
            steps_per_s, path = bench_pallas()
        except Exception:
            steps_per_s, path = bench_xla()
    print(json.dumps({
        "metric": f"env_steps_per_s_per_chip_8192envs_{path}",
        "value": round(steps_per_s),
        "unit": "env-steps/s",
        "vs_baseline": round(steps_per_s / REFERENCE_STEPS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()

"""Headline benchmark: batched env-step throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Config is BASELINE.json config 2/3 territory: 8192 env instances in
lockstep, random-vs-random joint actions, default 5x4 Littman grid,
slip 0.2.  Primary path is the fused pallas rollout kernel
(gym_soccer_tpu/ops/step_kernel.py) timed with the slope methodology
(two kernel lengths, real host-fetch barriers — see CLAUDE.md on why
naive timings lie on this tunneled backend).  The TPU attempt runs in a
subprocess with a hard timeout because the relay occasionally wedges;
wedges recover in ~4-6 min (CLAUDE.md), so on failure we WAIT and RETRY
(3 attempts total, 5-min backoff) with a persistent JAX compilation
cache so retries skip recompilation.  Only after exhausting retries does
the CPU-backend XLA engine provide a clearly-labeled fallback line so
the driver never hangs.  ``vs_baseline`` compares against the reference
implementation's measured step loop (~2.7e4 steps/s, SURVEY §6).
"""
import json
import os
import subprocess
import sys
import time

REFERENCE_STEPS_PER_S = 2.7e4  # reference step() loop, 1 CPU core (SURVEY §6)
B, T = 8192, 1000
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")


def bench_device_subprocess(timeout_s: int = 480):
    """Full TPU benchmark in a child process with a hard timeout."""
    code = (
        "from bench import bench_pallas, bench_xla\n"
        "import json\n"
        "try:\n"
        "    v, p = bench_pallas()\n"
        "except Exception:\n"
        "    v, p = bench_xla()\n"
        "print('BENCH_RESULT ' + json.dumps([v, p]))\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=timeout_s, env={**os.environ, "BENCH_CHILD": "1"},
            cwd=os.path.dirname(os.path.abspath(__file__)))
    except subprocess.TimeoutExpired:
        return None
    for line in out.stdout.splitlines():
        if line.startswith("BENCH_RESULT "):
            v, p = json.loads(line[len("BENCH_RESULT "):])
            return float(v), str(p)
    return None


def bench_device_with_retries(attempts: int = 3, backoff_s: int = 300,
                              timeout_s: int = 480):
    """Relay wedges are transient (recover in ~4-6 min); a round's headline
    number must not depend on ONE attempt landing outside a wedge window
    (round 3 lesson).  Retry with a backoff sized to the recovery time."""
    for i in range(attempts):
        result = bench_device_subprocess(timeout_s=timeout_s)
        if result is not None and result[1].startswith("pallas"):
            return result
        # A pure-XLA child result still proves the device works; keep it as
        # a candidate but retry for the pallas path first.
        if result is not None and i == attempts - 1:
            return result
        if i < attempts - 1:
            sys.stderr.write(
                f"bench attempt {i + 1}/{attempts} "
                f"{'fell back to ' + result[1] if result else 'timed out'}; "
                f"waiting {backoff_s}s for relay recovery\n")
            sys.stderr.flush()
            time.sleep(backoff_s)
    return None


def _jax():
    import jax
    if os.environ.get("BENCH_FORCE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    try:  # persistent compile cache: retries after a wedge skip warmup
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these flags
    return jax


def bench_pallas():
    """Slope methodology: median wall time (host value fetch as barrier)
    at two rollout lengths; throughput = d(steps)/d(wall).  Long legs run
    as CHAINED dispatches of <=10k fused steps (single pallas calls
    beyond ~20k wedge this environment's relay; chaining is async-
    pipelined, so it costs nothing measurable)."""
    import numpy as np
    jax = _jax()
    from gym_soccer_tpu.config import EnvConfig
    from gym_soccer_tpu.ops.step_kernel import pallas_rollout_chained
    cfg = EnvConfig(width=5, height=4, slip_prob=0.2)

    def measure(T_k, n=8):
        def run(seed):
            _, st = pallas_rollout_chained(cfg, jax.numpy.int32(seed), B,
                                           T_k, steps_per_call=10000)
            int(np.asarray(st[1]))
        run(0)  # warmup + compile
        ws = []
        for i in range(n):
            t0 = time.perf_counter()
            run(i + 1)
            ws.append(time.perf_counter() - t0)
        return sorted(ws)[n // 2]

    t_short, t_long = 2000, 20000
    w_short = measure(t_short)
    w_long = measure(t_long)
    assert w_long > w_short, "timing anomaly"
    return (t_long - t_short) * B / (w_long - w_short), \
        "pallas_fused_rollout"


def bench_xla():
    """Generic XLA engine at its best configuration: stats-accumulating
    random rollout (no trajectory journaling) with the counter RNG."""
    import numpy as np
    jax = _jax()
    from gym_soccer_tpu.config import EnvConfig
    from gym_soccer_tpu.core import batch
    cfg = EnvConfig(width=5, height=4, slip_prob=0.2)

    @jax.jit
    def init(key):
        return batch.init(cfg, key, B)

    @jax.jit
    def chunk(s):
        s, acc = batch.random_rollout_stats(cfg, s, T, rng="counter")
        return s, acc.reward_sum

    st = init(jax.random.key(0))
    st, r = chunk(st)
    float(np.asarray(r))
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        st, r = chunk(st)
    float(np.asarray(r))
    dt = (time.perf_counter() - t0) / n
    return B * T / dt, "xla_engine"


def main():
    result = bench_device_with_retries()
    if result is None:
        os.environ["BENCH_FORCE_CPU"] = "1"
        v, _ = bench_xla()
        path = "xla_engine_CPU_FALLBACK_tpu_relay_unresponsive"
    else:
        v, path = result
    print(json.dumps({
        "metric": f"env_steps_per_s_per_chip_8192envs_{path}",
        "value": round(v),
        "unit": "env-steps/s",
        "vs_baseline": round(v / REFERENCE_STEPS_PER_S, 1),
    }))


if __name__ == "__main__":
    main()

"""On-chip check + throughput bench for the fused pallas parity kernel.

1. Verifies BIT-EXACTNESS on the real device (the CI tests run interpret
   mode on CPU; this proves the compiled Mosaic kernel too): journal ==
   core/parity.parity_policy_events for a lane subset.
2. Slope-measured throughput (two event counts, host-fetch barriers —
   see CLAUDE.md on fake-ready), reporting events/s and env-steps/s.

Keep per-call work bounded: very long single dispatches can wedge this
environment's tunneled relay; chain calls for longer evaluations.

Run: python tools/bench_parity_kernel.py [--batch 8192] [--quick]
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
from gym_soccer_tpu.core import parity, tables  # noqa: E402
from gym_soccer_tpu.ops import parity_kernel as pkm  # noqa: E402

CFG = EnvConfig(5, 4, 0.2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--e-short", type=int, default=512)
    ap.add_argument("--e-long", type=int, default=1536)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    B = args.batch
    e_s, e_l = (args.e_short, args.e_long) if not args.quick else (256, 512)

    nS = tables.build_statespace(CFG).nS
    pol_a = np.random.RandomState(1).randint(0, 5, nS).astype(np.int32)
    pol_b = np.random.RandomState(7).randint(0, 5, nS).astype(np.int32)
    jr = pkm.jointrow_raw(CFG, pol_a, pol_b)
    seeds = (np.arange(B) % 997).astype(np.uint32)

    # ---- on-chip bit-exactness (subset of lanes vs the XLA oracle) ----
    out = pkm.parity_events(CFG, seeds, jr, 512)
    J = pkm.unpack_journal(np.asarray(out.journal)[:, :256])
    pt = parity.parity_tables(CFG)
    rows = parity.policy_rows(pt, pol_a, pol_b)
    hi, lo = parity.gen_streams(seeds[:256], 512)
    st0 = parity.parity_init(CFG, 256)
    _, ev = jax.jit(lambda s: parity.parity_policy_events(
        CFG, pt, s, rows, 512, jnp.asarray(hi), jnp.asarray(lo)))(st0)
    exact = (np.array_equal(J["raw"], np.asarray(ev.raw))
             and np.array_equal(J["reward_a"].astype(np.float32),
                                np.asarray(ev.reward_a))
             and np.array_equal(J["done"].astype(bool), np.asarray(ev.done)))
    print(json.dumps({"check": "on_chip_bit_exact", "ok": bool(exact),
                      "backend": jax.devices()[0].platform}))
    if not exact:
        return 1

    # ---- slope throughput ----
    def run(E):
        o = pkm.parity_events(CFG, seeds, jr, E)
        return int(np.asarray(o.steps).sum())

    def timed(E, n=3):
        run(E)
        ts = []
        s = 0
        for _ in range(n):
            t0 = time.perf_counter()
            s = run(E)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2], s

    w1, _ = timed(e_s)
    w2, s2 = timed(e_l)
    ev_rate = (e_l - e_s) * B / max(w2 - w1, 1e-9)
    step_frac = s2 / (e_l * B)
    print(json.dumps({
        "metric": "parity_kernel", "batch": B,
        "events_per_s": round(ev_rate),
        "step_fraction": round(step_frac, 4),
        "env_steps_per_s_bit_exact": round(ev_rate * step_frac),
        "w_short_s": round(w1, 4), "w_long_s": round(w2, 4),
    }))

    # ---- SCRIPTED mode: on-chip exactness + slope ----
    # the script must cover every measured event (lanes past its end
    # play row 0 through an empty cursor band — cheaper, so letting the
    # slope run off the script would inflate the number); 800 rows is
    # near the VMEM cap and covers the 768-event long leg
    T = 800
    e_s, e_l = (256, 768) if not args.quick else (128, 384)
    rng = np.random.RandomState(3)
    rows_s = (rng.randint(0, 5, (T, B)) * 5
              + rng.randint(0, 5, (T, B))).astype(np.int32)
    o = pkm.parity_scripted_events(CFG, seeds, rows_s, 256)
    Js = pkm.unpack_journal(np.asarray(o.journal)[:, :128])
    hi, lo = parity.gen_streams(seeds[:128], 2 * 128 + 2)
    st0 = parity.parity_init(CFG, 128)
    _, so = jax.jit(lambda s: parity.parity_rollout(
        CFG, pt, s, jnp.asarray(rows_s[:128, :128]), jnp.asarray(hi),
        jnp.asarray(lo)))(st0)
    so = jax.tree.map(np.asarray, so)
    r2d = tables.build_statespace(CFG).raw_to_dense
    ok = True
    n_script = so.obs.shape[0]  # oracle ran 128 script rows
    for b in range(0, 128, 31):
        tr = Js["was_reset"][:, b] == 0
        n = min(int(tr.sum()), n_script)
        ok &= np.array_equal(r2d[Js["raw"][tr, b][:n]], so.obs[:n, b])
        ok &= np.array_equal(Js["reward_a"][tr, b][:n].astype(np.float32),
                             so.reward_a[:n, b])
    print(json.dumps({"check": "scripted_on_chip_bit_exact",
                      "ok": bool(ok)}))

    def run_s(E):
        o = pkm.parity_scripted_events(CFG, seeds, rows_s, E)
        return int(np.asarray(o.steps).sum())

    def timed_s(E, n=3):
        run_s(E)
        ts, s = [], 0
        for _ in range(n):
            t0 = time.perf_counter()
            s = run_s(E)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[n // 2], s

    ws1, _ = timed_s(e_s)
    ws2, ss2 = timed_s(e_l)
    ev_rate_s = (e_l - e_s) * B / max(ws2 - ws1, 1e-9)
    frac_s = ss2 / (e_l * B)
    print(json.dumps({
        "metric": "parity_kernel_scripted", "batch": B, "script_rows": T,
        "events_per_s": round(ev_rate_s),
        "env_steps_per_s_bit_exact": round(ev_rate_s * frac_s),
        "w_short_s": round(ws1, 4), "w_long_s": round(ws2, 4),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

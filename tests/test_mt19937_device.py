"""On-device MT19937: bit-exactness vs the host generator, and the fully
device-resident parity path against golden fixtures."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import mt19937, parity, rules

with open(os.path.join(os.path.dirname(__file__), "golden",
                       "reference_golden.json")) as f:
    GOLD = json.load(f)


def test_device_streams_bit_exact_vs_host():
    seeds = np.asarray([0, 1, 7, 42, 123, 999983, 2**31 - 1, 2**32 - 1],
                       np.uint32)
    hi_d, lo_d = jax.jit(
        lambda s: mt19937.device_streams(s, 700))(jnp.asarray(seeds))
    hi_h, lo_h = parity.gen_streams(seeds, 700)
    assert np.array_equal(np.asarray(hi_d), hi_h)
    assert np.array_equal(np.asarray(lo_d), lo_h)


def test_double_bits_construction():
    """Integer-only IEEE-754 assembly must equal real float64 bit split,
    including denormal-free edge cases (0, 1, 2^53-1)."""
    rng = np.random.RandomState(0)
    a = rng.randint(0, 2**27, size=500).astype(np.uint32)
    b = rng.randint(0, 2**26, size=500).astype(np.uint32)
    a[:3] = [0, 0, 2**27 - 1]
    b[:3] = [0, 1, 2**26 - 1]
    hi, lo = jax.jit(mt19937.double_bits)(jnp.asarray(a), jnp.asarray(b))
    vals = (a.astype(np.float64) * 67108864.0 + b) / 9007199254740992.0
    rhi, rlo = parity.f64_bits(vals)
    assert np.array_equal(np.asarray(hi), rhi)
    assert np.array_equal(np.asarray(lo), rlo)


def test_device_resident_parity_rollout():
    """Seeds in -> bit-exact reference trajectories out, all on device."""
    name = "traj_5x4_slip02_multi_seed123"
    cfg = EnvConfig(5, 4, 0.2)
    pt = parity.parity_tables(cfg)
    rec = GOLD[name]
    steps = [r for r in rec["steps"] if not r.get("reset")]
    rows = jnp.asarray(np.asarray(
        [[s["action"]["player_a"] * 5 + s["action"]["player_b"]]
         for s in steps], np.int32))
    final, out = jax.jit(
        lambda s: parity.parity_rollout_device(cfg, pt, s, rows))(
        jnp.asarray([rec["seed"]], jnp.uint32))
    assert np.asarray(out.obs)[:, 0].tolist() == \
        [s["obs"]["player_a"] for s in steps]
    assert list(rules.raw_decode(
        np, int(np.asarray(final.raw)[0]), cfg)) == steps[-1]["state"]

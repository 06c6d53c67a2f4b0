"""Native C++ host components: the MT19937 stream generator (bit-exact vs
numpy's RandomState, wired into the parity backend) and the threaded
transition-table builder (byte-exact vs the numpy builder)."""
import numpy as np
import pytest

from gym_soccer_tpu import native
from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import tables

TENSOR_FIELDS = ("t_prob", "t_cum", "t_next_raw", "t_next_dense",
                 "t_reward", "t_done", "t_mask", "t_first")


@pytest.mark.skipif(not native.have_native(),
                    reason="native toolchain unavailable")
def test_native_streams_bit_exact():
    seeds = np.asarray([0, 1, 2, 42, 123, 2**31 - 1, 999983], np.uint64)
    out = native.mt19937_streams(seeds, 257)
    assert out.shape == (len(seeds), 257)
    for i, s in enumerate(seeds):
        ref = np.random.RandomState(int(s)).random_sample(257)
        assert np.array_equal(out[i], ref), f"seed {s}"


@pytest.mark.skipif(not native.have_native(),
                    reason="native toolchain unavailable")
def test_parity_gen_streams_uses_identical_bits():
    from gym_soccer_tpu.core import parity
    seeds = [5, 9, 21]
    hi, lo = parity.gen_streams(seeds, 64)
    for i, s in enumerate(seeds):
        ref = np.random.RandomState(s).random_sample(64)
        rhi, rlo = parity.f64_bits(ref)
        assert np.array_equal(hi[i], rhi) and np.array_equal(lo[i], rlo)


def test_gen_streams_fallback_path():
    """The numpy fallback must produce the same bits as the native path."""
    from gym_soccer_tpu.core import parity
    import gym_soccer_tpu.native as nat
    seeds = [7, 11]
    hi_n, lo_n = parity.gen_streams(seeds, 32)
    saved = nat.mt19937_streams
    try:
        nat.mt19937_streams = lambda *a, **k: None  # force fallback
        hi_p, lo_p = parity.gen_streams(seeds, 32)
    finally:
        nat.mt19937_streams = saved
    assert np.array_equal(hi_n, hi_p) and np.array_equal(lo_n, lo_p)


@pytest.mark.skipif(not native.have_native_tables(),
                    reason="native toolchain unavailable")
@pytest.mark.parametrize("w,h,slip", [
    (5, 4, 0.2),     # default grid
    (5, 4, 0.0),     # deterministic (zero-prob combos dropped)
    (6, 5, 0.37),    # odd height (3 goal rows), irrational-ish slip
    (9, 6, 1.0),     # slip 1: no-slip combo has probability 0
])
def test_native_tables_byte_exact(w, h, slip):
    """The C++ builder must reproduce the numpy tensors byte-for-byte —
    including the fields of zero-probability padding slots, the float64
    probability/cumsum bit patterns, and the -0.0-preserving rewards."""
    cfg = EnvConfig(width=w, height=h, slip_prob=slip)
    ss = tables.build_statespace(cfg)
    tn = tables._build_tables_native(cfg, ss)
    tp = tables._build_tables_numpy(cfg, ss)
    assert tn is not None
    for f in TENSOR_FIELDS:
        a, b = getattr(tn, f), getattr(tp, f)
        assert a.dtype == b.dtype and a.shape == b.shape, f
        assert a.tobytes() == b.tobytes(), f"{f} differs for {w}x{h}@{slip}"


def test_build_tables_backend_dispatch():
    """'numpy' forces the fallback; 'native' errors only when unavailable;
    default ('auto') always returns a usable table set."""
    cfg = EnvConfig(width=5, height=4, slip_prob=0.2)
    tb_np = tables.build_tables(cfg, backend="numpy")
    tb_auto = tables.build_tables(cfg)
    for f in TENSOR_FIELDS:
        assert getattr(tb_auto, f).tobytes() == getattr(tb_np, f).tobytes()
    if native.have_native_tables():
        tb_nat = tables.build_tables(cfg, backend="native")
        assert tb_nat.t_cum.tobytes() == tb_np.t_cum.tobytes()

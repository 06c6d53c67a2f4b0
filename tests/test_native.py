"""Native C++ MT19937 stream generator: bit-exact vs numpy's RandomState
and wired into the parity backend."""
import numpy as np
import pytest

from gym_soccer_tpu import native


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

"""Fused pallas parity kernel (ops/parity_kernel) — bit-exactness.

Run in interpret mode on the CPU backend (conftest forces cpu); the
numerical path is identical to the compiled TPU kernel except the MXU
one-hot gathers, whose exactness is guaranteed structurally (8-bit table
limbs exact in bf16, one-hot selects a single term) and verified on-chip
by tools/bench_parity_kernel.py.

Anchoring chain: the kernel is compared event-by-event against
core/parity.parity_policy_events, which is compared against the step-time
parity rollout, which is pinned to golden fixtures generated from the
executed reference (tools/gen_golden.py) — including the reference
main()'s closed-loop policy evaluation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import parity, tables
from gym_soccer_tpu.ops import parity_kernel as pkm

CFG = EnvConfig(width=5, height=4, slip_prob=0.2)


def _policies(nS, sa=1, sb=7):
    ra = np.random.RandomState(sa).randint(0, 5, size=nS).astype(np.int32)
    rb = np.random.RandomState(sb).randint(0, 5, size=nS).astype(np.int32)
    return ra, rb


def _oracle(cfg, seeds, pol_a, pol_b, n_events):
    pt = parity.parity_tables(cfg)
    rows = parity.policy_rows(pt, pol_a, pol_b)
    hi, lo = parity.gen_streams(seeds, n_events)
    st0 = parity.parity_init(cfg, len(seeds))
    _, ev = jax.jit(lambda s: parity.parity_policy_events(
        cfg, pt, s, rows, n_events, jnp.asarray(hi), jnp.asarray(lo)))(st0)
    return jax.tree.map(np.asarray, ev)


def _kernel(cfg, seeds, pol_a, pol_b, n_events, **kw):
    jr = pkm.jointrow_raw(cfg, pol_a, pol_b)
    out = pkm.parity_events(cfg, np.asarray(seeds, np.uint32), jr, n_events,
                            interpret=True, **kw)
    return out, pkm.unpack_journal(out.journal)


def _assert_bitexact(J, ev):
    assert np.array_equal(J["raw"], ev.raw)
    assert np.array_equal(J["reward_a"].astype(np.float32), ev.reward_a)
    assert np.array_equal(J["done"].astype(bool), ev.done)
    assert np.array_equal(J["truncated"].astype(bool), ev.truncated)
    assert np.array_equal(J["was_reset"].astype(bool), ev.was_reset)


@pytest.mark.parametrize("slip", [0.2, 0.0])
def test_kernel_bitexact_vs_event_oracle(slip):
    """Journal == XLA event-time parity, across two MT19937 twist
    boundaries (E > 624), goal terminations, and episode chaining."""
    cfg = EnvConfig(5, 4, slip)
    nS = tables.build_statespace(cfg).nS
    pol_a, pol_b = _policies(nS)
    seeds = np.arange(128, dtype=np.uint32) * 7 + 3
    E = 640
    ev = _oracle(cfg, seeds, pol_a, pol_b, E)
    out, J = _kernel(cfg, seeds, pol_a, pol_b, E)
    _assert_bitexact(J, ev)
    assert np.array_equal(np.asarray(out.steps), (~ev.was_reset).sum(0))


def test_kernel_bitexact_truncation_horizon():
    """max_steps-driven truncation (reset draws re-synchronize lanes that
    truncate rather than score)."""
    cfg = EnvConfig(5, 4, 0.2, max_steps=17)
    nS = tables.build_statespace(cfg).nS
    # stand-vs-stand never scores from the ISD -> every episode truncates
    pol_a = np.zeros(nS, np.int32)
    pol_b = np.zeros(nS, np.int32)
    seeds = np.arange(128, dtype=np.uint32)
    E = 384
    ev = _oracle(cfg, seeds, pol_a, pol_b, E)
    out, J = _kernel(cfg, seeds, pol_a, pol_b, E)
    _assert_bitexact(J, ev)
    assert J["truncated"].sum() > 0 and J["done"].sum() == 0


def test_kernel_event_timing_matches_step_time_parity():
    """Transition events, filtered per lane, reproduce the step-time
    closed-loop rollout (the layer pinned to the reference goldens)."""
    nS = tables.build_statespace(CFG).nS
    pol_a, pol_b = _policies(nS, 11, 13)
    seeds = np.arange(128, dtype=np.uint32) % 31
    T = 150
    pt = parity.parity_tables(CFG)
    rows = parity.policy_rows(pt, pol_a, pol_b)
    hi, lo = parity.gen_streams(seeds, 2 * T + 2)
    st0 = parity.parity_init(CFG, len(seeds))
    _, step_out = jax.jit(lambda s: parity.parity_policy_rollout(
        CFG, pt, s, rows, T, jnp.asarray(hi), jnp.asarray(lo)))(st0)
    step_out = jax.tree.map(np.asarray, step_out)

    _, J = _kernel(CFG, seeds, pol_a, pol_b, 2 * T)
    r2d = tables.build_statespace(CFG).raw_to_dense
    for b in range(0, 128, 17):
        tr = J["was_reset"][:, b] == 0
        n = min(tr.sum(), T)
        assert np.array_equal(r2d[J["raw"][tr, b][:n]], step_out.obs[:n, b])
        assert np.array_equal(
            J["reward_a"][tr, b][:n].astype(np.float32),
            step_out.reward_a[:n, b])


def test_kernel_reproduces_reference_golden_policy_eval():
    """End-to-end: per-episode rewards/lengths of the reference main()'s
    closed-loop eval (VI policy vs frozen random B), reconstructed from
    the kernel's event journal, match the golden fixture generated from
    the EXECUTED reference."""
    import json
    import os
    gold = json.load(open(os.path.join(
        os.path.dirname(__file__), "golden", "reference_golden.json")))
    fx = gold["policy_eval_5x4_slip02_joint"]
    pol_a = np.asarray(fx["policy_a"], np.int32)
    pol_b = np.asarray(fx["policy_b"], np.int32)
    n_epi = 40  # enough episodes to cross a twist boundary
    lengths = fx["episode_lengths"][:n_epi]
    n_events = sum(lengths) + n_epi  # one reset draw per episode
    seeds = np.full(128, fx["reset_seed"], np.uint32)
    _, J = _kernel(CFG, seeds, pol_a, pol_b, n_events)

    lane = 0
    resets = J["was_reset"][:, lane].astype(bool)
    term = (J["done"][:, lane] | J["truncated"][:, lane]).astype(bool)
    rew = J["reward_a"][:, lane]
    # episodes delimited by termination events
    ends = np.nonzero(term)[0]
    got_lengths, got_rewards, start = [], [], 0
    for e in ends:
        seg = ~resets[start:e + 1]
        got_lengths.append(int(seg.sum()))
        got_rewards.append(float(rew[start:e + 1].sum()))
        start = e + 1
    assert got_lengths[:n_epi] == lengths
    want = [np.frombuffer(bytes.fromhex(h), np.float64)[0]
            for h in fx["episode_rewards"][:n_epi]]
    assert got_rewards[:n_epi] == [float(w) for w in want]
    # every lane ran the same seed: journals must be identical
    assert (J["raw"] == J["raw"][:, :1]).all()


def _scripted_oracle(cfg, seeds, rows, T):
    pt = parity.parity_tables(cfg)
    hi, lo = parity.gen_streams(seeds, 2 * T + 2)
    st0 = parity.parity_init(cfg, len(seeds))
    _, out = jax.jit(lambda s: parity.parity_rollout(
        cfg, pt, s, jnp.asarray(rows), jnp.asarray(hi), jnp.asarray(lo)))(st0)
    return jax.tree.map(np.asarray, out)


@pytest.mark.parametrize("slip", [0.2, 0.0])
def test_scripted_kernel_bitexact_vs_step_time_parity(slip):
    """Per-lane SCRIPTED action rows — the golden-fixture harness shape
    (soccer_simultaneous_env.py:394-396) — run on the fused kernel:
    transition events, filtered per lane, must reproduce the step-time
    scripted rollout (the layer pinned to the reference goldens)
    bit-for-bit; interleaved reset draws advance the stream but not the
    script cursor."""
    cfg = EnvConfig(5, 4, slip)
    B, T = 128, 120
    rng = np.random.RandomState(5)
    rows = (rng.randint(0, 5, (T, B)) * 5
            + rng.randint(0, 5, (T, B))).astype(np.int32)
    seeds = np.arange(B, dtype=np.uint32) * 3 + 1
    step_out = _scripted_oracle(cfg, seeds, rows, T)

    out = pkm.parity_scripted_events(cfg, seeds, rows, 2 * T,
                                     interpret=True)
    J = pkm.unpack_journal(out.journal)
    r2d = tables.build_statespace(cfg).raw_to_dense
    for b in range(0, B, 13):
        tr = J["was_reset"][:, b] == 0
        n = min(int(tr.sum()), T)
        assert n == T, "2T events must cover the whole script"
        assert np.array_equal(r2d[J["raw"][tr, b][:n]], step_out.obs[:n, b])
        assert np.array_equal(
            J["reward_a"][tr, b][:n].astype(np.float32),
            step_out.reward_a[:n, b])
        assert np.array_equal(J["done"][tr, b][:n].astype(bool),
                              step_out.done[:n, b])
        assert np.array_equal(J["truncated"][tr, b][:n].astype(bool),
                              step_out.truncated[:n, b])
    # steps counts consumed script rows
    assert (np.asarray(out.steps) >= T).all()


def test_scripted_kernel_11x7():
    """Scripted rows on the reference's big grid."""
    cfg = EnvConfig(11, 7, 0.2)
    B, T = 128, 48
    rng = np.random.RandomState(9)
    rows = (rng.randint(0, 5, (T, B)) * 5
            + rng.randint(0, 5, (T, B))).astype(np.int32)
    seeds = np.arange(B, dtype=np.uint32)
    step_out = _scripted_oracle(cfg, seeds, rows, T)
    out = pkm.parity_scripted_events(cfg, seeds, rows, 2 * T,
                                     interpret=True)
    J = pkm.unpack_journal(out.journal)
    r2d = tables.build_statespace(cfg).raw_to_dense
    for b in (0, 64, 127):
        tr = J["was_reset"][:, b] == 0
        n = min(int(tr.sum()), T)
        assert np.array_equal(r2d[J["raw"][tr, b][:n]],
                              step_out.obs[:n, b])


def test_scripted_kernel_rejects_oversize_scripts():
    # at B=1024 a lane block holds rblk=8 rows; 6-packed, a 50k-row
    # script still needs ~32 MB of VMEM per block — over the budget
    with pytest.raises(ValueError, match="script too long"):
        pkm.parity_scripted_events(
            CFG, np.zeros(1024, np.uint32),
            np.zeros((50000, 1024), np.int32), 128, interpret=True)


def test_build_pk_rejects_oversize_grids():
    with pytest.raises(ValueError):
        pkm.build_pk(EnvConfig(40, 30, 0.2))


def test_kernel_11x7_grid():
    """The reference's own big grid (nS=11705) runs on the kernel."""
    cfg = EnvConfig(11, 7, 0.3)
    nS = tables.build_statespace(cfg).nS
    pol_a, pol_b = _policies(nS)
    seeds = np.arange(128, dtype=np.uint32)
    E = 256
    ev = _oracle(cfg, seeds, pol_a, pol_b, E)
    _, J = _kernel(cfg, seeds, pol_a, pol_b, E)
    _assert_bitexact(J, ev)

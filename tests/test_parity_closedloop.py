"""Closed-loop parity: POLICY-IN-THE-LOOP device rollouts reproduce the
reference main()'s episodic evaluations bit-exactly.

The golden fixtures (tools/gen_golden.py run_policy_eval*) record the
executed reference playing ``policy[obs]`` for whole seasons of episodes on
one continuing MT19937 stream — the reference's flagship usage
(soccer_simultaneous_env.py:569-613: 1000 episodes of the VI best response
vs the frozen random player B).  Here the SAME evaluation runs as one
jitted device scan (core/parity.parity_policy_rollout): the action rows are
computed on device from the policy array, and every per-step observation,
reward bit pattern, done and truncation flag — plus the derived episode
rewards/lengths — must match the fixture exactly, per batch lane.
"""
import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gym_soccer_tpu.config import EnvConfig
from gym_soccer_tpu.core import parity

with open(os.path.join(os.path.dirname(__file__), "golden",
                       "reference_golden.json")) as f:
    GOLD = json.load(f)

CFG = EnvConfig(width=5, height=4, slip_prob=0.2)


def hex_to_f64(h):
    return np.frombuffer(bytes.fromhex(h), dtype=np.float64)[0]


def random_policy_array(n_states, n_actions, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, n_actions, size=n_states).astype(np.int32)


def run_closed_loop(pt, pol_rows, reset_seed, total_steps, lanes=2):
    """Roll `lanes` identical lanes and return host StepOut arrays."""
    seeds = [reset_seed] * lanes
    hi, lo = parity.gen_streams(seeds, 2 * total_steps + 2)
    st = parity.parity_init(CFG, lanes)
    roll = jax.jit(lambda s: parity.parity_policy_rollout(
        CFG, pt, s, jnp.asarray(pol_rows, jnp.int32), total_steps,
        jnp.asarray(hi), jnp.asarray(lo)))
    final, out = jax.block_until_ready(roll(st))
    return jax.tree.map(np.asarray, out)


def check_against_fixture(out, fx, lane):
    """Per-step digest + per-episode rewards/lengths for one lane."""
    obs = out.obs[:, lane]
    rew = out.reward_a[:, lane]
    done = out.done[:, lane]
    trunc = out.truncated[:, lane]

    h = hashlib.sha256()
    for t in range(len(obs)):
        h.update(int(obs[t]).to_bytes(4, "little"))
        h.update(np.float32(rew[t]).tobytes())
        h.update(b"\x01" if done[t] else b"\x00")
        h.update(b"\x01" if trunc[t] else b"\x00")
    assert h.hexdigest() == fx["step_stream_digest"]

    # derive per-episode rewards/lengths from the termination flags
    ends = np.flatnonzero(done | trunc)
    assert len(ends) == fx["n_episodes"]
    lengths = np.diff(np.concatenate([[-1], ends])).tolist()
    assert lengths == fx["episode_lengths"]
    start = 0
    for i, e in enumerate(ends):
        total = np.float64(0.0)
        for t in range(start, e + 1):
            total += np.float64(rew[t])
        want = hex_to_f64(fx["episode_rewards"][i])
        assert total == want, (i, total, want)
        start = e + 1
    # the printed aggregates of the reference main() (:613)
    assert np.isclose(
        np.mean([hex_to_f64(r) for r in fx["episode_rewards"]]),
        fx["avg_reward"])


def test_vi_vs_frozen_random_b_thousand_episodes():
    """The reference main() eval verbatim: VI best response vs frozen
    random B, 1000 episodes on one continuing stream — reproduced
    bit-exactly by the closed-loop device scan in two parallel lanes."""
    fx = GOLD["policy_eval_5x4_slip02_vi_vs_randomB"]
    pol_b = random_policy_array(761, 5, 0)
    pt = parity.parity_tables(CFG, "player_b", pol_b)
    vi_pi = np.asarray(fx["policy"], np.int32)
    rows = parity.policy_rows(pt, policy_a=vi_pi)
    out = run_closed_loop(pt, rows, fx["reset_seed"], fx["total_steps"])
    for lane in range(out.obs.shape[1]):
        check_against_fixture(out, fx, lane)


def test_joint_policies_closed_loop():
    """Multiagent closed loop: both deterministic policies drive the
    joint table row from the shared observation."""
    fx = GOLD["policy_eval_5x4_slip02_joint"]
    pt = parity.parity_tables(CFG)
    rows = parity.policy_rows(
        pt, policy_a=np.asarray(fx["policy_a"], np.int32),
        policy_b=np.asarray(fx["policy_b"], np.int32))
    out = run_closed_loop(pt, rows, fx["reset_seed"], fx["total_steps"])
    for lane in range(out.obs.shape[1]):
        check_against_fixture(out, fx, lane)


def test_policy_rows_validation():
    pt = parity.parity_tables(CFG)
    pol = np.zeros(761, np.int32)
    assert pt.n_rows == 25
    joint = np.asarray(parity.policy_rows(pt, pol, pol + 3))
    assert joint.min() == 3 and joint.max() == 3  # 0*5 + 3
    pt1 = parity.parity_tables(CFG, "player_b", pol)
    assert pt1.n_rows == 5
    assert np.array_equal(np.asarray(parity.policy_rows(
        pt1, policy_a=pol + 2)), pol + 2)

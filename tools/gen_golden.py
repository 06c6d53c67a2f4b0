"""Generate golden parity fixtures by EXECUTING the read-only reference
repo (/root/reference) against the minimal gym stub in tools/refstub.

The outputs (tests/golden/*.json) are behavioral ground truth: trajectories
under fixed seeds and content digests of the transition tables.  The
gym_soccer_tpu framework is tested bit-for-bit against these fixtures.

Run:  python tools/gen_golden.py
"""
import hashlib
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root (refstub's
# gym.spaces re-exports gym_soccer_tpu's space classes)
sys.path.insert(0, os.path.join(HERE, "refstub"))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

from gym_soccer.envs.soccer_simultaneous_env import SoccerSimultaneousEnv  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(HERE), "tests", "golden")
os.makedirs(OUT_DIR, exist_ok=True)


def f64_hex(x):
    """Bit-exact hex encoding of a float64 scalar."""
    return np.float64(x).tobytes().hex()


def digest_tables(env):
    """Canonical sha256 digests of P / P_readable / Pmat / Rmat / isd."""
    h = hashlib.sha256()
    for s in sorted(env.P.keys()):
        for a in sorted(env.P[s].keys(), key=lambda k: (k,) if isinstance(k, int) else k):
            h.update(repr((s, a)).encode())
            for prob, ns, r, d in env.P[s][a]:
                h.update(np.float64(prob).tobytes())
                h.update(int(ns).to_bytes(4, "little"))
                h.update(np.float64(r).tobytes())
                h.update(b"\x01" if d else b"\x00")
    p_digest = h.hexdigest()

    h = hashlib.sha256()
    for st in sorted(env.P_readable.keys()):
        for a in sorted(env.P_readable[st].keys()):
            h.update(repr((st, a)).encode())
            for prob, ns, r, d in env.P_readable[st][a]:
                h.update(np.float64(prob).tobytes())
                h.update(repr(tuple(ns)).encode())
                h.update(np.float64(r).tobytes())
                h.update(b"\x01" if d else b"\x00")
    pr_digest = h.hexdigest()

    pmat_digest = hashlib.sha256(np.ascontiguousarray(env.Pmat, dtype=np.float64).tobytes()).hexdigest()
    rmat_digest = hashlib.sha256(np.ascontiguousarray(env.Rmat, dtype=np.float64).tobytes()).hexdigest()
    isd = [[f64_hex(p), list(st)] for p, st in env.isd]
    return {
        "nS": env.nS,
        "nA": env.nA,
        "n_unreachable": len(env.unreachable_states),
        "n_goal_states": len(env.goal_states),
        "goal_rows": list(env.goal_rows),
        "goal_cols": list(env.goal_cols),
        "P_digest": p_digest,
        "P_readable_digest": pr_digest,
        "Pmat_digest": pmat_digest,
        "Rmat_digest": rmat_digest,
        "Pmat_shape": list(env.Pmat.shape),
        "isd": isd,
        "state_space_sample": {repr(k): v for k, v in list(env.state_space.items())[:8]},
    }


def run_trajectory(env, seed, action_script, agents):
    """Seeded episodic run with auto-reset-on-done; records everything."""
    rec = {"seed": seed, "steps": []}
    obs, infos = env.reset(seed=seed)
    rec["reset"] = {
        "state": list(env.state),
        "obs": {a: int(obs[a]) for a in agents},
        "info_p": {a: float(infos[a]["p"]) for a in agents},
    }
    for t, act in enumerate(action_script):
        if env.needs_reset:
            obs, infos = env.reset()
            rec["steps"].append({
                "t": t, "reset": True,
                "state": list(env.state),
                "obs": {a: int(obs[a]) for a in agents},
            })
        action = {k: int(v) for k, v in act.items()}
        obs, rew, dones, truncs, infos = env.step(action)
        rec["steps"].append({
            "t": t,
            "action": action,
            "state": list(env.state),
            "obs": {a: int(obs[a]) for a in agents},
            "reward": {a: f64_hex(rew[a]) for a in agents},
            "done": {a: bool(dones[a]) for a in agents},
            "trunc": {a: bool(truncs[a]) for a in agents},
            "info_p": {a: f64_hex(infos[a]["p"]) for a in agents},
        })
    return rec


def run_policy_eval_joint(env, policy_a, policy_b, reset_seed, n_episodes):
    """Closed-loop eval on a MULTIAGENT env: both players play their
    deterministic policies off the shared observation."""
    h = hashlib.sha256()
    rewards, lengths = [], []
    seed = reset_seed
    for _ in range(n_episodes):
        obs, _ = env.reset(seed=seed)
        seed = None
        total, steps, all_done = np.float64(0.0), 0, False
        while not all_done:
            act = {"player_a": int(policy_a[obs["player_a"]]),
                   "player_b": int(policy_b[obs["player_b"]])}
            obs, rs, ds, ts, _ = env.step(act)
            total += rs["player_a"]
            steps += 1
            all_done = any(ds.values()) or any(ts.values())
            h.update(int(obs["player_a"]).to_bytes(4, "little"))
            h.update(np.float32(rs["player_a"]).tobytes())
            h.update(b"\x01" if ds["player_a"] else b"\x00")
            h.update(b"\x01" if ts["player_a"] else b"\x00")
        rewards.append(total)
        lengths.append(steps)
    return {
        "reset_seed": reset_seed,
        "n_episodes": n_episodes,
        "policy_a": [int(policy_a[s]) for s in range(env.nS)],
        "policy_b": [int(policy_b[s]) for s in range(env.nS)],
        "episode_rewards": [f64_hex(r) for r in rewards],
        "episode_lengths": lengths,
        "total_steps": int(sum(lengths)),
        "step_stream_digest": h.hexdigest(),
        "avg_reward": float(np.mean(rewards)),
        "avg_steps": float(np.mean(lengths)),
    }


def multiagent_script(n, seed):
    rng = np.random.RandomState(seed)
    return [{"player_a": rng.randint(0, 5), "player_b": rng.randint(0, 5)} for _ in range(n)]


def single_script(agent, n, seed):
    rng = np.random.RandomState(seed)
    return [{agent: rng.randint(0, 5)} for _ in range(n)]


def random_policy(n_states, n_actions, seed):
    rng = np.random.RandomState(seed)
    return {s: int(rng.randint(0, n_actions)) for s in range(n_states)}


def run_policy_eval(env, policy, reset_seed, n_episodes, agent="player_a"):
    """The reference main()'s closed-loop eval (:569-613): play
    ``policy[obs]`` for ``n_episodes`` episodes on ONE env whose MT19937
    stream continues across resets.  Records per-episode rewards/lengths
    and a digest over the full per-step (obs, reward-f32-bits, done,
    trunc) stream — the bit-level ground truth for the device parity
    engine's closed-loop mode (core/parity.parity_policy_rollout)."""
    h = hashlib.sha256()
    rewards, lengths = [], []
    seed = reset_seed
    for _ in range(n_episodes):
        obs, _ = env.reset(seed=seed)
        seed = None  # later resets continue the stream (reference :578)
        total, steps, all_done = np.float64(0.0), 0, False
        while not all_done:
            a = int(policy[obs[agent]])
            obs, rs, ds, ts, _ = env.step({agent: a})
            total += rs[agent]
            steps += 1
            all_done = any(ds.values()) or any(ts.values())
            h.update(int(obs[agent]).to_bytes(4, "little"))
            h.update(np.float32(rs[agent]).tobytes())
            h.update(b"\x01" if ds[agent] else b"\x00")
            h.update(b"\x01" if ts[agent] else b"\x00")
        rewards.append(total)
        lengths.append(steps)
    return {
        "reset_seed": reset_seed,
        "n_episodes": n_episodes,
        "policy": [int(policy[s]) for s in range(env.nS)],
        "episode_rewards": [f64_hex(r) for r in rewards],
        "episode_lengths": lengths,
        "total_steps": int(sum(lengths)),
        "step_stream_digest": h.hexdigest(),
        "avg_reward": float(np.mean(rewards)),
        "avg_steps": float(np.mean(lengths)),
    }


def main():
    out = {}

    # --- multiagent 5x4 slip=0.2 ---
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2)
    out["tables_5x4_slip02_multi"] = digest_tables(env)
    out["traj_5x4_slip02_multi_seed123"] = run_trajectory(
        env, 123, multiagent_script(400, seed=7), ["player_a", "player_b"])
    out["traj_5x4_slip02_multi_seed0"] = run_trajectory(
        env, 0, multiagent_script(250, seed=11), ["player_a", "player_b"])

    # --- multiagent 5x4 slip=0.0 (deterministic except collision coins) ---
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.0)
    out["tables_5x4_slip00_multi"] = digest_tables(env)
    out["traj_5x4_slip00_multi_seed5"] = run_trajectory(
        env, 5, multiagent_script(300, seed=3), ["player_a", "player_b"])

    # --- multiagent 7x5 (odd height) slip=0.3 ---
    env = SoccerSimultaneousEnv(width=7, height=5, slip_prob=0.3)
    out["tables_7x5_slip03_multi"] = digest_tables(env)
    out["traj_7x5_slip03_multi_seed42"] = run_trajectory(
        env, 42, multiagent_script(300, seed=13), ["player_a", "player_b"])

    # --- multiagent 6x4 slip=0.1 ---
    env = SoccerSimultaneousEnv(width=6, height=4, slip_prob=0.1)
    out["tables_6x4_slip01_multi"] = digest_tables(env)
    out["traj_6x4_slip01_multi_seed77"] = run_trajectory(
        env, 77, multiagent_script(300, seed=23), ["player_a", "player_b"])

    # --- multiagent 9x6 slip=0.25 ---
    env = SoccerSimultaneousEnv(width=9, height=6, slip_prob=0.25)
    out["tables_9x6_slip025_multi"] = digest_tables(env)
    out["traj_9x6_slip025_multi_seed31"] = run_trajectory(
        env, 31, multiagent_script(300, seed=29), ["player_a", "player_b"])

    # --- single-agent A (frozen random B) 5x4 slip=0.2 ---
    pol_b = random_policy(761, 5, seed=0)
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2,
                                player_b_policy=pol_b)
    out["tables_5x4_slip02_singleA"] = digest_tables(env)
    out["traj_5x4_slip02_singleA_seed9"] = run_trajectory(
        env, 9, single_script("player_a", 300, seed=17), ["player_a"])

    # --- single-agent B (frozen random A) 5x4 slip=0.2 ---
    pol_a = random_policy(761, 5, seed=1)
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2,
                                player_a_policy=pol_a)
    out["tables_5x4_slip02_singleB"] = digest_tables(env)
    out["traj_5x4_slip02_singleB_seed21"] = run_trajectory(
        env, 21, single_script("player_b", 300, seed=19), ["player_b"])

    # --- closed-loop policy eval (reference main(), :569-613): VI best
    # response vs the frozen random B, 1000 episodes on one continuing
    # stream ---
    from gym_soccer.utils.planners import value_iteration
    pol_b = random_policy(761, 5, seed=0)
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2,
                                player_b_policy=pol_b)
    vi_pi, _, _, _ = value_iteration(env, theta=1e-10, discount_factor=0.99)
    out["policy_eval_5x4_slip02_vi_vs_randomB"] = run_policy_eval(
        env, vi_pi, reset_seed=101, n_episodes=1000)
    # and a smaller joint-policy (multiagent) closed loop: VI's A policy
    # against a deterministic B policy, both driven from the same obs
    pol_b_det = random_policy(761, 5, seed=4)
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2)
    rec = run_policy_eval_joint(env, vi_pi, pol_b_det, reset_seed=55,
                                n_episodes=200)
    out["policy_eval_5x4_slip02_joint"] = rec

    # --- MT19937 stream fixture: first uniforms for a few seeds ---
    streams = {}
    for seed in [0, 1, 5, 9, 21, 42, 123]:
        rs = np.random.RandomState(seed)
        streams[str(seed)] = [f64_hex(rs.random_sample()) for _ in range(64)]
    out["mt19937_streams"] = streams

    path = os.path.join(OUT_DIR, "reference_golden.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()

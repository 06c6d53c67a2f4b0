"""Compare gym_soccer_tpu's facade against the golden fixtures generated
from the reference (tools/gen_golden.py).  Exits nonzero on any mismatch."""
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from gym_soccer_tpu.envs import SoccerSimultaneousEnv  # noqa: E402

GOLD = json.load(open(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "reference_golden.json")))

FAIL = 0


def check(name, ok, detail=""):
    global FAIL
    if not ok:
        FAIL += 1
        print(f"FAIL {name}: {detail}")
    else:
        print(f"ok   {name}")


def f64_hex(x):
    return np.float64(x).tobytes().hex()


def digest_tables(env):
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
    return {
        "nS": env.nS, "nA": env.nA,
        "n_unreachable": len(env.unreachable_states),
        "n_goal_states": len(env.goal_states),
        "goal_rows": list(env.goal_rows), "goal_cols": list(env.goal_cols),
        "P_digest": p_digest, "P_readable_digest": pr_digest,
        "Pmat_digest": pmat_digest, "Rmat_digest": rmat_digest,
        "Pmat_shape": list(env.Pmat.shape),
        "isd": [[f64_hex(p), list(st)] for p, st in env.isd],
    }


def compare_tables(name, env):
    got = digest_tables(env)
    want = GOLD[name]
    for k in got:
        check(f"{name}.{k}", got[k] == want[k], f"{got[k]!r} != {want[k]!r}")


def compare_traj(name, env, agents):
    want = GOLD[name]
    obs, infos = env.reset(seed=want["seed"])
    wr = want["reset"]
    check(f"{name}.reset.state", list(env.state) == wr["state"],
          f"{env.state} != {wr['state']}")
    check(f"{name}.reset.obs",
          {a: int(obs[a]) for a in agents} == wr["obs"], f"{obs}")
    steps_bad = 0
    for rec in want["steps"]:
        if rec.get("reset"):
            obs, infos = env.reset()
            if list(env.state) != rec["state"]:
                steps_bad += 1
        else:
            obs, rew, dones, truncs, infos = env.step(rec["action"])
            ok = (list(env.state) == rec["state"]
                  and {a: int(obs[a]) for a in agents} == rec["obs"]
                  and {a: f64_hex(rew[a]) for a in agents} == rec["reward"]
                  and {a: bool(dones[a]) for a in agents} == rec["done"]
                  and {a: bool(truncs[a]) for a in agents} == rec["trunc"]
                  and {a: f64_hex(infos[a]["p"]) for a in agents} == rec["info_p"])
            if not ok:
                steps_bad += 1
                if steps_bad == 1:
                    print("  first bad step:", rec["t"], "got state",
                          env.state, "want", rec["state"],
                          "rew", {a: f64_hex(rew[a]) for a in agents}, "want", rec["reward"])
    check(f"{name}.steps({len(want['steps'])})", steps_bad == 0,
          f"{steps_bad} mismatching steps")


def random_policy(n_states, n_actions, seed):
    rng = np.random.RandomState(seed)
    return {s: int(rng.randint(0, n_actions)) for s in range(n_states)}


def compare_policy_eval(name):
    """Closed-loop device rollout vs the reference main()-style eval
    fixture: per-step stream digest + episode rewards/lengths."""
    import jax
    import jax.numpy as jnp
    from gym_soccer_tpu.config import EnvConfig
    from gym_soccer_tpu.core import parity  # noqa: F811

    fx = GOLD[name]
    cfg = EnvConfig(width=5, height=4, slip_prob=0.2)
    if "policy_b" in fx:  # joint multiagent fixture
        pt = parity.parity_tables(cfg)
        rows = parity.policy_rows(
            pt, np.asarray(fx["policy_a"], np.int32),
            np.asarray(fx["policy_b"], np.int32))
    else:  # VI policy vs frozen random B
        pol_b = np.asarray([random_policy(761, 5, 0)[s]
                            for s in range(761)], np.int32)
        pt = parity.parity_tables(cfg, "player_b", pol_b)
        rows = parity.policy_rows(pt, policy_a=np.asarray(fx["policy"],
                                                          np.int32))
    T = fx["total_steps"]
    hi, lo = parity.gen_streams([fx["reset_seed"]], 2 * T + 2)
    st = parity.parity_init(cfg, 1)
    _, out = jax.jit(lambda s: parity.parity_policy_rollout(
        cfg, pt, s, jnp.asarray(rows), T, jnp.asarray(hi),
        jnp.asarray(lo)))(st)
    obs = np.asarray(out.obs)[:, 0]
    rew = np.asarray(out.reward_a)[:, 0]
    done = np.asarray(out.done)[:, 0]
    trunc = np.asarray(out.truncated)[:, 0]
    h = hashlib.sha256()
    for t in range(T):
        h.update(int(obs[t]).to_bytes(4, "little"))
        h.update(np.float32(rew[t]).tobytes())
        h.update(b"\x01" if done[t] else b"\x00")
        h.update(b"\x01" if trunc[t] else b"\x00")
    check(f"{name}.step_stream_digest({T} steps, "
          f"{fx['n_episodes']} episodes)",
          h.hexdigest() == fx["step_stream_digest"])
    ends = np.flatnonzero(done | trunc)
    lengths = np.diff(np.concatenate([[-1], ends])).tolist()
    check(f"{name}.episode_lengths", lengths == fx["episode_lengths"])


def main():
    both = ["player_a", "player_b"]
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2)
    compare_tables("tables_5x4_slip02_multi", env)
    compare_traj("traj_5x4_slip02_multi_seed123", env, both)
    compare_traj("traj_5x4_slip02_multi_seed0", env, both)

    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.0)
    compare_tables("tables_5x4_slip00_multi", env)
    compare_traj("traj_5x4_slip00_multi_seed5", env, both)

    env = SoccerSimultaneousEnv(width=7, height=5, slip_prob=0.3)
    compare_tables("tables_7x5_slip03_multi", env)
    compare_traj("traj_7x5_slip03_multi_seed42", env, both)

    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2,
                                player_b_policy=random_policy(761, 5, 0))
    compare_tables("tables_5x4_slip02_singleA", env)
    compare_traj("traj_5x4_slip02_singleA_seed9", env, ["player_a"])

    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.2,
                                player_a_policy=random_policy(761, 5, 1))
    compare_tables("tables_5x4_slip02_singleB", env)
    compare_traj("traj_5x4_slip02_singleB_seed21", env, ["player_b"])

    compare_policy_eval("policy_eval_5x4_slip02_vi_vs_randomB")
    compare_policy_eval("policy_eval_5x4_slip02_joint")

    print("FAILURES:", FAIL)
    sys.exit(1 if FAIL else 0)


if __name__ == "__main__":
    main()

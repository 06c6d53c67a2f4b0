"""Capture the reference's render() output byte-for-byte for a set of
states/modes (executed against the gym stub).  Run: python tools/gen_render_golden.py"""
import io
import json
import os
import sys
from contextlib import redirect_stdout

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # repo root (refstub's
# gym.spaces re-exports gym_soccer_tpu's space classes)
sys.path.insert(0, os.path.join(HERE, "refstub"))
sys.path.insert(0, "/root/reference")

from gym_soccer.envs.soccer_simultaneous_env import SoccerSimultaneousEnv  # noqa: E402

CASES = [
    # (state, lastaction or None)
    ((2, 2, 1, 4, 0), None),
    ((1, 2, 2, 4, 1), {"player_a": 3, "player_b": 4}),
    ((1, 6, 3, 1, 0), {"player_a": 3, "player_b": 0}),   # A scored
    ((2, 0, 3, 4, 0), {"player_a": 4, "player_b": 0}),   # A own goal
    ((1, 3, 2, 0, 1), {"player_a": 0, "player_b": 4}),   # B scored
    ((3, 3, 1, 6, 1), {"player_a": 0, "player_b": 3}),   # B own goal
    ((0, 1, 3, 5, 1), {"player_a": 1, "player_b": 2}),
]


def main():
    out = []
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.0)
    env.reset(seed=0)
    for state, lastaction in CASES:
        env.state = state
        env.lastaction = lastaction
        buf = io.StringIO()
        with redirect_stdout(buf):
            env.render()
        out.append({"state": list(state), "lastaction": lastaction,
                    "output": buf.getvalue()})
    path = os.path.join(os.path.dirname(HERE), "tests", "golden",
                        "render_golden.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()

"""Byte-for-byte render parity against output captured from the executed
reference (tools/gen_render_golden.py)."""
import io
import json
import os
from contextlib import redirect_stdout

import pytest

from gym_soccer_tpu.envs import SoccerSimultaneousEnv

with open(os.path.join(os.path.dirname(__file__), "golden",
                       "render_golden.json")) as f:
    CASES = json.load(f)


@pytest.mark.parametrize("case", CASES,
                         ids=[str(tuple(c["state"])) for c in CASES])
def test_render_bytes_match_reference(case):
    env = SoccerSimultaneousEnv(width=5, height=4, slip_prob=0.0)
    env.reset(seed=0)
    env.state = tuple(case["state"])
    env.lastaction = case["lastaction"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        env.render()
    assert buf.getvalue() == case["output"]

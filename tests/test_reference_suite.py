"""Drop-in proof: the REFERENCE repo's own unmodified pytest suite must
pass against this framework (via the tools/refcompat module shim).

Skipped when /root/reference is unavailable (e.g. public CI).  The one
deselected case is broken in the reference itself (see
tools/run_reference_tests.py).
"""
import os
import subprocess
import sys

import pytest

REF = os.path.join(os.environ.get("REFERENCE_PATH", "/root/reference"),
                   "gym_soccer", "tests")


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference repo not mounted")
def test_reference_suite_passes():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools",
                                      "run_reference_tests.py"), "-x"],
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]

"""Run the REFERENCE repo's own pytest suite against gym_soccer_tpu.

The compat shim (tools/refcompat) re-exports this framework's classes under
the reference's module names (`gym_soccer.envs`, `gym_soccer.utils.*`), and
the gym stub (tools/refstub) satisfies its `gym` imports, so the reference's
unmodified test files exercise OUR implementation — the strongest drop-in
compatibility proof available.

One deselection: test_multiple_consecutive_collisions is broken in the
reference itself (its 1000-step loop never resets, so the 100-step
truncation gate trips needs_reset at iteration 101 — it fails against the
reference's own env too; verified).

Run: python tools/run_reference_tests.py [extra pytest args]
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
# Override with REFERENCE_PATH for checkouts elsewhere (e.g. public CI
# clones the upstream repo into a temp dir).
REF_ROOT = os.environ.get("REFERENCE_PATH", "/root/reference")
REF_TESTS = os.path.join(REF_ROOT, "gym_soccer", "tests")

def main():
    if not os.path.isdir(REF_TESTS):
        print(f"reference tests not found at {REF_TESTS}; set "
              "REFERENCE_PATH to a checkout of the upstream repo",
              file=sys.stderr)
        raise SystemExit(2)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.join(HERE, "refcompat"), os.path.join(HERE, "refstub"),
         REPO] + [env.get("PYTHONPATH", "")])
    cmd = [sys.executable, "-m", "pytest", REF_TESTS, "-q",
           "-p", "no:cacheprovider",
           "-k", "not test_multiple_consecutive_collisions"]
    cmd += sys.argv[1:]
    raise SystemExit(subprocess.call(cmd, env=env, cwd="/tmp"))


if __name__ == "__main__":
    main()

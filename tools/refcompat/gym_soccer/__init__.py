# Compatibility shim: presents gym_soccer_tpu under the reference's
# package name so the REFERENCE's own test suite can run unmodified
# against this framework (tools/run_reference_tests.py).

"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the sharding /
multi-chip paths are exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; bench.py uses the real chip).

NOTE: this environment's sitecustomize registers the `axon` TPU plugin and
sets jax_platforms via jax.config, which overrides the JAX_PLATFORMS env
var — so we must override through jax.config as well, before any backend
initialization.
"""
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# GST_TEST_TPU=1 keeps the real backend for the TPU-gated slow tests
# (e.g. the minimax-Q equilibrium-convergence run in test_learner_kernel).
if not os.environ.get("GST_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

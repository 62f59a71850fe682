"""Test harness: force CPU with 8 virtual devices (multi-chip sharding tests
run on a fake mesh, per SURVEY.md section 4's testing plan) and float64."""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend and pins JAX_PLATFORMS=axon;
# jax.config wins over the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

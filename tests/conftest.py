"""Test harness: force an 8-device virtual CPU platform.

Must run before jax is imported anywhere: the reference project never had a
multi-device test story (SURVEY.md §4); here every test sees 8 XLA CPU
devices so sharding/collective code paths are exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize pre-imports jax with JAX_PLATFORMS=axon
# (the real TPU) before conftest runs, so the env var alone is too late —
# force the platform through the config API (backends are created lazily,
# so XLA_FLAGS above still takes effect).
jax.config.update("jax_platforms", "cpu")

# XLA:CPU may use reduced-precision (bf16) matmuls by default on AMX hosts;
# force true fp32 so numerical-oracle tests are meaningful.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture(scope="session")
def mesh8():
    from eegan_tpu.parallel.mesh import make_mesh

    return make_mesh("data:8")

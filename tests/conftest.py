"""Test configuration: run JAX on a virtual 8-device CPU mesh so pjit/sharding
tests work without TPU hardware (SURVEY.md section 4 test strategy)."""

import os

# force-override: the environment's sitecustomize registers the TPU backend
# and pins jax_platforms before conftest runs, so re-pin via jax.config
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:  # drop any backend already materialized by the site hook
    jax.extend.backend.clear_backends()
except Exception:
    pass

from osufusion_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

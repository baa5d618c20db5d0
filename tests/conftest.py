"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU analogue of the reference's threads-in-one-process federation
simulation (SURVEY.md §4.3): the same shard_map/pjit code that spans a TPU pod
runs here across 8 fake CPU devices.
"""
import os

# Force CPU: the image's sitecustomize registers the axon TPU plugin and
# overrides JAX_PLATFORMS, so the env var alone is not enough — the config
# update after import wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

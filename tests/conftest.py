"""Test configuration: run everything on a virtual 8-device CPU mesh.

The standard JAX way to test pjit/shard_map without a TPU pod
(SURVEY.md section 4, implication 5). The environment's axon/TPU boot shim
imports jax at interpreter startup with JAX_PLATFORMS=axon, so an env-var
default is not enough — we must override the live config before any backend
is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

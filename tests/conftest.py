"""Test configuration: run everything on an 8-device virtual CPU mesh.

Note: importing pytest already imports jax in this environment (a site
plugin), so env vars alone are too late — use jax.config.update, which works
any time before backend initialization. The shell also exports
JAX_PLATFORMS=axon (TPU tunnel); tests must NOT run there.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on CPU, got {jax.default_backend()}")

"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-native answer to "test multi-device code without a cluster"
(SURVEY.md §4): XLA's host platform is forced to expose 8 devices so the
sharding/pjit paths execute real collectives, just on CPU.

Note: this box's sitecustomize imports jax (registering the axon TPU plugin)
before pytest starts, so the JAX_PLATFORMS env var is read too early —
``jax.config.update`` still works because no backend is initialized yet.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh, got "
        f"{jax.default_backend()}")
    assert len(jax.devices()) == 8, jax.devices()

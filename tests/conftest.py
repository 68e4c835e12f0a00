"""Test harness: force an 8-device virtual CPU platform.

This is the JAX analogue of the reference's gloo-on-one-box multi-process test
pattern (reference: distributed/rendezvous.py:54, sampler_ddp.py:12-20) — see
SURVEY.md §4.
"""

import os

# Set EDITOR_TPU_TEST_TPU=1 to run the suite against the real chip instead
# (only tests/test_pallas_tpu.py exercises TPU-only paths; most tests assert
# fp32 numerics and 8 devices, so the default stays the CPU platform).
_USE_TPU = os.environ.get("EDITOR_TPU_TEST_TPU") == "1"

if not _USE_TPU:
    # The ambient environment pins JAX_PLATFORMS=axon (the real TPU chip) and
    # a sitecustomize hook imports jax at interpreter startup — env vars set
    # here are too late, so force the platform through jax.config instead.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    assert len(jax.devices()) == 8, (
        "tests expect the virtual 8-device CPU platform; got "
        f"{jax.devices()}")

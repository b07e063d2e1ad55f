import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The test suite runs entirely on host CPU; pin the platform list so the
# remote-TPU (axon) backend is never initialised from tests.  This both
# keeps timings deterministic and survives relay outages: with the axon
# plugin registered, ANY backend discovery hangs forever when the relay
# is dead/wedged — even jax.devices('cpu') — unless jax_platforms is
# pinned via jax.config before the first device touch (measured: the
# JAX_PLATFORMS=cpu env var alone does NOT prevent the hang; only the
# config update does).  See eddie_wang_hackathon2023_tpu/axon_health.py.
if os.environ.get("EWT_TEST_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

# The CI/dev box routes the default backend to a remote TPU tunnel; tests run
# on host CPU (8 virtual devices for mesh/TP tests, mirroring how the
# reference could NOT test multi-GPU without hardware — see SURVEY.md §4).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")

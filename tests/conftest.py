import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The CI/dev box routes the default backend to a remote TPU tunnel; tests run
# on host CPU (8 virtual devices for mesh/TP tests, mirroring how the
# reference could NOT test multi-GPU without hardware — see SURVEY.md §4).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")

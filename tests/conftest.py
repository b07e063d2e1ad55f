import os
import socket

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402


def _tpu_tunnel_down() -> bool:
    """The dev box's remote-TPU relay (axon, 127.0.0.1:8103) can die;
    with the plugin registered, ANY backend discovery then hangs forever
    — even for CPU — unless the platform list is pinned before first
    device touch (jax.config beats the plugin's env override)."""
    s = socket.socket()
    s.settimeout(0.5)
    try:
        return s.connect_ex(("127.0.0.1", 8103)) != 0
    finally:
        s.close()


if os.environ.get("JAX_PLATFORMS") == "axon" and _tpu_tunnel_down():
    jax.config.update("jax_platforms", "cpu")

# The CI/dev box routes the default backend to a remote TPU tunnel; tests run
# on host CPU (8 virtual devices for mesh/TP tests, mirroring how the
# reference could NOT test multi-GPU without hardware — see SURVEY.md §4).
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")

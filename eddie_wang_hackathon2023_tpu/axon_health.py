"""Remote-TPU (axon relay) health detection.

The dev box reaches its one TPU chip through a loopback relay whose port
is NOT stable across reboots (observed 8103 in rounds 1-2, 48271 in
round 3).  Two failure modes matter:

* relay process dead -> no loopback listener; any jax backend discovery
  then hangs forever (the PJRT plugin dials and never times out), even
  for ``jax.devices('cpu')``, unless ``jax_platforms`` is pinned first.
* relay listening but the TPU behind it unreachable -> the TCP connect
  succeeds and discovery STILL hangs.  A port check alone is therefore
  only a cheap *negative* signal; the positive signal must be an actual
  ``jax.devices()`` round trip, run in a subprocess under a timeout so
  the caller can never be wedged.

Nothing here imports jax at module scope, so it is safe to consult
before the first device touch (the whole point).
"""
import json
import os
import socket
import subprocess
import sys
import time

# result cache so repeated checks (pytest session + bench + suite steps)
# don't pay the probe subprocess each time.  Positive results are trusted
# longer than negative ones so recovery is noticed quickly.
_CACHE_PATH = "/tmp/ewt_axon_probe.json"
_POSITIVE_TTL_S = 1800.0
_NEGATIVE_TTL_S = 120.0


def loopback_listener_ports():
    """LISTEN sockets bound to 127.0.0.1, parsed from /proc/net/tcp.

    The relay is the only loopback-only listener on this box (the
    process-api supervisor binds 0.0.0.0), so this finds the relay
    without hardcoding its port.
    """
    ports = set()
    try:
        with open("/proc/net/tcp") as f:
            next(f)  # header
            for line in f:
                parts = line.split()
                local, state = parts[1], parts[3]
                if state != "0A":  # LISTEN
                    continue
                addr, port = local.split(":")
                if addr == "0100007F":  # 127.0.0.1
                    ports.add(int(port, 16))
    except OSError:
        pass
    return ports


def relay_listening() -> bool:
    """Cheap negative check: is any plausible relay port accepting?

    ``EWT_AXON_PORT`` pins a known port; otherwise every loopback
    listener is tried (there is at most a handful on this box).
    """
    env_port = os.environ.get("EWT_AXON_PORT")
    candidates = [int(env_port)] if env_port else sorted(loopback_listener_ports())
    for port in candidates:
        s = socket.socket()
        s.settimeout(0.5)
        try:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return True
        finally:
            s.close()
    return False


def tpu_reachable(timeout: float = 180.0, use_cache: bool = True) -> bool:
    """Ground-truth probe: can a fresh process enumerate the axon backend
    and run one op within ``timeout`` seconds?

    Subprocess + timeout so a wedged relay can never hang the caller.
    """
    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return False  # no remote backend configured at all
    if not relay_listening():
        _cache_store(False)
        return False
    if use_cache:
        cached = _cache_load()
        if cached is not None:
            return cached
    code = (
        "import jax, jax.numpy as jnp;"
        "d = jax.devices();"
        "x = jnp.ones((8, 8), jnp.bfloat16);"
        "(x @ x).block_until_ready();"
        "print('AXON_OK', d[0].device_kind)"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=timeout)
        ok = r.returncode == 0 and "AXON_OK" in r.stdout
    except subprocess.TimeoutExpired:
        ok = False
    _cache_store(ok)
    return ok


def _cache_load():
    try:
        with open(_CACHE_PATH) as f:
            rec = json.load(f)
        ttl = _POSITIVE_TTL_S if rec["ok"] else _NEGATIVE_TTL_S
        if time.time() - rec["t"] < ttl:
            return bool(rec["ok"])
    except (OSError, ValueError, KeyError):
        pass
    return None


def _cache_store(ok: bool) -> None:
    try:
        with open(_CACHE_PATH, "w") as f:
            json.dump({"ok": bool(ok), "t": time.time()}, f)
    except OSError:
        pass


def pin_cpu_if_unreachable(probe_timeout: float = 180.0) -> bool:
    """Pin ``jax_platforms`` to cpu unless the TPU answers a live probe.

    Must run before the first device touch.  Returns True if the TPU is
    usable (left as default backend), False if pinned to cpu.

    The pin goes through ``jax.config`` even when the environment already
    says ``JAX_PLATFORMS=cpu``: with the axon plugin registered by
    sitecustomize, the env var alone does NOT stop backend discovery from
    dialling a wedged relay and hanging — only the config update does
    (measured on the 2026-08-18 outage).
    """
    if os.environ.get("JAX_PLATFORMS", "") == "axon" and \
            tpu_reachable(timeout=probe_timeout):
        return True
    import jax
    jax.config.update("jax_platforms", "cpu")
    return False


if __name__ == "__main__":
    # `python -m eddie_wang_hackathon2023_tpu.axon_health` -> rc 0 if the
    # TPU is reachable (used by shell suites as their gate)
    to = float(os.environ.get("EWT_AXON_PROBE_TIMEOUT", "180"))
    ok = tpu_reachable(timeout=to,
                       use_cache=os.environ.get("EWT_AXON_PROBE_FRESH") != "1")
    print(f"axon TPU reachable: {ok} "
          f"(loopback listeners: {sorted(loopback_listener_ports())})")
    sys.exit(0 if ok else 1)

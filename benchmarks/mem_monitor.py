#!/usr/bin/env python
"""Device-memory reporting (ref benchmarks/mem_monitor.py, which polls
nvidia-smi from a sidecar process).  TPU memory is per-process, so there is
no external poller: import :func:`snapshot` / :func:`report` inside the
workload, or run this file directly for a one-shot idle reading."""
import sys


def snapshot():
    """[(device, bytes_in_use, peak_bytes_in_use, bytes_limit)]"""
    import jax
    out = []
    for d in jax.devices():
        stats = d.memory_stats() or {}
        out.append((str(d), stats.get("bytes_in_use", 0),
                    stats.get("peak_bytes_in_use", 0),
                    stats.get("bytes_limit", 0)))
    return out


def report(file=sys.stderr) -> None:
    for dev, used, peak, limit in snapshot():
        print(f"[MEM] {dev} used {used / 2**20:.1f} MiB "
              f"peak {peak / 2**20:.1f} MiB limit {limit / 2**20:.1f} MiB",
              file=file)


if __name__ == "__main__":
    report(sys.stdout)

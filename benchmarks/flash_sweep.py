#!/usr/bin/env python
"""Sweep flash-attention block sizes for the encoder shape.

Times a chain of N data-dependent flash_mha calls inside ONE jit (the
output feeds the next call's query), so the wall time divided by N is a
trustworthy per-call number even through the axon tunnel (single device
program, no per-call round trips).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/flash_sweep.py [N_ITERS]
"""
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (1, 20, 1536, 64)          # whisper large-v2 encoder, pad-once
CONFIGS = [
    (512, 512, 512),               # current default
    (256, 512, 512),
    (768, 512, 512),
    (1536, 512, 512),
    (512, 1536, 512),
    (512, 1536, 768),
    (768, 1536, 768),
    (1536, 1536, 512),
    (256, 256, 256),
    (512, 256, 256),
]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(*SHAPE) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rs.randn(*SHAPE) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rs.randn(*SHAPE) * 0.1, jnp.bfloat16)

    from eddie_wang_hackathon2023_tpu.builder import enable_compile_cache
    enable_compile_cache()
    results = {}
    for cfg in CONFIGS:
        os.environ["EWT_FLASH_BLOCKS"] = ",".join(str(x) for x in cfg)
        from eddie_wang_hackathon2023_tpu.ops.flash_attention import flash_mha

        @jax.jit
        def chain(q, k, v):
            def step(h, _):
                o = flash_mha(h, k, v, causal=False)
                return o + 1e-6 * h, None          # data dependency
            h, _ = jax.lax.scan(step, q, None, length=n)
            return h

        try:
            out = jax.block_until_ready(chain(q, k, v))
        except Exception as e:  # noqa: BLE001 - report and move on
            print(f"{cfg}: FAILED {type(e).__name__}: {e}", file=sys.stderr)
            continue
        # wall clocks through the axon tunnel lie even for chained scans;
        # only the xplane device time is trustworthy
        tag = "_".join(str(x) for x in cfg)
        trace_dir = f"/tmp/ewt_flash_sweep_{tag}"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            out = chain(q + jnp.bfloat16(1e-4), k, v)
            jax.block_until_ready(out)
        from analyze_trace import device_total_ms
        per_call = device_total_ms(trace_dir)["_total"] / n
        results[cfg] = per_call
        print(f"{cfg}: {per_call:.3f} ms/call (device)", file=sys.stderr)

    best = min(results, key=results.get)
    print(f"best: {best} at {results[best]:.3f} ms "
          f"(default {results.get((512, 512, 512), float('nan')):.3f})",
          file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Plug a user-authored Pallas attention kernel into the framework
(the openai_triton custom-plugin example, TPU-native).

  python examples/custom_kernel/run.py --device cpu
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/examples/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default=None, choices=[None, "cpu", "tpu"])
    args = p.parse_args()
    import jax
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")   # pin BEFORE first device
        # touch: enumerating devices would initialise the axon TPU backend
        # too, which hangs forever when the relay is wedged
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import numpy as np
    from pallas_fmha import custom_flash_mha

    from eddie_wang_hackathon2023_tpu.functional import causal_bias
    from eddie_wang_hackathon2023_tpu.ops.attention import \
        multihead_attention
    from eddie_wang_hackathon2023_tpu.ops.flash_attention import \
        set_custom_mha

    # 1. numerics: custom kernel vs the framework's unfused XLA attention
    rs = np.random.RandomState(0)
    for causal in (False, True):
        q = jax.numpy.asarray(rs.randn(2, 4, 256, 64).astype(np.float32))
        k = jax.numpy.asarray(rs.randn(2, 4, 256, 64).astype(np.float32))
        v = jax.numpy.asarray(rs.randn(2, 4, 256, 64).astype(np.float32))
        got = custom_flash_mha(q, k, v, causal=causal, scale=0.125)
        bias = causal_bias(256, 256, jax.numpy.float32) if causal else None
        ref = multihead_attention(q, k, v, bias=bias, scale=0.125)
        err = float(jax.numpy.max(jax.numpy.abs(got - ref)))
        print(f"causal={causal}: max |custom - reference| = {err:.2e}")
        assert err < 1e-3

    # 2. install it framework-wide and run a real encoder through it
    from eddie_wang_hackathon2023_tpu.models.whisper import (WhisperEncoder,
                                                             whisper_config)
    config = whisper_config("tiny", dtype="float32")
    enc = WhisperEncoder(config)
    enc.random_init(jax.random.PRNGKey(0), scale=0.05)
    mel = jax.numpy.asarray(rs.randn(1, config.n_mels, 3000)
                            .astype(np.float32) * 0.1)
    params = enc.state_dict()
    baseline = jax.jit(enc.apply)(params, mel)
    set_custom_mha(custom_flash_mha)
    try:
        # fresh jit so the trace routes through the custom kernel
        custom = jax.jit(lambda p, m: enc.apply(p, m))(params, mel)
    finally:
        set_custom_mha(None)
    err = float(jax.numpy.max(jax.numpy.abs(
        custom.astype(jax.numpy.float32) -
        baseline.astype(jax.numpy.float32))))
    print(f"whisper-tiny encoder with custom kernel: max diff {err:.2e}")
    assert err < 2e-2
    print("custom kernel example OK")


if __name__ == "__main__":
    main()

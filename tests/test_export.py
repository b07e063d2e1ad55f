"""Program export / AOT compile (ref tests/test_export.py + the engine
serialize/deserialize path)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from eddie_wang_hackathon2023_tpu.export import (aot_compile, export_program,
                                                 load_program)


def test_export_roundtrip(tmp_path):
    def f(x, w):
        return jnp.tanh(x @ w) * 2.0

    x = np.random.RandomState(0).randn(3, 4).astype(np.float32)
    w = np.random.RandomState(1).randn(4, 5).astype(np.float32)
    path = os.path.join(tmp_path, "prog.stablehlo")
    blob = export_program(f, (x, w), path=path, platforms=("cpu",))
    assert os.path.exists(path) and len(blob) > 0
    g = load_program(path)
    np.testing.assert_allclose(np.asarray(g(x, w)), np.tanh(x @ w) * 2.0,
                               rtol=1e-6)
    g2 = load_program(blob)
    np.testing.assert_allclose(np.asarray(g2(x, w)), np.tanh(x @ w) * 2.0,
                               rtol=1e-6)


def test_export_whisper_decode_step(tmp_path):
    """The flagship hot path survives an export round-trip."""
    from eddie_wang_hackathon2023_tpu.models.whisper import (WhisperConfig,
                                                             WhisperDecoder)
    config = WhisperConfig(n_mels=80, n_vocab=100, n_audio_ctx=16,
                           n_audio_state=32, n_audio_head=4, n_audio_layer=2,
                           n_text_ctx=16, n_text_state=32, n_text_head=4,
                           n_text_layer=2, dtype="float32")
    dec = WhisperDecoder(config)
    dec.random_init(jax.random.PRNGKey(0), 0.05)
    params = dec.state_dict()
    cache = dec.new_kv_cache(1)
    cross = jnp.zeros((2, 1, 2, 4, 8, 16), jnp.float32)   # [L,B,2,H,D,S]
    tokens = jnp.asarray([[7]], jnp.int32)
    widx = jnp.asarray(3, jnp.int32)
    slen = jnp.full((1,), 4, jnp.int32)

    def step(params, tokens, cache, cross, widx, slen):
        return dec.apply(params, tokens, cache, cross, widx, slen)

    want_logits, want_cache = jax.jit(step)(params, tokens, cache, cross,
                                            widx, slen)
    blob = export_program(step, (params, tokens, cache, cross, widx, slen),
                          platforms=("cpu",))
    loaded = load_program(blob)
    got_logits, got_cache = loaded(params, tokens, cache, cross, widx, slen)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(want_logits), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cache),
                               np.asarray(want_cache), rtol=1e-5, atol=1e-5)


def test_aot_compile_executes():
    def f(x):
        return x * x + 1.0

    exe = aot_compile(f, (np.ones((8,), np.float32),))
    out = exe(np.full((8,), 3.0, np.float32))
    np.testing.assert_allclose(np.asarray(out), np.full((8,), 10.0))


def test_dump_hlo():
    from eddie_wang_hackathon2023_tpu.export import dump_hlo

    def f(x):
        return jnp.tanh(x) * 2.0

    text = dump_hlo(f, (np.ones((4,), np.float32),))
    assert "tanh" in text
    opt = dump_hlo(f, (np.ones((4,), np.float32),), optimized=True)
    assert len(opt) > 0

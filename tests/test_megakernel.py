"""Whole-decoder-layer megakernel vs the scanned XLA decode path.

The megakernel (ops/pallas_decoder_layer.py) must reproduce the existing
deferred-write decode step — logits AND the cache write — for every
cache-dtype recipe it claims.  CPU runs the kernel in interpret mode
(same numerics contract as the other Pallas kernels' tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eddie_wang_hackathon2023_tpu.models.whisper import (CrossAttnKV,
                                                         WhisperConfig,
                                                         WhisperDecoder)
from eddie_wang_hackathon2023_tpu.ops.pallas_decoder_layer import (
    pack_decoder_blobs)
from eddie_wang_hackathon2023_tpu.plugin import plugin_config
from eddie_wang_hackathon2023_tpu.quantization import QuantMode
from eddie_wang_hackathon2023_tpu.quantization.surgery import (
    weight_only_quantize_state)

CFG = WhisperConfig(n_mels=16, n_vocab=160, n_audio_ctx=160,
                    n_audio_state=256, n_audio_head=4, n_audio_layer=2,
                    n_text_ctx=160, n_text_state=256, n_text_head=4,
                    n_text_layer=3, dtype="float32")


def _decoder(quant_mode):
    dec = WhisperDecoder(CFG, quant_mode)
    dec.random_init(jax.random.PRNGKey(3), 0.05)
    sd = dec.state_dict()
    if quant_mode.has_int8_kv_cache():
        sd["blocks.attn.kv_orig_quant_scale"] = \
            np.full((CFG.n_text_layer, 1), 9.5, np.float32)
        sd["blocks.attn.kv_quant_orig_scale"] = \
            np.full((CFG.n_text_layer, 1), 1 / 9.5, np.float32)
    dec2 = WhisperDecoder(CFG, quant_mode)
    dec2, sd = weight_only_quantize_state(dec2, sd, quant_mode)
    dec2.load_state_dict(sd, strict=False)
    return dec2, sd


def _cross_kv(int8: bool):
    rs = np.random.RandomState(5)
    c = CFG
    kv = rs.randn(c.n_text_layer, 1, 2, c.n_text_head, c.head_dim,
                  c.n_audio_ctx).astype(np.float32) * 0.4
    if not int8:
        return jnp.asarray(kv)
    scales = np.abs(kv).reshape(c.n_text_layer, -1).max(1) / 127.0
    q = np.clip(np.round(kv / scales[:, None, None, None, None, None]),
                -127, 127).astype(np.int8)
    return (jnp.asarray(q), jnp.asarray(scales, jnp.float32))


def _pack(dec, sd):
    state = {k[len("blocks."):]: v for k, v in sd.items()
             if k.startswith("blocks.")}
    return pack_decoder_blobs(
        state, n_layer=CFG.n_text_layer, hidden=CFG.n_text_state,
        n_head=CFG.n_text_head, head_dim=CFG.head_dim,
        ffn=4 * CFG.n_text_state, with_cross=True)


@pytest.mark.parametrize("int8_kv,int8_cross", [(False, False),
                                                (True, True),
                                                (False, True)])
def test_megakernel_matches_scan_step(int8_kv, int8_cross):
    qm = QuantMode.use_weight_only()
    if int8_kv:
        qm = qm | QuantMode.INT8_KV_CACHE
    dec, sd = _decoder(qm)
    assert dec.megakernel_eligible()
    cross = _cross_kv(int8_cross)
    blobs = _pack(dec, sd)

    prompt = jnp.asarray([[3, 7, 11, 2, 9]], jnp.int32)
    plen = prompt.shape[1]
    cache = dec.new_kv_cache(1)
    logits_p, cache = dec(prompt, cache, cross, 0,
                          jnp.asarray([plen], jnp.int32))
    tok = jnp.argmax(logits_p[:, -1:], axis=-1).astype(jnp.int32)
    seqlen = jnp.asarray([plen + 1], jnp.int32)

    with plugin_config(decode_megakernel=False):
        ref_logits, ref_cache = dec(tok, cache, cross, plen, seqlen)
    with plugin_config(decode_megakernel=True):
        mk_logits, mk_cache = dec(tok, cache, cross, plen, seqlen,
                                  megakernel_blobs=blobs)

    np.testing.assert_allclose(np.asarray(mk_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-3)
    if int8_kv:
        # int8 cache writes must be bit-exact (same quantize formula)
        np.testing.assert_array_equal(np.asarray(mk_cache),
                                      np.asarray(ref_cache))
    else:
        np.testing.assert_allclose(np.asarray(mk_cache),
                                   np.asarray(ref_cache),
                                   rtol=2e-4, atol=2e-3)


def test_megakernel_multi_step_greedy_tokens():
    """Five greedy steps through the megakernel == five through the scan
    (token-exact; catches cross-step cache/state divergence)."""
    qm = QuantMode.use_weight_only()
    dec, sd = _decoder(qm)
    cross = _cross_kv(True)
    blobs = _pack(dec, sd)
    prompt = jnp.asarray([[3, 7, 11]], jnp.int32)
    plen = prompt.shape[1]

    def run(blobs_or_none, flag):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            cache = dec.new_kv_cache(1)
            logits, cache = dec(prompt, cache, cross, 0,
                                jnp.asarray([plen], jnp.int32))
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks = [int(tok[0, 0])]
            for i in range(5):
                seqlen = jnp.asarray([plen + 1 + i], jnp.int32)
                logits, cache = dec(tok, cache, cross, plen + i, seqlen,
                                    megakernel_blobs=blobs_or_none)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                toks.append(int(tok[0, 0]))
            return toks

    assert run(None, False) == run(blobs, True)


@pytest.mark.parametrize("int8_kv", [False, True])
def test_megakernel_tail_mode(int8_kv):
    """K-step deferred tail: three tail steps through the megakernel ==
    three through the scan path (logits close, tail bytes equal)."""
    from eddie_wang_hackathon2023_tpu.ops.attention import new_tail_kv
    qm = QuantMode.use_weight_only()
    if int8_kv:
        qm = qm | QuantMode.INT8_KV_CACHE
    dec, sd = _decoder(qm)
    cross = _cross_kv(True)
    blobs = _pack(dec, sd)
    prompt = jnp.asarray([[3, 7, 11, 2]], jnp.int32)
    plen = prompt.shape[1]

    def run(blobs_or_none, flag):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            cache = dec.new_kv_cache(1)
            logits, cache = dec(prompt, cache, cross, 0,
                                jnp.asarray([plen], jnp.int32))
            tail = new_tail_kv(cache, 4)
            tlen = jnp.asarray(0, jnp.int32)
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            outs = []
            for i in range(3):
                seqlen = jnp.asarray([plen + 1 + i], jnp.int32)
                logits, cache, tail = dec(
                    tok, cache, cross, plen + i, seqlen, kv_tail=tail,
                    tail_len=tlen, megakernel_blobs=blobs_or_none)
                tlen = tlen + 1
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                outs.append(np.asarray(logits))
            return outs, np.asarray(tail)

    ref, ref_tail = run(None, False)
    mk, mk_tail = run(blobs, True)
    for a, b in zip(mk, ref):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3)
    if int8_kv:
        np.testing.assert_array_equal(mk_tail, ref_tail)
    else:
        np.testing.assert_allclose(mk_tail, ref_tail, rtol=2e-4, atol=2e-3)


def test_megakernel_ineligible_falls_back():
    """int4 became megakernel-ELIGIBLE in round 5 (nibble-packed panels,
    VMEM unpack); a group size that does not divide d must still
    decline (the panel K axis carries whole groups)."""
    qm = QuantMode.use_weight_only(use_int4_weights=True)
    dec, _ = _decoder(qm)
    assert dec.megakernel_eligible()
    # NON-UNIFORM group resolution must decline: group 512 divides the
    # 1024-wide mlp2 in-features but not the 256-wide qkv (which falls
    # back to per-channel) -> mixed granularities across the block
    with plugin_config(int4_group_size=512):
        dec2, _ = _decoder(qm)
        assert dec2.blocks.mlp2.group_size == 512
        assert dec2.blocks.attn.qkv.group_size == 0
        assert not dec2.megakernel_eligible()


@pytest.mark.parametrize("int8_cross", [False, True])
def test_megakernel_float_matches_scan_step(int8_cross):
    """Plain-float (un-quantised) decoder through the megakernel: the
    packer transposes the head-major/N-major weights to K-major panels
    with unit scales (round 4)."""
    dec = WhisperDecoder(CFG)
    dec.random_init(jax.random.PRNGKey(3), 0.05)
    sd = dec.state_dict()
    assert dec.megakernel_eligible()
    cross = _cross_kv(int8_cross)
    blobs = _pack(dec, sd)
    assert blobs.wblob.dtype == jnp.float32

    prompt = jnp.asarray([[3, 7, 11, 2, 9]], jnp.int32)
    plen = prompt.shape[1]
    cache = dec.new_kv_cache(1)
    logits_p, cache = dec(prompt, cache, cross, 0,
                          jnp.asarray([plen], jnp.int32))
    tok = jnp.argmax(logits_p[:, -1:], axis=-1).astype(jnp.int32)
    seqlen = jnp.asarray([plen + 1], jnp.int32)

    with plugin_config(decode_megakernel=False):
        ref_logits, ref_cache = dec(tok, cache, cross, plen, seqlen)
    with plugin_config(decode_megakernel=True):
        mk_logits, mk_cache = dec(tok, cache, cross, plen, seqlen,
                                  megakernel_blobs=blobs)
    np.testing.assert_allclose(np.asarray(mk_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(mk_cache),
                               np.asarray(ref_cache),
                               rtol=2e-4, atol=2e-3)


def test_megakernel_float_multi_step_greedy_tokens():
    dec = WhisperDecoder(CFG)
    dec.random_init(jax.random.PRNGKey(7), 0.05)
    blobs = _pack(dec, dec.state_dict())
    cross = _cross_kv(False)
    prompt = jnp.asarray([[3, 7, 11]], jnp.int32)
    plen = prompt.shape[1]

    def run(blobs_or_none, flag):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            cache = dec.new_kv_cache(1)
            logits, cache = dec(prompt, cache, cross, 0,
                                jnp.asarray([plen], jnp.int32))
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks = [int(tok[0, 0])]
            for i in range(5):
                seqlen = jnp.asarray([plen + 1 + i], jnp.int32)
                logits, cache = dec(tok, cache, cross, plen + i, seqlen,
                                    megakernel_blobs=blobs_or_none)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                toks.append(int(tok[0, 0]))
            return toks

    assert run(None, False) == run(blobs, True)


def _gpt_model(act="gelu", quant=True):
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    cfg = DecoderConfig(vocab_size=160, hidden_size=256, num_layers=3,
                        num_heads=4, max_position_embeddings=96,
                        hidden_act=act, dtype="float32",
                        quant_mode=(QuantMode.use_weight_only() if quant
                                    else QuantMode(0)))
    model = DecoderLMHead(cfg)
    model.random_init(jax.random.PRNGKey(4), 0.05)
    sd = model.state_dict()
    if not quant:
        return model, sd
    model2 = DecoderLMHead(cfg)
    model2, sd = weight_only_quantize_state(model2, sd, cfg.quant_mode)
    model2.load_state_dict(sd, strict=False)
    return model2, sd


@pytest.mark.parametrize("act,quant", [("gelu", True), ("relu", True),
                                       ("gelu", False)])
def test_megakernel_gpt_decoder(act, quant):
    """The generic DecoderLMHead (GPT-2-class topology) through the
    megakernel == the scanned path, multi-step greedy token-exact
    (quant=False exercises the round-4 plain-float panel stream)."""
    model, sd = _gpt_model(act, quant)
    assert model.megakernel_eligible()
    blobs = model.megakernel_blobs(sd)
    prompt = jnp.asarray([[5, 9, 2, 14]], jnp.int32)
    plen = prompt.shape[1]

    def run(blobs_or_none, flag):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            cache = model.new_kv_cache(1, 64)
            logits, cache = model(prompt, cache, 0,
                                  jnp.asarray([plen], jnp.int32))
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks = [int(tok[0, 0])]
            for i in range(4):
                seqlen = jnp.asarray([plen + 1 + i], jnp.int32)
                logits, cache = model(tok, cache, plen + i, seqlen,
                                      megakernel_blobs=blobs_or_none)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                toks.append(int(tok[0, 0]))
            return toks, np.asarray(logits)

    ref_toks, ref_logits = run(None, False)
    mk_toks, mk_logits = run(blobs, True)
    assert mk_toks == ref_toks
    np.testing.assert_allclose(mk_logits, ref_logits, rtol=2e-4, atol=2e-3)


def test_megakernel_generation_session():
    """GenerationSession end-to-end with the megakernel == without
    (greedy, batch 1, left-padded prompt exercising attention_start)."""
    from eddie_wang_hackathon2023_tpu.runtime.generation import (
        GenerationSession, ModelConfig, SamplingConfig)
    model, sd = _gpt_model()
    mc = ModelConfig(vocab_size=160, num_layers=3, num_heads=4,
                     hidden_size=256, max_seq_len=96)
    ids = np.asarray([[5, 9, 2, 14, 7]], np.int32)
    lens = np.asarray([5], np.int32)

    outs = {}
    for flag in (False, True):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            sess = GenerationSession(mc, model, SamplingConfig())
            sess.setup(sd)
            out_ids, _, _ = sess.decode(ids, lens, max_new_tokens=6)
            outs[flag] = np.asarray(out_ids)
    np.testing.assert_array_equal(outs[True], outs[False])


def _family_model(quant=True, **cfg_kw):
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    kw = dict(vocab_size=160, hidden_size=256, num_layers=3, num_heads=4,
              max_position_embeddings=96, dtype="float32",
              quant_mode=(QuantMode.use_weight_only() if quant
                          else QuantMode(0)))
    kw.update(cfg_kw)
    cfg = DecoderConfig(**kw)
    model = DecoderLMHead(cfg)
    model.random_init(jax.random.PRNGKey(4), 0.05)
    sd = model.state_dict()
    if not quant:
        return model, sd
    model2 = DecoderLMHead(cfg)
    model2, sd = weight_only_quantize_state(model2, sd, cfg.quant_mode)
    model2.load_state_dict(sd, strict=False)
    return model2, sd


def _greedy_ab(model, sd, steps=4):
    """(scan tokens+logits, megakernel tokens+logits) multi-step greedy."""
    blobs = model.megakernel_blobs(sd)
    prompt = jnp.asarray([[5, 9, 2, 14]], jnp.int32)
    plen = prompt.shape[1]

    def run(blobs_or_none, flag):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            cache = model.new_kv_cache(1, 64)
            logits, cache = model(prompt, cache, 0,
                                  jnp.asarray([plen], jnp.int32))
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks = [int(tok[0, 0])]
            for i in range(steps):
                seqlen = jnp.asarray([plen + 1 + i], jnp.int32)
                logits, cache = model(tok, cache, plen + i, seqlen,
                                      megakernel_blobs=blobs_or_none)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                toks.append(int(tok[0, 0]))
            return toks, np.asarray(logits)

    return run(None, False), run(blobs, True)


@pytest.mark.parametrize("neox,pct", [(True, 1.0), (True, 0.5),
                                      (False, 1.0), (False, 0.25)])
def test_rope_matrix_matches_functional_rope(neox, pct):
    """row @ make_rope_matrix(pos) == functional.rope for both rotary
    styles and partial rotary_dim, for every head packed in a lane row."""
    from eddie_wang_hackathon2023_tpu.functional import rope
    from eddie_wang_hackathon2023_tpu.ops.pallas_decoder_layer import (
        make_rope_matrix)
    D, nsub, pos = 64, 2, 17
    rd = int(D * pct)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 1, nsub, D), jnp.float32)  # [b, seq, H, D]
    want = rope(x, jnp.asarray([[pos]]), 10000.0, rd, neox)
    r = make_rope_matrix(jnp.asarray(pos), D, rd, 10000.0, neox, nsub)
    got = (x.reshape(1, nsub * D) @ r).reshape(want.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("quant,int8_kv", [(True, False), (True, True),
                                           (False, False)])
def test_megakernel_llama_decoder(quant, int8_kv):
    """LLaMA-class topology through the megakernel: RoPE (neox), rmsnorm,
    SwiGLU gated MLP, no biases, and a non-multiple-of-d ffn (the packer
    zero-pads to the next multiple) — multi-step greedy token-exact vs
    the scanned path."""
    qm = QuantMode.use_weight_only() if quant else QuantMode(0)
    if int8_kv:
        qm = qm | QuantMode.INT8_KV_CACHE
    model, sd = _family_model(
        quant=quant, position_embedding="rope", norm="rmsnorm",
        norm_eps=1e-6, hidden_act="silu", gated_mlp=True,
        attn_bias=False, mlp_bias=False, tie_word_embeddings=False,
        ffn_hidden_size=640, quant_mode=qm)
    if int8_kv:
        sd["blocks.attention.kv_orig_quant_scale"] = \
            np.full((3, 1), 7.0, np.float32)
        sd["blocks.attention.kv_quant_orig_scale"] = \
            np.full((3, 1), 1 / 7.0, np.float32)
        model.load_state_dict(sd, strict=False)
    assert model.megakernel_eligible()
    (ref_toks, ref_logits), (mk_toks, mk_logits) = _greedy_ab(model, sd)
    assert mk_toks == ref_toks
    np.testing.assert_allclose(mk_logits, ref_logits, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("quant", [True, False])
def test_megakernel_gptj_decoder(quant):
    """GPT-J-class topology: parallel-attention residual (the MLP reads
    the same input LN; no post-LN), interleaved GPT-J rotary on half the
    head dim."""
    model, sd = _family_model(
        quant=quant, position_embedding="rope", rotary_pct=0.5,
        neox_rotary_style=False, parallel_attn=True, hidden_act="gelu",
        attn_bias=False, mlp_bias=True, tie_word_embeddings=False)
    assert model.megakernel_eligible()
    (ref_toks, ref_logits), (mk_toks, mk_logits) = _greedy_ab(model, sd)
    assert mk_toks == ref_toks
    np.testing.assert_allclose(mk_logits, ref_logits, rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("int8_kv,int8_cross", [(False, True),
                                                (True, True)])
def test_megakernel_batch_whisper(int8_kv, int8_cross):
    """batch>1 through the megakernel (round 4: per-batch scratch
    row-blocks, one cache panel per utterance): a batch-3 whisper decode
    step must match the scanned path row-for-row, with a DIFFERENT
    cross/self cache per row."""
    qm = QuantMode.use_weight_only()
    if int8_kv:
        qm = qm | QuantMode.INT8_KV_CACHE
    dec, sd = _decoder(qm)
    cross = _cross_kv(int8_cross)
    blobs = _pack(dec, sd)
    B = 3
    if isinstance(cross, tuple):
        cross = (jnp.concatenate([cross[0]] * B, axis=1)
                 + jnp.arange(B, dtype=jnp.int8)[None, :, None, None,
                                                 None, None],
                 cross[1])
    else:
        cross = jnp.concatenate(
            [cross * (1.0 + 0.1 * i) for i in range(B)], axis=1)

    prompt = jnp.asarray([[3, 7, 11, 2, 9],
                          [1, 5, 2, 8, 4],
                          [9, 9, 3, 1, 7]], jnp.int32)
    plen = prompt.shape[1]
    cache = dec.new_kv_cache(B)
    logits_p, cache = dec(prompt, cache, cross, 0,
                          jnp.asarray([plen] * B, jnp.int32))
    tok = jnp.argmax(logits_p[:, -1:], axis=-1).astype(jnp.int32)

    def run(blobs_or_none, flag, cache, tok):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            toks = [np.asarray(tok)[:, 0].tolist()]
            for i in range(3):
                seqlen = jnp.asarray([plen + 1 + i] * B, jnp.int32)
                logits, cache = dec(tok, cache, cross, plen + i, seqlen,
                                    megakernel_blobs=blobs_or_none)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                toks.append(np.asarray(tok)[:, 0].tolist())
            return toks, np.asarray(logits), np.asarray(cache)

    ref_toks, ref_logits, ref_cache = run(None, False, cache, tok)
    mk_toks, mk_logits, mk_cache = run(blobs, True, cache, tok)
    assert mk_toks == ref_toks
    np.testing.assert_allclose(mk_logits, ref_logits, rtol=2e-4, atol=2e-3)
    if int8_kv:
        np.testing.assert_array_equal(mk_cache, ref_cache)


def test_megakernel_batch_gpt_left_padded():
    """batch-2 GPT decode with PER-ROW attention_start (left padding)
    through the megakernel == the scanned path."""
    model, sd = _gpt_model()
    blobs = model.megakernel_blobs(sd)
    B, plen = 2, 5
    prompt = jnp.asarray([[0, 0, 5, 9, 2],       # left-padded, start=2
                          [5, 9, 2, 14, 7]], jnp.int32)
    start = jnp.asarray([2, 0], jnp.int32)

    def run(blobs_or_none, flag):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            cache = model.new_kv_cache(B, 64)
            logits, cache = model(prompt, cache, 0,
                                  jnp.asarray([plen] * B, jnp.int32),
                                  attention_start=start)
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks = [np.asarray(tok)[:, 0].tolist()]
            for i in range(3):
                seqlen = jnp.asarray([plen + 1 + i] * B, jnp.int32)
                logits, cache = model(tok, cache, plen + i, seqlen,
                                      attention_start=start,
                                      megakernel_blobs=blobs_or_none)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                toks.append(np.asarray(tok)[:, 0].tolist())
            return toks, np.asarray(logits)

    ref_toks, ref_logits = run(None, False)
    mk_toks, mk_logits = run(blobs, True)
    assert mk_toks == ref_toks
    np.testing.assert_allclose(mk_logits, ref_logits, rtol=2e-4, atol=2e-3)


def test_megakernel_batch_llama_per_row_rope():
    """batch-2 LLaMA-class decode with per-row left-padding: RoPE
    positions differ across rows, so the kernel consumes PER-ROW
    rotation matrices."""
    model, sd = _family_model(
        quant=True, position_embedding="rope", norm="rmsnorm",
        norm_eps=1e-6, hidden_act="silu", gated_mlp=True,
        attn_bias=False, mlp_bias=False, tie_word_embeddings=False,
        ffn_hidden_size=640)
    blobs = model.megakernel_blobs(sd)
    B, plen = 2, 5
    prompt = jnp.asarray([[0, 0, 0, 9, 2],       # start=3 -> pos differs
                          [5, 9, 2, 14, 7]], jnp.int32)
    start = jnp.asarray([3, 0], jnp.int32)

    def run(blobs_or_none, flag):
        with plugin_config(decode_megakernel=flag,
                           megakernel_max_batch=8):
            cache = model.new_kv_cache(B, 64)
            logits, cache = model(prompt, cache, 0,
                                  jnp.asarray([plen] * B, jnp.int32),
                                  attention_start=start)
            tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
            toks = [np.asarray(tok)[:, 0].tolist()]
            for i in range(3):
                seqlen = jnp.asarray([plen + 1 + i] * B, jnp.int32)
                logits, cache = model(tok, cache, plen + i, seqlen,
                                      attention_start=start,
                                      megakernel_blobs=blobs_or_none)
                tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                toks.append(np.asarray(tok)[:, 0].tolist())
            return toks, np.asarray(logits)

    ref_toks, ref_logits = run(None, False)
    mk_toks, mk_logits = run(blobs, True)
    assert mk_toks == ref_toks
    np.testing.assert_allclose(mk_logits, ref_logits, rtol=2e-4, atol=2e-3)


def test_megakernel_family_ineligibility():
    """MQA and ALiBi still decline the megakernel and take the scan."""
    mqa, _ = _family_model(quant=False, num_kv_heads=1)
    assert not mqa.megakernel_eligible()
    alibi, _ = _family_model(quant=True, position_embedding="alibi")
    assert not alibi.megakernel_eligible()


@pytest.mark.parametrize("int8_kv", [False, True])
def test_megakernel_manual_wstream_matches_pipeline(int8_kv):
    """The manual async-DMA weight stream (round 4: panels ride a
    circular VMEM buffer, decoupled from the stage grid) must be
    bit-identical to the BlockSpec pipeline — same panels, same compute
    order, only the transport differs."""
    from eddie_wang_hackathon2023_tpu.ops.pallas_decoder_layer import (
        fused_decoder_stack)
    qm = QuantMode.use_weight_only()
    if int8_kv:
        qm = qm | QuantMode.INT8_KV_CACHE
    dec, sd = _decoder(qm)
    cross = _cross_kv(True)
    blobs = _pack(dec, sd)
    c = CFG
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.randn(1, c.n_text_state) * 0.2, jnp.float32)
    cache = dec.new_kv_cache(1)
    # put some history in the cache so attention reads real panels
    hist = jnp.asarray(
        rs.randn(*((c.n_text_layer, 1, 2, c.n_text_head, c.head_dim, 7)))
        * (20.0 if int8_kv else 0.3), cache.dtype)
    cache = jax.lax.dynamic_update_slice(
        cache, hist, (0,) * 5 + (0,))
    seqlen = jnp.asarray([8], jnp.int32)
    kwargs = dict(scale=dec.blocks.attn.scale,
                  cross_cache=cross[0] if isinstance(cross, tuple) else cross,
                  cross_scale=cross[1] if isinstance(cross, tuple) else None,
                  head_dim=c.head_dim)
    hid_p, fresh_p = fused_decoder_stack(x, blobs, cache, seqlen,
                                         wstream="pipeline", **kwargs)
    hid_m, fresh_m = fused_decoder_stack(x, blobs, cache, seqlen,
                                         wstream="manual", **kwargs)
    np.testing.assert_array_equal(np.asarray(hid_m), np.asarray(hid_p))
    np.testing.assert_array_equal(np.asarray(fresh_m), np.asarray(fresh_p))


def test_manual_stream_ring_bounded_at_large_d():
    """ADVICE r4 (high): gated-MLP stacks make npan prime (13 at
    LLaMA-7B nf=3), and the old smallest-divisor ring would have been
    npan slots = 218 MB of int8 panels at d=4096.  The ring must stay
    within its VMEM budget for every realistic shape; slots are indexed
    by the global panel counter so nbuf need not divide npan."""
    from eddie_wang_hackathon2023_tpu.ops.pallas_decoder_layer import (
        _RING_BUDGET, _pick_nbuf)
    for d, npan, itemsize in [
            (4096, 13, 1),     # LLaMA-7B woq8 gated (nf=3 -> prime npan)
            (4096, 13, 2),     # LLaMA-7B bf16 (falls back before here,
                               # but the bound must still hold)
            (1280, 14, 1),     # whisper large-v2 woq8 (+cross)
            (2048, 13, 1),     # GPT-like gated
            (8192, 16, 1)]:    # 70B-class panels
        nbuf = _pick_nbuf(npan, d * d * itemsize)
        assert 2 <= nbuf <= npan
        assert nbuf * d * d * itemsize <= max(_RING_BUDGET,
                                              2 * d * d * itemsize), \
            (d, npan, itemsize, nbuf)


def test_manual_stream_prime_npan_token_exact():
    """Gated MLP with nf=3 gives npan = 4 + 3*3 = 13 (prime): the
    global-counter slot mapping must stay consistent across layer
    boundaries where the old c%nbuf mapping would corrupt panels."""
    import jax.numpy as jnp
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    cfg = DecoderConfig(vocab_size=96, hidden_size=128, num_layers=3,
                        num_heads=2, ffn_hidden_size=3 * 128,
                        position_embedding="rope", norm="rmsnorm",
                        hidden_act="silu", gated_mlp=True, attn_bias=False,
                        mlp_bias=False, tie_word_embeddings=True,
                        dtype="float32")
    model = DecoderLMHead(cfg)
    model.random_init(jax.random.PRNGKey(11), 0.05)
    blobs = model.megakernel_blobs(model.state_dict())
    assert blobs.wblob.shape[1] == 13          # prime panel count
    prompt = jnp.asarray([[5, 9, 2, 7]], jnp.int32)
    plen = prompt.shape[1]
    cache = model.new_kv_cache(1, 32)
    logits, cache = model(prompt, cache, 0,
                          jnp.asarray([plen], jnp.int32))
    tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
    seqlen = jnp.asarray([plen + 1], jnp.int32)
    with plugin_config(decode_megakernel=False):
        ref_logits, _ = model(tok, cache, plen, seqlen)
    with plugin_config(decode_megakernel=True):
        mk_logits, _ = model(tok, cache, plen, seqlen,
                             megakernel_blobs=blobs)
    np.testing.assert_allclose(np.asarray(mk_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-3)


@pytest.mark.parametrize("group", [0, 64])
def test_megakernel_int4_matches_scan_step(group):
    """int4 blocks through the megakernel (nibble-packed panels, VMEM
    unpack, per-out-channel OR group-wise scales) must match the scanned
    XLA int4 path — logits and cache write."""
    with plugin_config(int4_group_size=group):
        qm = QuantMode.use_weight_only(use_int4_weights=True)
        dec, sd = _decoder(qm)
        assert dec.megakernel_eligible()
        cross = _cross_kv(True)
        blobs = _pack(dec, sd)
        assert blobs.wblob.shape[2] == CFG.n_text_state // 2
        assert (blobs.gscale is not None) == bool(group)

        prompt = jnp.asarray([[3, 7, 11, 2, 9]], jnp.int32)
        plen = prompt.shape[1]
        cache = dec.new_kv_cache(1)
        logits_p, cache = dec(prompt, cache, cross, 0,
                              jnp.asarray([plen], jnp.int32))
        tok = jnp.argmax(logits_p[:, -1:], axis=-1).astype(jnp.int32)
        seqlen = jnp.asarray([plen + 1], jnp.int32)

        with plugin_config(decode_megakernel=False,
                           int4_group_size=group):
            ref_logits, ref_cache = dec(tok, cache, cross, plen, seqlen)
        with plugin_config(decode_megakernel=True,
                           int4_group_size=group):
            mk_logits, mk_cache = dec(tok, cache, cross, plen, seqlen,
                                      megakernel_blobs=blobs)
        np.testing.assert_allclose(np.asarray(mk_logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(mk_cache),
                                   np.asarray(ref_cache),
                                   rtol=2e-4, atol=2e-3)


def test_megakernel_int4_gated_decoder_tokens(monkeypatch):
    """int4 group-wise + gated MLP (LLaMA-class) multi-step greedy
    token parity megakernel vs scan.  Decoder-only int4 is gated OFF by
    default after its device A/B loss (LLaMA-1B 88 vs 233 tok/s — see
    woq_block_eligible allow_int4), so the gate is forced here to keep
    the kernel path itself exact."""
    import jax.numpy as jnp
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        weight_only_quantize_state)
    with plugin_config(int4_group_size=64):
        cfg = DecoderConfig(vocab_size=96, hidden_size=128, num_layers=2,
                            num_heads=2, ffn_hidden_size=3 * 128,
                            position_embedding="rope", norm="rmsnorm",
                            hidden_act="silu", gated_mlp=True,
                            attn_bias=False, mlp_bias=False,
                            dtype="float32",
                            quant_mode=QuantMode.use_weight_only(True))
        model = DecoderLMHead(cfg)
        model.random_init(jax.random.PRNGKey(7), 0.05)
        sd = model.state_dict()
        model2 = DecoderLMHead(cfg)
        model2, sd = weight_only_quantize_state(model2, sd, cfg.quant_mode)
        model2.load_state_dict(sd, strict=False)
        assert not model2.megakernel_eligible()   # int4 decoder: gated off
        from eddie_wang_hackathon2023_tpu.models.decoder import DecoderLMHead
        monkeypatch.setattr(DecoderLMHead, "megakernel_eligible",
                            lambda self: True)
        blobs = model2.megakernel_blobs(sd)

        def run(flag):
            with plugin_config(decode_megakernel=flag, int4_group_size=64):
                cache = model2.new_kv_cache(1, 32)
                prompt = jnp.asarray([[5, 9, 2]], jnp.int32)
                logits, cache = model2(prompt, cache, 0,
                                       jnp.asarray([3], jnp.int32))
                toks = []
                tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
                for i in range(3, 7):
                    toks.append(int(tok[0, 0]))
                    logits, cache = model2(
                        tok, cache, i, jnp.asarray([i + 1], jnp.int32),
                        megakernel_blobs=blobs if flag else None)
                    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
                return toks

        assert run(False) == run(True)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("kvh,heads", [(1, 2), (2, 4)])
def test_megakernel_mqa_gqa_matches_scan(quant, kvh, heads):
    """MQA/GQA megakernel (head_dim-128 families: SantaCoder/StarCoder/
    GQA-LLaMA): combined zero-padded kv panel + per-kv-group attention
    must match the scanned path — float and WOQ-int8, logits + cache."""
    import jax.numpy as jnp
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        weight_only_quantize_state)
    qm = QuantMode.use_weight_only() if quant else QuantMode(0)
    cfg = DecoderConfig(vocab_size=96, hidden_size=128 * heads,
                        num_layers=2, num_heads=heads, num_kv_heads=kvh,
                        ffn_hidden_size=2 * 128 * heads,
                        position_embedding="rope",
                        dtype="float32", quant_mode=qm)
    model = DecoderLMHead(cfg)
    model.random_init(jax.random.PRNGKey(5), 0.05)
    sd = model.state_dict()
    if quant:
        model2 = DecoderLMHead(cfg)
        model2, sd = weight_only_quantize_state(model2, sd, qm)
        model2.load_state_dict(sd, strict=False)
        model = model2
    assert model.megakernel_eligible()
    blobs = model.megakernel_blobs(sd)

    prompt = jnp.asarray([[5, 9, 2, 7]], jnp.int32)
    plen = prompt.shape[1]
    cache = model.new_kv_cache(1, 32)
    assert cache.shape[3] == kvh
    logits, cache = model(prompt, cache, 0, jnp.asarray([plen], jnp.int32))
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    seqlen = jnp.asarray([plen + 1], jnp.int32)
    with plugin_config(decode_megakernel=False):
        ref_logits, ref_cache = model(tok, cache, plen, seqlen)
    with plugin_config(decode_megakernel=True):
        mk_logits, mk_cache = model(tok, cache, plen, seqlen,
                                    megakernel_blobs=blobs)
    np.testing.assert_allclose(np.asarray(mk_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(mk_cache), np.asarray(ref_cache),
                               rtol=2e-4, atol=2e-3)


def test_megakernel_mqa_multistep_with_tail():
    """MQA megakernel across several steps with the K-step deferred tail
    (token-exact vs scan)."""
    import jax.numpy as jnp
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    cfg = DecoderConfig(vocab_size=96, hidden_size=256, num_layers=2,
                        num_heads=2, num_kv_heads=1,
                        ffn_hidden_size=512, position_embedding="learned",
                        dtype="float32")
    model = DecoderLMHead(cfg)
    model.random_init(jax.random.PRNGKey(9), 0.05)
    blobs = model.megakernel_blobs(model.state_dict())

    from eddie_wang_hackathon2023_tpu.ops.attention import (merge_tail_kv,
                                                            new_tail_kv)

    def run(flag):
        with plugin_config(decode_megakernel=flag):
            cache = model.new_kv_cache(1, 32)
            prompt = jnp.asarray([[5, 9, 2]], jnp.int32)
            logits, cache = model(prompt, cache, 0,
                                  jnp.asarray([3], jnp.int32))
            tail = new_tail_kv(cache, 4)
            toks = []
            tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            for i, step in enumerate(range(3, 7)):
                toks.append(int(tok[0, 0]))
                logits, _, tail = model(
                    tok, cache, step, jnp.asarray([step + 1], jnp.int32),
                    kv_tail=tail, tail_len=jnp.asarray(i, jnp.int32),
                    megakernel_blobs=blobs if flag else None)
                tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
            cache = merge_tail_kv(cache, tail, 3)
            return toks, np.asarray(cache)

    t0, c0 = run(False)
    t1, c1 = run(True)
    assert t0 == t1
    np.testing.assert_allclose(c1, c0, rtol=2e-4, atol=2e-3)


def test_megakernel_fp8_kv_matches_scan():
    """fp8-e4m3 KV cache through the megakernel (IEEE-saturating cast in
    store_fresh, scale-on-read) vs the scanned path: logits close, cache
    writes BIT-exact (same cast)."""
    import jax.numpy as jnp
    from eddie_wang_hackathon2023_tpu.models.decoder import (DecoderConfig,
                                                             DecoderLMHead)
    qm = QuantMode(0).set_fp8_kv_cache()
    cfg = DecoderConfig(vocab_size=96, hidden_size=128, num_layers=2,
                        num_heads=2, ffn_hidden_size=256,
                        position_embedding="learned", dtype="float32",
                        quant_mode=qm)
    model = DecoderLMHead(cfg)
    model.random_init(jax.random.PRNGKey(3), 0.05)
    sd = model.state_dict()
    sd["blocks.attention.kv_orig_quant_scale"] = \
        np.full((cfg.num_layers, 1), 4.0, np.float32)
    sd["blocks.attention.kv_quant_orig_scale"] = \
        np.full((cfg.num_layers, 1), 0.25, np.float32)
    model.load_state_dict(sd, strict=False)
    assert model.megakernel_eligible()
    blobs = model.megakernel_blobs(sd)

    prompt = jnp.asarray([[5, 9, 2, 7]], jnp.int32)
    plen = prompt.shape[1]
    cache = model.new_kv_cache(1, 32)
    assert cache.dtype == jnp.float8_e4m3fn
    logits, cache = model(prompt, cache, 0, jnp.asarray([plen], jnp.int32))
    tok = jnp.argmax(logits[:, -1:], -1).astype(jnp.int32)
    seqlen = jnp.asarray([plen + 1], jnp.int32)
    with plugin_config(decode_megakernel=False):
        ref_logits, ref_cache = model(tok, cache, plen, seqlen)
    with plugin_config(decode_megakernel=True):
        mk_logits, mk_cache = model(tok, cache, plen, seqlen,
                                    megakernel_blobs=blobs)
    np.testing.assert_allclose(np.asarray(mk_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(
        np.asarray(mk_cache).view(np.uint8),
        np.asarray(ref_cache).view(np.uint8))


def test_megakernel_deterministic_fallback_on_sharded_params():
    """A pspec-sharded (tp>1 mesh) model must deterministically take the
    scanned path: the megakernel is a single-core pallas_call the SPMD
    partitioner cannot split.  Asserts (a) the gate refuses to build
    blobs for sharded params, (b) replicated single-device params still
    build them, (c) sharded decode output matches unsharded."""
    import jax
    import jax.numpy as jnp
    import torch
    import transformers as T
    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    from eddie_wang_hackathon2023_tpu.ops.pallas_decoder_layer import (
        params_cross_device_sharded)
    from eddie_wang_hackathon2023_tpu.parallel import Mapping, shard_state
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)
    torch.manual_seed(0)
    cfg = T.GPT2Config(vocab_size=96, n_positions=64, n_embd=128, n_layer=2,
                       n_head=4)
    hf = T.GPT2LMHeadModel(cfg).eval()
    model, config = build_from_hf("gpt2", hf, dtype="float32")
    mc = ModelConfig(vocab_size=96, num_layers=2, num_heads=4,
                     hidden_size=128, max_seq_len=64)
    sc = SamplingConfig(end_id=95, pad_id=95)
    prompt = np.asarray([[5, 11, 17, 23]], np.int32)

    with plugin_config(decode_megakernel=True):
        a = GenerationSession(mc, model, sc)
        a.setup()
        assert a._mk_blobs is not None          # replicated: blobs built
        tu, lu, _ = a.decode(prompt, np.asarray([4]), max_new_tokens=8)

        mapping = Mapping(world_size=2, tp_size=2,
                          devices=jax.devices("cpu")[:2])
        sharded = shard_state(model.state_dict(), model.pspecs(),
                              mapping.mesh)
        assert params_cross_device_sharded(sharded)
        b = GenerationSession(mc, model, sc)
        b.setup(sharded)
        assert b._mk_blobs is None              # sharded: scanned path
        ts, ls, _ = b.decode(prompt, np.asarray([4]), max_new_tokens=8)
    np.testing.assert_array_equal(tu, ts)
    np.testing.assert_array_equal(lu, ls)


def test_megakernel_cross_chunk_override_token_exact(monkeypatch):
    """EWT_DECODE_CHUNK_CROSS regrids the cross-attention chunk stages
    (perf experiment knob; the 1536-wide device A/B lost and 512 stays
    the default) — any width must reproduce the scanned step exactly."""
    qm = QuantMode.use_weight_only() | QuantMode.INT8_KV_CACHE
    dec, sd = _decoder(qm)
    cross = _cross_kv(True)
    blobs = _pack(dec, sd)

    prompt = jnp.asarray([[3, 7, 11, 2, 9]], jnp.int32)
    plen = prompt.shape[1]
    cache = dec.new_kv_cache(1)
    logits_p, cache = dec(prompt, cache, cross, 0,
                          jnp.asarray([plen], jnp.int32))
    tok = jnp.argmax(logits_p[:, -1:], axis=-1).astype(jnp.int32)
    seqlen = jnp.asarray([plen + 1], jnp.int32)

    with plugin_config(decode_megakernel=False):
        ref_logits, ref_cache = dec(tok, cache, cross, plen, seqlen)

    # one 160-wide chunk (default grid: 2x128-padded) — single cross stage
    monkeypatch.setenv("EWT_DECODE_CHUNK_CROSS", str(CFG.n_audio_ctx))
    with plugin_config(decode_megakernel=True):
        mk_logits, mk_cache = dec(tok, cache, cross, plen, seqlen,
                                  megakernel_blobs=blobs)
    np.testing.assert_allclose(np.asarray(mk_logits),
                               np.asarray(ref_logits),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(mk_cache),
                                  np.asarray(ref_cache))

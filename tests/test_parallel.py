"""Tensor/data-parallel tests on a virtual CPU mesh.

The reference could only exercise TP with >= 2 physical GPUs under mpirun
(SURVEY.md §4: "nothing tests TP without ≥2 real GPUs").  Here the
8-virtual-device CPU mesh proves the sharded program computes the *same
numbers* as the single-device one — XLA inserts the collectives from the
PartitionSpecs declared by ColumnLinear/RowLinear/QKVLinear.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eddie_wang_hackathon2023_tpu.models.whisper import (
    CrossAttnKV, WhisperConfig, WhisperDecoder, WhisperEncoder)
from eddie_wang_hackathon2023_tpu.parallel import Mapping, shard_state

TINY = WhisperConfig(n_mels=8, n_vocab=100, n_audio_ctx=20, n_audio_state=32,
                     n_audio_head=4, n_audio_layer=2, n_text_ctx=24,
                     n_text_state=32, n_text_head=4, n_text_layer=2,
                     dtype="float32")


@pytest.fixture(scope="module")
def models():
    enc, dec, ckv = (WhisperEncoder(TINY), WhisperDecoder(TINY),
                     CrossAttnKV(TINY))
    enc.random_init(jax.random.PRNGKey(0), 0.05)
    dec.random_init(jax.random.PRNGKey(1), 0.05)
    ckv.random_init(jax.random.PRNGKey(2), 0.05)
    return enc, dec, ckv


def _single_device_golden(models):
    enc, dec, ckv = models
    rs = np.random.RandomState(0)
    mel = rs.randn(2, TINY.n_mels, TINY.n_audio_ctx * 2).astype(np.float32)
    tokens = np.array([[5, 17, 42], [3, 9, 27]], dtype=np.int32)
    xa = enc(jnp.asarray(mel))
    cross = ckv(xa)
    cache = dec.new_kv_cache(2)
    logits, cache = dec(jnp.asarray(tokens), cache, cross, 0,
                        jnp.array([3, 3]))
    step_logits, _ = dec(jnp.asarray([[7], [8]]), cache, cross, 3,
                         jnp.array([4, 4]))
    return mel, tokens, np.asarray(logits), np.asarray(step_logits)


@pytest.mark.parametrize("dp,tp", [(1, 4), (2, 4), (2, 2), (1, 2)])
def test_sharded_whisper_matches_single_device(models, cpu_devices, dp, tp):
    if len(cpu_devices) < dp * tp:
        pytest.skip("not enough virtual devices")
    enc, dec, ckv = models
    mel, tokens, ref_logits, ref_step = _single_device_golden(models)

    mapping = Mapping(world_size=dp * tp, dp_size=dp, tp_size=tp,
                      devices=cpu_devices)
    mesh = mapping.mesh
    enc_p = shard_state(enc.state_dict(), enc.pspecs(), mesh)
    dec_p = shard_state(dec.state_dict(), dec.pspecs(), mesh)
    ckv_p = shard_state(ckv.state_dict(), ckv.pspecs(), mesh)

    dp_sh = NamedSharding(mesh, P("dp"))
    mel_s = jax.device_put(mel, NamedSharding(mesh, P("dp", None, None)))
    tok_s = jax.device_put(tokens, NamedSharding(mesh, P("dp", None)))

    xa = jax.jit(lambda p, x: enc.apply(p, x))(enc_p, mel_s)
    cross = jax.jit(lambda p, x: ckv.apply(p, x))(ckv_p, xa)
    cache = jax.device_put(
        dec.new_kv_cache(2),
        NamedSharding(mesh, P(None, "dp", None, "tp", None, None)))

    @jax.jit
    def dstep(p, t, c, cr, w, s):
        return dec.apply(p, t, c, cr, w, s)

    logits, cache = dstep(dec_p, tok_s, cache, cross, 0,
                          jax.device_put(np.array([3, 3], np.int32), dp_sh))
    step_logits, _ = dstep(dec_p,
                           jax.device_put(np.array([[7], [8]], np.int32),
                                          NamedSharding(mesh, P("dp", None))),
                           cache, cross, 3,
                           jax.device_put(np.array([4, 4], np.int32), dp_sh))
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-3)
    np.testing.assert_allclose(np.asarray(step_logits), ref_step, atol=2e-3)


def test_vocab_padding_shards_and_matches(models, cpu_devices):
    """pad_vocab_size (ref T/_utils.py:194): with a tp-indivisible vocab
    (100 rows, tp=8), vocab_pad_multiple pads the embedding/lm-head to a
    shardable size; logits (sliced back in-model) must match the unpadded
    single-device model EXACTLY, and the table must actually shard."""
    import dataclasses
    if len(cpu_devices) < 8:
        pytest.skip("not enough virtual devices")
    _, dec, ckv = models
    cfg_pad = dataclasses.replace(TINY, vocab_pad_multiple=8)
    assert cfg_pad.padded_vocab == 104 and TINY.n_vocab == 100
    dec_pad = WhisperDecoder(cfg_pad)
    # same weights, vocab rows zero-padded
    state = dict(dec.state_dict())
    w = np.asarray(state["token_embedding.weight"])
    state["token_embedding.weight"] = np.concatenate(
        [w, np.zeros((4, w.shape[1]), w.dtype)], axis=0)
    dec_pad.load_state_dict(state)

    rs = np.random.RandomState(0)
    tokens = np.array([[5, 17, 42], [3, 9, 27]], dtype=np.int32)
    xa = jnp.asarray(rs.randn(2, TINY.n_audio_ctx,
                              TINY.n_audio_state).astype(np.float32) * 0.1)
    cross = ckv(xa)
    cache = dec.new_kv_cache(2)
    ref_logits, _ = dec(jnp.asarray(tokens), cache, cross, 0,
                        jnp.array([3, 3]))
    assert ref_logits.shape[-1] == 100

    mapping = Mapping(world_size=8, dp_size=1, tp_size=8,
                      devices=cpu_devices)
    mesh = mapping.mesh
    dec_p = shard_state(dec_pad.state_dict(), dec_pad.pspecs(), mesh)
    # the padded table must actually shard on tp (the whole point)
    emb_sharding = dec_p["token_embedding.weight"].sharding
    assert emb_sharding.spec[0] == "tp", emb_sharding
    # 4 heads don't divide tp=8 — replicate cache/cross; the vocab axis is
    # the sharding under test here
    cache_s = jax.device_put(dec_pad.new_kv_cache(2),
                             NamedSharding(mesh, P()))
    cross_s = jax.device_put(np.asarray(cross), NamedSharding(mesh, P()))
    logits, _ = jax.jit(lambda p, t, c, cr, w, s:
                        dec_pad.apply(p, t, c, cr, w, s))(
        dec_p, jnp.asarray(tokens), cache_s, cross_s, 0, jnp.array([3, 3]))
    assert logits.shape[-1] == 100
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               atol=2e-3)


def test_sharded_gpt_generation_matches(cpu_devices):
    """End-to-end sharded GenerationSession == single-device decode."""
    import torch
    import transformers as T
    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)
    torch.manual_seed(0)
    cfg = T.GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                       n_head=4)
    hf = T.GPT2LMHeadModel(cfg).eval()
    model, config = build_from_hf("gpt2", hf, dtype="float32")
    mc = ModelConfig(vocab_size=96, num_layers=2, num_heads=4, hidden_size=32,
                     max_seq_len=64)
    sess = GenerationSession(mc, model, SamplingConfig(end_id=95, pad_id=95))
    prompt = np.array([[5, 11, 17, 23], [2, 3, 4, 5]], dtype=np.int32)
    ref_tokens, ref_lens, _ = sess.decode(prompt, np.array([4, 4]),
                                          max_new_tokens=8)

    mapping = Mapping(world_size=4, tp_size=4, devices=cpu_devices[:4])
    sharded = shard_state(model.state_dict(), model.pspecs(), mapping.mesh)
    sess2 = GenerationSession(mc, model, SamplingConfig(end_id=95, pad_id=95))
    sess2.setup(sharded)
    got_tokens, got_lens, _ = sess2.decode(prompt, np.array([4, 4]),
                                           max_new_tokens=8)
    np.testing.assert_array_equal(ref_tokens, got_tokens)
    np.testing.assert_array_equal(ref_lens, got_lens)


def test_mapping_validation(cpu_devices):
    with pytest.raises(ValueError):
        Mapping(world_size=8, dp_size=3, tp_size=2, devices=cpu_devices)
    m = Mapping(world_size=8, dp_size=2, tp_size=4, devices=cpu_devices)
    assert m.mesh.shape == {"dp": 2, "tp": 4, "pp": 1}
    assert m.tp_group == list(range(8))


def test_sharded_woq_generation_matches(cpu_devices):
    """Weight-only-quantised model sharded on a tp=4 mesh must decode
    BIT-EXACTLY like the same quantised model on one device (the shipping
    configuration: quant x TP; ref per-rank WOQ engines, E/gpt/build.py:274)."""
    import torch
    import transformers as T
    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        weight_only_quantize_state)
    from eddie_wang_hackathon2023_tpu.runtime import (GenerationSession,
                                                      ModelConfig,
                                                      SamplingConfig)
    torch.manual_seed(1)
    cfg = T.GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                       n_head=4, initializer_range=0.2)
    hf = T.GPT2LMHeadModel(cfg).eval()
    model, config = build_from_hf("gpt2", hf, dtype="float32")
    qmode = QuantMode.use_weight_only(False)
    qmodel, qstate = weight_only_quantize_state(model, model.state_dict(),
                                                qmode)
    qmodel.load_state_dict(qstate, strict=False)
    mc = ModelConfig(vocab_size=96, num_layers=2, num_heads=4, hidden_size=32,
                     max_seq_len=64)
    prompt = np.array([[5, 11, 17, 23], [2, 3, 4, 5]], dtype=np.int32)
    sess = GenerationSession(mc, qmodel, SamplingConfig(end_id=95, pad_id=95))
    ref_tokens, ref_lens, _ = sess.decode(prompt, np.array([4, 4]),
                                          max_new_tokens=8)

    mapping = Mapping(world_size=4, tp_size=4, devices=cpu_devices[:4])
    pspecs = qmodel.pspecs()
    # int8 qweight tensors must actually be sharded, not replicated
    assert any("qweight" in k and any(ax is not None for ax in tuple(v))
               for k, v in pspecs.items()), pspecs
    sharded = shard_state(qmodel.state_dict(), pspecs, mapping.mesh)
    sess2 = GenerationSession(mc, qmodel, SamplingConfig(end_id=95, pad_id=95))
    sess2.setup(sharded)
    got_tokens, got_lens, _ = sess2.decode(prompt, np.array([4, 4]),
                                           max_new_tokens=8)
    np.testing.assert_array_equal(ref_tokens, got_tokens)
    np.testing.assert_array_equal(ref_lens, got_lens)


def test_sharded_continuous_batching_matches(cpu_devices):
    """Serving x TP — the production configuration: the continuous-batching
    manager driven with tp=4-sharded params must produce exactly the
    single-device manager's tokens (staggered admissions, slot reuse; the
    ref could only serve TP under mpirun with >= 2 physical GPUs)."""
    import torch
    import transformers as T
    from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
    from eddie_wang_hackathon2023_tpu.runtime.batch_manager import (
        ContinuousBatchingManager, InferenceRequest)
    from eddie_wang_hackathon2023_tpu.runtime.sampling import SamplingConfig
    torch.manual_seed(3)
    cfg = T.GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                       n_head=4, initializer_range=0.2)
    hf = T.GPT2LMHeadModel(cfg).eval()
    model, config = build_from_hf("gpt2", hf, dtype="float32")
    prompts = [[5, 11, 17, 23], [2, 3], [40, 41, 42, 43, 44], [7]]

    def run(params):
        results = {}
        q = [InferenceRequest(i, np.asarray(p, np.int32), max_new_tokens=8,
                              end_id=95) for i, p in enumerate(prompts)]
        mgr = ContinuousBatchingManager(
            model, SamplingConfig(end_id=95, pad_id=95), max_batch_size=2,
            max_seq_len=64, params=params,
            get_inference_requests=lambda n: [q.pop(0)] if q else [],
            send_response=lambda r: results.__setitem__(
                r.request_id, r.output_ids) if r.finished else None)
        mgr.run()
        return results

    single = run(model.state_dict())
    mapping = Mapping(world_size=4, tp_size=4, devices=cpu_devices[:4])
    sharded = shard_state(model.state_dict(), model.pspecs(), mapping.mesh)
    assert run(sharded) == single


def test_sharded_woq_whisper_decoder(models, cpu_devices):
    """Quantised Whisper decoder logits on a dp=2 x tp=2 mesh == single
    device (int8 qweight pspecs exercised on a real mesh)."""
    from eddie_wang_hackathon2023_tpu.quantization import QuantMode
    from eddie_wang_hackathon2023_tpu.quantization.surgery import (
        weight_only_quantize_state)
    from eddie_wang_hackathon2023_tpu.models.whisper import WhisperDecoder
    qmode = QuantMode.use_weight_only(False)
    dec = WhisperDecoder(TINY, qmode)
    base = WhisperDecoder(TINY)
    base.random_init(jax.random.PRNGKey(1), 0.05)
    dec, qstate = weight_only_quantize_state(base, base.state_dict(), qmode)
    dec.load_state_dict(qstate, strict=False)
    _, _, ckv = models
    rs = np.random.RandomState(3)
    xa = jnp.asarray(rs.randn(2, TINY.n_audio_ctx,
                              TINY.n_audio_state).astype(np.float32))
    cross = ckv(xa)
    tokens = np.array([[5, 17, 42], [3, 9, 27]], dtype=np.int32)
    cache = dec.new_kv_cache(2)
    ref, _ = dec(jnp.asarray(tokens), cache, cross, 0, jnp.array([3, 3]))
    mapping = Mapping(world_size=4, dp_size=2, tp_size=2,
                      devices=cpu_devices[:4])
    sharded = shard_state(dec.state_dict(), dec.pspecs(), mapping.mesh)
    got, _ = jax.jit(lambda p, t, c, cr, w, s: dec.apply(p, t, c, cr, w, s))(
        sharded, jnp.asarray(tokens), dec.new_kv_cache(2), cross, 0,
        jnp.array([3, 3]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)

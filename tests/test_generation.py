"""GenerationSession tests: greedy vs HF generate, sampling determinism,
beam search sanity, ragged batch — plus KV cache manager logic (mirrors
reference tests/test_kv_cache_manager.py:11-60)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from eddie_wang_hackathon2023_tpu.models.families import build_from_hf
from eddie_wang_hackathon2023_tpu.runtime import (BlocksManager,
                                                  GenerationSequence,
                                                  GenerationSession,
                                                  KVCacheManager, ModelConfig,
                                                  SamplingConfig)


@pytest.fixture(scope="module")
def gpt2():
    import transformers as T
    torch.manual_seed(0)
    cfg = T.GPT2Config(vocab_size=97, n_positions=96, n_embd=32, n_layer=2,
                       n_head=4)
    hf = T.GPT2LMHeadModel(cfg).eval()
    model, config = build_from_hf("gpt2", hf, dtype="float32")
    mc = ModelConfig(vocab_size=97, num_layers=2, num_heads=4, hidden_size=32,
                     max_seq_len=96)
    return hf, model, mc


def test_greedy_matches_hf_generate(gpt2):
    hf, model, mc = gpt2
    sess = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    prompt = np.array([[5, 11, 17, 23]], dtype=np.int32)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(prompt.astype(np.int64)),
                          max_new_tokens=12, do_sample=False,
                          pad_token_id=96).numpy()[0]
    tokens, lens, cum = sess.decode(prompt, np.array([4]), max_new_tokens=12)
    got = tokens[0, 0, :lens[0, 0]]
    np.testing.assert_array_equal(got[:len(ref)], ref)


def test_ragged_left_padded_batch(gpt2):
    hf, model, mc = gpt2
    sess = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    # row 0: [5 11 17 23], row 1: [41] left-padded
    prompts = np.array([[5, 11, 17, 23], [96, 96, 96, 41]], dtype=np.int32)
    lengths = np.array([4, 1])
    tokens, lens, _ = sess.decode(prompts, lengths, max_new_tokens=8)
    # row 1 must equal the unpadded single decode
    t1, l1, _ = sess.decode(np.array([[41]], dtype=np.int32), np.array([1]),
                            max_new_tokens=8)
    np.testing.assert_array_equal(tokens[1, 0, 4:lens[1, 0]],
                                  t1[0, 0, 1:l1[0, 0]])


def test_topk_sampling_deterministic_per_seed(gpt2):
    _, model, mc = gpt2
    sc = SamplingConfig(end_id=96, pad_id=96, top_k=5, temperature=0.8)
    sess = GenerationSession(mc, model, sc)
    prompt = np.array([[5, 11]], dtype=np.int32)
    t1, _, _ = sess.decode(prompt, np.array([2]), max_new_tokens=10, seed=7)
    t2, _, _ = sess.decode(prompt, np.array([2]), max_new_tokens=10, seed=7)
    t3, _, _ = sess.decode(prompt, np.array([2]), max_new_tokens=10, seed=8)
    np.testing.assert_array_equal(t1, t2)
    assert not np.array_equal(t1, t3)  # different seed, different path


def test_beam_search_beats_greedy_logprob(gpt2):
    _, model, mc = gpt2
    greedy = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    beam = GenerationSession(mc, model,
                             SamplingConfig(end_id=96, pad_id=96, num_beams=4,
                                            length_penalty=0.0))
    prompt = np.array([[5, 11, 17]], dtype=np.int32)
    tg, lg, cg = greedy.decode(prompt, np.array([3]), max_new_tokens=8)
    tb, lb, cb = beam.decode(prompt, np.array([3]), max_new_tokens=8)
    assert tb.shape == (1, 4, 11)
    # the best beam's cumulative logprob >= greedy's (beam explores a superset)
    assert cb.max() >= cg[0, 0] - 1e-4
    best, best_len = beam.best_sequences(tb, lb, cb)
    assert best.shape == (1, 11)


def test_repetition_penalty_reduces_repeats(gpt2):
    _, model, mc = gpt2
    plain = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    pen = GenerationSession(mc, model,
                            SamplingConfig(end_id=96, pad_id=96,
                                           repetition_penalty=5.0))
    prompt = np.array([[7, 7, 7]], dtype=np.int32)
    tp, lp_, _ = plain.decode(prompt, np.array([3]), max_new_tokens=16)
    tq, lq, _ = pen.decode(prompt, np.array([3]), max_new_tokens=16)

    def repeats(t, l):
        seq = t[0, 0, 3:l[0, 0]]
        return 0 if len(seq) == 0 else len(seq) - len(set(seq.tolist()))
    assert repeats(tq, lq) <= repeats(tp, lp_)


class TestKVCacheManager:
    """Mirrors reference tests/test_kv_cache_manager.py behaviours."""

    def test_block_refcount(self):
        from eddie_wang_hackathon2023_tpu.runtime import Block
        b = Block(3)
        b.add_link(); b.add_link()
        assert b.is_shared() and b.has_link()
        b.remove_link(); b.remove_link()
        assert not b.has_link()

    def test_alloc_free_cycle(self):
        bm = BlocksManager(num_blocks=4, block_size=8, beam_width=1)
        s0 = GenerationSequence(0, 0)
        bm.allocate(s0); bm.allocate(s0)
        assert bm.get_number_blocks(s0) == 2
        assert len(bm.free_blocks) == 2
        bm.free(s0)
        assert len(bm.free_blocks) == 4

    def test_pool_exhaustion(self):
        bm = BlocksManager(num_blocks=1, block_size=8)
        s = GenerationSequence(0, 0)
        bm.allocate(s)
        with pytest.raises(RuntimeError):
            bm.allocate(s)

    def test_beam_sharing_and_cow(self):
        bm = BlocksManager(num_blocks=8, block_size=8, beam_width=2)
        s = GenerationSequence(0, 0)
        bm.allocate(s, share_across_beam=True)
        assert len(bm.free_blocks) == 7  # one shared block
        arr = bm.get_block_index_array([s])
        assert arr.shape == (1, 2, 1)
        assert arr[0, 0, 0] == arr[0, 1, 0]
        bm.replace_shared_block(s, 0)
        arr = bm.get_block_index_array([s])
        assert arr[0, 0, 0] != arr[0, 1, 0]
        assert len(bm.free_blocks) == 8 - 2

    def test_manager_step_allocates_on_boundary(self):
        mgr = KVCacheManager(num_layers=2, num_blocks=16, tokens_per_block=4,
                             max_blocks_per_seq=4)
        seq = GenerationSequence(0, 0)
        mgr.add_sequence(seq, context_len=4)  # exactly one block
        assert mgr.blocks_manager.get_number_blocks(seq) == 1
        mgr.step([False])  # len 4 -> boundary -> new block
        assert mgr.blocks_manager.get_number_blocks(seq) == 2
        mgr.step([False]); mgr.step([False]); mgr.step([False])
        assert mgr.blocks_manager.get_number_blocks(seq) == 2
        mgr.step([False])  # len 8 -> boundary
        assert mgr.blocks_manager.get_number_blocks(seq) == 3
        idx = mgr.get_block_index_arrays()
        assert idx.shape == (1, 1, 4)
        assert (idx[0, 0, :3] >= 0).all() and idx[0, 0, 3] == -1
        mgr.stop(seq)
        assert len(mgr.blocks_manager.free_blocks) == 16


# -- per-request sampling / word bans / bucketing (round 2) ------------------

def test_bad_words_never_generated(gpt2):
    hf, model, mc = gpt2
    base = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    prompt = np.array([[5, 11, 17, 23]], dtype=np.int32)
    toks, lens, _ = base.decode(prompt, np.array([4]), max_new_tokens=12)
    banned = [int(toks[0, 0, 4 + i]) for i in range(3)]
    sc = SamplingConfig(end_id=96, pad_id=96,
                        bad_words_list=[[t] for t in banned])
    sess = GenerationSession(mc, model, sc)
    toks2, lens2, _ = sess.decode(prompt, np.array([4]), max_new_tokens=12)
    gen = toks2[0, 0, 4:lens2[0, 0]]
    assert not set(banned) & set(int(t) for t in gen)


def test_bad_words_multi_token_prefix(gpt2):
    """Multi-token ban: the banned adjacent pair never appears, while its
    first token alone remains allowed."""
    hf, model, mc = gpt2
    base = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    prompt = np.array([[5, 11, 17, 23]], dtype=np.int32)
    toks, lens, _ = base.decode(prompt, np.array([4]), max_new_tokens=12)
    seq = [int(t) for t in toks[0, 0, :lens[0, 0]]]
    sc = SamplingConfig(end_id=96, pad_id=96,
                        bad_words_list=[[seq[4], seq[5]]])
    sess = GenerationSession(mc, model, sc)
    toks2, lens2, _ = sess.decode(prompt, np.array([4]), max_new_tokens=12)
    seq2 = [int(t) for t in toks2[0, 0, :lens2[0, 0]]]
    assert seq2 != seq                                  # the ban did bite
    for a, b in zip(seq2, seq2[1:]):
        assert (a, b) != (seq[4], seq[5])


def test_stop_words_terminate(gpt2):
    """Decode ends exactly at the first occurrence of the stop pair."""
    hf, model, mc = gpt2
    base = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    prompt = np.array([[5, 11, 17, 23]], dtype=np.int32)
    toks, lens, _ = base.decode(prompt, np.array([4]), max_new_tokens=12)
    seq = [int(t) for t in toks[0, 0, :lens[0, 0]]]
    stop = [seq[6], seq[7]]
    sc = SamplingConfig(end_id=96, pad_id=96, stop_words_list=[stop])
    sess = GenerationSession(mc, model, sc)
    toks2, lens2, _ = sess.decode(prompt, np.array([4]), max_new_tokens=12)
    seq2 = [int(t) for t in toks2[0, 0, :]]
    # first position c >= first generated index where pair ends at c
    first = next(c for c in range(4, len(seq))
                 if seq[c - 1:c + 1] == stop)
    assert seq2[:first + 1] == seq[:first + 1]          # prefix unchanged
    assert all(t == 96 for t in seq2[first + 1:])       # then frozen


def test_per_request_temperature_row_equivalence(gpt2):
    """Row 0 greedy + row 1 sampled in one batch == separate decodes."""
    _, model, mc = gpt2
    prompts = np.array([[5, 11, 17, 23], [5, 11, 17, 23]], dtype=np.int32)
    sc = SamplingConfig(end_id=96, pad_id=96,
                        temperature=[0.0, 0.8], top_k=[1, 5])
    sess = GenerationSession(mc, model, sc)
    toks, lens, _ = sess.decode(prompts, np.array([4, 4]), max_new_tokens=8,
                                seed=3)
    solo = GenerationSession(mc, model, SamplingConfig(end_id=96, pad_id=96))
    ref, rlens, _ = solo.decode(prompts[:1], np.array([4]), max_new_tokens=8)
    np.testing.assert_array_equal(toks[0, 0, :lens[0, 0]],
                                  ref[0, 0, :rlens[0, 0]])


def test_sampling_value_change_does_not_recompile(gpt2):
    _, model, mc = gpt2
    sess = GenerationSession(mc, model,
                             SamplingConfig(end_id=96, pad_id=96,
                                            temperature=0.9, top_k=4))
    prompt = np.array([[5, 11, 17, 23]], dtype=np.int32)
    sess.decode(prompt, np.array([4]), max_new_tokens=8)
    n0 = sess._decode_fn._cache_size()
    sess.decode(prompt, np.array([4]),
                SamplingConfig(end_id=96, pad_id=96, temperature=0.5,
                               top_k=2), max_new_tokens=8)
    assert sess._decode_fn._cache_size() == n0     # same program reused


def test_prompt_bucketing_token_exact(gpt2):
    """Bucketed (padded) prompt must decode exactly like the unbucketed."""
    hf, model, mc = gpt2
    sc = SamplingConfig(end_id=96, pad_id=96)
    a = GenerationSession(mc, model, sc, bucket_prompts=True)
    b = GenerationSession(mc, model, sc, bucket_prompts=False)
    # length 5 buckets to 8
    prompt = np.array([[5, 11, 17, 23, 2]], dtype=np.int32)
    ta, la, _ = a.decode(prompt, np.array([5]), max_new_tokens=8)
    tb, lb, _ = b.decode(prompt, np.array([5]), max_new_tokens=8)
    assert ta.shape == tb.shape
    np.testing.assert_array_equal(ta[0, 0, :la[0, 0]], tb[0, 0, :lb[0, 0]])
    # two different raw lengths hit the same bucket -> one compile
    a.decode(np.array([[5, 11, 17]], dtype=np.int32), np.array([3]),
             max_new_tokens=8)
    a.decode(np.array([[5, 11, 17, 23, 2, 7]], dtype=np.int32),
             np.array([6]), max_new_tokens=8)


def test_beam_cache_indirection_matches_gather(gpt2):
    """cache_indirection beam mode (no per-step cache reorder) must produce
    exactly the same beams/scores as the gather mode."""
    hf, model, mc = gpt2
    sc = SamplingConfig(end_id=96, pad_id=96, num_beams=3)
    prompt = np.array([[5, 11, 17, 23], [2, 3, 4, 7]], dtype=np.int32)
    a = GenerationSession(mc, model, sc)
    tg, lg, cg = a.decode(prompt, np.array([4, 4]), max_new_tokens=10)
    b = GenerationSession(mc, model, sc, use_cache_indirection=True)
    ti, li, ci = b.decode(prompt, np.array([4, 4]), max_new_tokens=10)
    np.testing.assert_array_equal(tg, ti)
    np.testing.assert_array_equal(lg, li)
    np.testing.assert_allclose(cg, ci, rtol=1e-5)


def test_beam_pallas_kernel_matches_xla_path(gpt2):
    """End-to-end beam decode through the in-kernel cache_indirection
    (fused_decode_attention beam mode, interpret on CPU) must produce
    exactly the same beams/scores as the XLA masked cross-beam-score
    formulation — ragged prompts included (group-uniform start)."""
    from eddie_wang_hackathon2023_tpu.plugin import plugin_config
    hf, model, mc = gpt2
    sc = SamplingConfig(end_id=96, pad_id=96, num_beams=3)
    prompt = np.array([[96, 11, 17, 23], [2, 3, 4, 7]], dtype=np.int32)
    lens = np.array([3, 4])
    with plugin_config(pallas_decode=False):
        a = GenerationSession(mc, model, sc)
        tx, lx, cx = a.decode(prompt, lens, max_new_tokens=10)
    with plugin_config(pallas_decode=True):
        b = GenerationSession(mc, model, sc)
        tp, lp, cp = b.decode(prompt, lens, max_new_tokens=10)
    np.testing.assert_array_equal(tx, tp)
    np.testing.assert_array_equal(lx, lp)
    np.testing.assert_allclose(cx, cp, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("family,kvh", [("santacoder", 1), ("llama", 2)])
def test_mqa_gqa_pallas_decode_token_exact(family, kvh, monkeypatch):
    """MQA (SantaCoder) and GQA (LLaMA-2-70B-class) greedy decode through
    the grouped Pallas kernel — with the K-step tail enabled — must match
    the XLA path token-exactly."""
    import torch
    import transformers as T
    torch.manual_seed(1)
    if family == "santacoder":
        cfg = T.GPTBigCodeConfig(vocab_size=97, n_positions=96, n_embd=64,
                                 n_layer=2, n_head=4, multi_query=True)
        hf = T.GPTBigCodeForCausalLM(cfg).eval()
    else:
        cfg = T.LlamaConfig(vocab_size=97, hidden_size=64,
                            intermediate_size=172, num_hidden_layers=2,
                            num_attention_heads=4, num_key_value_heads=kvh,
                            max_position_embeddings=96)
        hf = T.LlamaForCausalLM(cfg).eval()
    model, config = build_from_hf(family, hf, dtype="float32")
    assert config.num_kv_heads == kvh
    mc = ModelConfig(vocab_size=97, num_layers=2, num_heads=4,
                     hidden_size=64, max_seq_len=96, num_kv_heads=kvh)
    sc = SamplingConfig(end_id=96, pad_id=96)
    prompt = np.array([[5, 11, 17, 23], [96, 2, 3, 7]], dtype=np.int32)
    lens = np.array([4, 3])
    monkeypatch.setenv("EWT_PALLAS_DECODE", "0")
    a = GenerationSession(mc, model, sc)
    tx, lx, _ = a.decode(prompt, lens, max_new_tokens=10)
    monkeypatch.setenv("EWT_PALLAS_DECODE", "1")
    monkeypatch.setenv("EWT_DECODE_TAIL", "4")   # exercise the tail path
    b = GenerationSession(mc, model, sc)
    tp, lp, _ = b.decode(prompt, lens, max_new_tokens=10)
    np.testing.assert_array_equal(tx, tp)
    np.testing.assert_array_equal(lx, lp)

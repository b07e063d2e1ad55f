"""Sampling-op unit tests vs independent references (ref tier: the CUDA
sampling kernel tests — samplingTopK/TopP/penalty kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from eddie_wang_hackathon2023_tpu.runtime.sampling import (
    apply_min_length, apply_presence_penalty, apply_repetition_penalty,
    apply_top_k, apply_top_p, beam_search_step, finalize_beams)


def test_top_k_matches_torch():
    rs = np.random.RandomState(0)
    logits = rs.randn(3, 50).astype(np.float32) * 2
    for k in (1, 5, 17):
        got = np.asarray(apply_top_k(jnp.asarray(logits), k))
        ref = logits.copy()
        kth = torch.topk(torch.from_numpy(logits), k).values[:, -1:].numpy()
        ref[logits < kth] = -np.inf
        np.testing.assert_array_equal(got, ref)
        assert ((got > -np.inf).sum(-1) == k).all()


def test_top_p_nucleus_property():
    rs = np.random.RandomState(1)
    logits = rs.randn(4, 40).astype(np.float32) * 3
    for p in (0.1, 0.5, 0.9):
        got = np.asarray(apply_top_p(jnp.asarray(logits), p))
        probs = torch.softmax(torch.from_numpy(logits), -1).numpy()
        for b in range(4):
            kept = got[b] > -np.inf
            kept_probs = np.sort(probs[b][kept])[::-1]
            # nucleus: kept mass >= p, and it is the SMALLEST such prefix
            assert kept_probs.sum() >= p - 1e-6
            if kept.sum() > 1:
                assert kept_probs[:-1].sum() < p
            # kept tokens are the top ones
            assert probs[b][kept].min() >= probs[b][~kept].max() - 1e-7


def test_repetition_penalty_ctrl_semantics():
    logits = jnp.asarray([[2.0, -1.0, 0.5, -3.0]])
    counts = jnp.asarray([[1, 2, 0, 1]], jnp.int32)
    got = np.asarray(apply_repetition_penalty(logits, counts, 2.0))[0]
    np.testing.assert_allclose(got, [1.0, -2.0, 0.5, -6.0])


def test_presence_penalty():
    logits = jnp.asarray([[1.0, 1.0, 1.0]])
    counts = jnp.asarray([[0, 3, 1]], jnp.int32)
    got = np.asarray(apply_presence_penalty(logits, counts, 0.5))[0]
    np.testing.assert_allclose(got, [1.0, 0.5, 0.5])


def test_min_length_blocks_eos():
    logits = jnp.zeros((2, 5))
    out = np.asarray(apply_min_length(logits, jnp.asarray([1, 9]), 3, 4))
    assert out[0, 4] == -np.inf          # too short: EOS banned
    assert out[1, 4] == 0.0              # long enough


def test_beam_search_step_picks_global_top():
    # 1 batch row, 2 beams, 4 vocab; construct known best continuations
    logprobs = jnp.asarray([[[np.log(0.7), np.log(0.1), np.log(0.1), np.log(0.1)],
                             [np.log(0.25)] * 4]])
    cum = jnp.asarray([[0.0, -0.1]])
    finished = jnp.zeros((1, 2), bool)
    parent, tok, new_cum, fin = beam_search_step(logprobs, cum, finished,
                                                 2, end_id=3,
                                                 length_penalty=1.0)
    # best: beam0+tok0 (0 + log .7); second: beam1 + any (-0.1 + log .25)
    # vs beam0+tok1 (log .1) = -2.3 -> beam1 wins
    assert int(parent[0, 0]) == 0 and int(tok[0, 0]) == 0
    assert int(parent[0, 1]) in (0, 1)
    assert float(new_cum[0, 0]) > float(new_cum[0, 1])


def test_finalize_beams_gnmt_length_penalty():
    """score = cum / ((5+len)/6)^alpha — longer beams win at equal density."""
    tokens = jnp.asarray([[[1, 2, 3, 0], [4, 5, 0, 0]]])
    cum = jnp.asarray([[-4.0, -3.0]])
    lens = jnp.asarray([[4, 2]])
    best_tokens, best = finalize_beams(tokens, cum, lens, 1.0)
    # -4/((5+4)/6) = -2.67 beats -3/((5+2)/6) = -2.57? no: -2.57 > -2.67
    assert int(best[0]) == 1
    np.testing.assert_array_equal(np.asarray(best_tokens)[0], [4, 5, 0, 0])
    # with a strong penalty favouring length, beam 0 overtakes
    _, best2 = finalize_beams(tokens, cum, lens, 5.0)
    assert int(best2[0]) == 0


# -- per-request params / ban & stop words (ref dynamicDecodeLayer.cpp:154,
# banBadWords.cu, stop-criteria kernels) ------------------------------------

def test_per_row_top_k():
    from eddie_wang_hackathon2023_tpu.runtime.sampling import apply_top_k
    logits = jnp.asarray(np.random.RandomState(0).randn(3, 20), jnp.float32)
    k = jnp.asarray([1, 5, 0], jnp.int32)          # 0 => unfiltered
    out = np.asarray(apply_top_k(logits, k, max_k=5))
    assert (out[0] > -np.inf).sum() == 1
    assert (out[1] > -np.inf).sum() == 5
    assert (out[2] > -np.inf).sum() == 20
    # per-row result matches the scalar kernel row-by-row
    ref1 = np.asarray(apply_top_k(logits[1:2], 5))
    np.testing.assert_allclose(out[1:2], ref1)


def test_per_row_top_p_matches_scalar():
    from eddie_wang_hackathon2023_tpu.runtime.sampling import apply_top_p
    logits = jnp.asarray(np.random.RandomState(1).randn(2, 30), jnp.float32)
    out = np.asarray(apply_top_p(logits, jnp.asarray([0.7, 0.0])))
    ref = np.asarray(apply_top_p(logits[0:1], 0.7))
    np.testing.assert_allclose(out[0:1], ref)
    np.testing.assert_allclose(out[1], np.asarray(logits[1]))  # disabled row


def test_ban_bad_words_prefix_semantics():
    """ref banBadWords.cu: ban word[-1] iff sequence ends with word[:-1]."""
    from eddie_wang_hackathon2023_tpu.runtime.sampling import (ban_bad_words,
                                                               pack_words)
    words, lens = pack_words([[7], [3, 4, 5]])
    v = 10
    # row 0 ends ... 3 4 -> ban 5 and always-ban 7; row 1 ends ... 4 3 -> only 7
    tokens = jnp.asarray([[1, 2, 3, 4, 0], [1, 2, 4, 3, 0]], jnp.int32)
    logits = jnp.zeros((2, v), jnp.float32)
    out = np.asarray(ban_bad_words(logits, tokens, jnp.asarray(4), words, lens))
    assert out[0, 5] == -np.inf and out[0, 7] == -np.inf
    assert out[1, 5] == 0.0 and out[1, 7] == -np.inf
    assert (out[0, :5] == 0).all() and out[0, 6] == 0


def test_ban_bad_words_prefix_does_not_fit():
    from eddie_wang_hackathon2023_tpu.runtime.sampling import (ban_bad_words,
                                                               pack_words)
    words, lens = pack_words([[3, 4, 5]])
    tokens = jnp.asarray([[3, 4, 0, 0]], jnp.int32)
    # cur=1: only one token of history, prefix [3,4] cannot fit
    out = np.asarray(ban_bad_words(jnp.zeros((1, 10)), tokens,
                                   jnp.asarray(1), words, lens))
    assert (out == 0).all()


def test_match_stop_words():
    from eddie_wang_hackathon2023_tpu.runtime.sampling import (
        match_stop_words, pack_words)
    words, lens = pack_words([[4, 5], [9]])
    tokens = jnp.asarray([[1, 4, 5, 0], [1, 2, 9, 0], [1, 4, 6, 0]],
                         jnp.int32)
    got = np.asarray(match_stop_words(tokens, jnp.asarray(2), words, lens))
    np.testing.assert_array_equal(got, [True, True, False])


def test_dynamic_decode_mixed_greedy_and_sampled_rows():
    from eddie_wang_hackathon2023_tpu.runtime.sampling import (DecodeParams,
                                                               SamplingConfig,
                                                               dynamic_decode)
    rs = np.random.RandomState(2)
    logits = jnp.asarray(rs.randn(4, 50) * 3, jnp.float32)
    sc = SamplingConfig(temperature=[0.0, 0.9, 0.0, 0.9],
                        top_k=[1, 8, 1, 8])
    p = DecodeParams.from_config(sc, 4)
    assert not p.greedy and p.max_top_k == 8
    tok, lp = dynamic_decode(logits, jax.random.PRNGKey(0), p)
    tok = np.asarray(tok)
    argmax = np.argmax(np.asarray(logits), axis=-1)
    assert tok[0] == argmax[0] and tok[2] == argmax[2]   # greedy rows
    # sampled rows stay within their top-k set
    for r in (1, 3):
        topk = set(np.argsort(np.asarray(logits[r]))[-8:])
        assert tok[r] in topk


def test_beam_online_length_penalty_changes_ranking():
    """With a strong length penalty the online ranking must differ from
    raw-logprob ranking when a short finished beam competes."""
    from eddie_wang_hackathon2023_tpu.runtime.sampling import beam_search_step
    v = 6
    logprobs = jnp.log(jax.nn.softmax(jnp.asarray(
        [[[3.0, 2.9, 0, 0, 0, -9], [0, 0, 0, 0, 0, -9]]]), axis=-1))
    cum = jnp.asarray([[-0.1, -4.0]])
    fin = jnp.zeros((1, 2), bool)
    p0 = beam_search_step(logprobs, cum, fin, 2, end_id=5,
                          length_penalty=1.0, cur_len=10)
    p2 = beam_search_step(logprobs, cum, fin, 2, end_id=5,
                          length_penalty=1.0)
    np.testing.assert_array_equal(np.asarray(p0[1]), np.asarray(p2[1]))
    # penalized selection still returns RAW cum scores for the chosen pair
    sel = beam_search_step(logprobs, cum, fin, 2, end_id=5,
                           length_penalty=2.0, cur_len=10)
    tot = np.asarray(cum)[0][:, None] + np.asarray(logprobs)[0]
    for bi in range(2):
        pa, to = int(np.asarray(sel[0])[0, bi]), int(np.asarray(sel[1])[0, bi])
        np.testing.assert_allclose(np.asarray(sel[2])[0, bi], tot[pa, to],
                                   rtol=1e-6)

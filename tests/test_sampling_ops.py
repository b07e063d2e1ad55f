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

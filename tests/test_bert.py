"""BERT vs HuggingFace golden (mirrors reference tests/model/test_bert.py)."""
import jax.numpy as jnp
import numpy as np
import torch

from eddie_wang_hackathon2023_tpu.models.bert import (BertConfig, BertModel,
                                                      from_hf_bert)


def _models():
    import transformers as T
    torch.manual_seed(0)
    hf_cfg = T.BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          max_position_embeddings=64, type_vocab_size=2,
                          hidden_act="gelu")
    hf = T.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = BertConfig(vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
                     intermediate_size=64, max_position_embeddings=64,
                     dtype="float32")
    model = BertModel(cfg)
    model.load_state_dict(from_hf_bert(hf.state_dict(), cfg))
    return hf, model


def test_bert_matches_hf():
    hf, model = _models()
    ids = np.array([[5, 9, 17, 23, 40, 2]], dtype=np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64))).last_hidden_state.numpy()
    got = np.asarray(model(jnp.asarray(ids)))
    # HF uses erf-gelu; ours maps "gelu" to tanh approx — compare loosely
    np.testing.assert_allclose(got, ref, atol=5e-3)


def test_bert_padding_mask():
    hf, model = _models()
    ids = np.array([[5, 9, 17, 0, 0, 0]], dtype=np.int32)
    att = np.array([[1, 1, 1, 0, 0, 0]])
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids.astype(np.int64)),
                 attention_mask=torch.from_numpy(att)).last_hidden_state.numpy()
    got = np.asarray(model(jnp.asarray(ids), input_lengths=jnp.array([3])))
    np.testing.assert_allclose(got[:, :3], ref[:, :3], atol=5e-3)

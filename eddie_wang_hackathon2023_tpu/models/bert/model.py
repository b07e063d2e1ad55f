"""BERT encoder family.

Counterpart of ``T/models/bert/model.py`` (BertEmbedding:12,
BertAttention:64, BertEncoderLayer:136, BertModel:187,
BertForQuestionAnswering:234).  Original-BERT post-LN topology, learned
position + token-type embeddings, padding-masked fused attention (the
reference's bert_attention plugin -> our flash/XLA attention with a length
bias), blocks scanned over stacked params.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...functional import ACT2FN
from ...layers import Attention, AttentionMaskType, Embedding, LayerNorm, Linear
from ...module import Module, stack_parameter_shapes
from ...ops.attention import length_mask_bias


@dataclasses.dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    hidden_act: str = "gelu"
    norm_eps: float = 1e-12
    pad_token_id: int = 0
    dtype: str = "bfloat16"


class BertEmbedding(Module):

    def __init__(self, c: BertConfig):
        super().__init__()
        self.word_embeddings = Embedding(c.vocab_size, c.hidden_size,
                                         dtype=c.dtype)
        self.position_embeddings = Embedding(c.max_position_embeddings,
                                             c.hidden_size, dtype=c.dtype)
        self.token_type_embeddings = Embedding(c.type_vocab_size,
                                               c.hidden_size, dtype=c.dtype)
        self.layer_norm = LayerNorm(c.hidden_size, eps=c.norm_eps,
                                    dtype=c.dtype)

    def forward(self, input_ids, position_ids=None, token_type_ids=None):
        b, l = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(
                jnp.arange(l, dtype=jnp.int32)[None, :], (b, l))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, l), jnp.int32)
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        return self.layer_norm(x)


class BertEncoderLayer(Module):
    """Post-LN: LN(attn(x) + x) then LN(mlp(.) + .) (original BERT)."""

    def __init__(self, c: BertConfig):
        super().__init__()
        self.attention = Attention(c.hidden_size, c.num_heads,
                                   c.max_position_embeddings, bias=True,
                                   dtype=c.dtype,
                                   attention_mask_type=AttentionMaskType.padding)
        self.input_layernorm = LayerNorm(c.hidden_size, eps=c.norm_eps,
                                         dtype=c.dtype)
        self.fc = Linear(c.hidden_size, c.intermediate_size, dtype=c.dtype)
        self.proj = Linear(c.intermediate_size, c.hidden_size, dtype=c.dtype)
        self.post_layernorm = LayerNorm(c.hidden_size, eps=c.norm_eps,
                                        dtype=c.dtype)
        self.hidden_act = c.hidden_act

    def forward(self, x, attention_mask=None):
        attn = self.attention(x, attention_mask=attention_mask)
        x = self.input_layernorm(x + attn)
        mlp = self.proj(ACT2FN[self.hidden_act](self.fc(x)))
        return self.post_layernorm(x + mlp)


class BertModel(Module):

    def __init__(self, config: BertConfig):
        super().__init__()
        self.config = config
        self.embedding = BertEmbedding(config)
        self.layers = stack_parameter_shapes(BertEncoderLayer(config),
                                             config.num_layers)

    def forward(self, input_ids, input_lengths=None, token_type_ids=None,
                position_ids=None):
        x = self.embedding(input_ids, position_ids, token_type_ids)
        mask = None
        if input_lengths is not None:
            mask = length_mask_bias(input_lengths, input_ids.shape[1])
        layer = self.layers
        stacked = layer.state_dict()

        def step(h, layer_params):
            return layer.apply(dict(layer_params), h,
                               attention_mask=mask), None

        x, _ = jax.lax.scan(step, x, stacked)
        return x


class BertForQuestionAnswering(Module):
    """ref model.py:234: BertModel + span head [hidden -> 2]."""

    def __init__(self, config: BertConfig, num_labels: int = 2):
        super().__init__()
        self.bert = BertModel(config)
        self.qa_outputs = Linear(config.hidden_size, num_labels,
                                 dtype=config.dtype)

    def forward(self, input_ids, input_lengths=None, token_type_ids=None):
        hidden = self.bert(input_ids, input_lengths, token_type_ids)
        return self.qa_outputs(hidden)  # [B, L, 2] start/end logits


def from_hf_bert(hf_sd, config: BertConfig):
    """transformers BertModel state dict -> ours (QKV fused head-major)."""
    def _np(t):
        return np.asarray(t.detach().cpu().float().numpy()
                          if hasattr(t, "detach") else t, np.float32)

    pre = "bert." if "bert.embeddings.word_embeddings.weight" in hf_sd else ""
    g = lambda k: _np(hf_sd[pre + k])
    h = config.num_heads
    hd = config.hidden_size // h
    state = {
        "embedding.word_embeddings.weight":
            g("embeddings.word_embeddings.weight"),
        "embedding.position_embeddings.weight":
            g("embeddings.position_embeddings.weight"),
        "embedding.token_type_embeddings.weight":
            g("embeddings.token_type_embeddings.weight"),
        "embedding.layer_norm.weight": g("embeddings.LayerNorm.weight"),
        "embedding.layer_norm.bias": g("embeddings.LayerNorm.bias"),
    }
    per_layer = []
    for i in range(config.num_layers):
        gg = lambda k: _np(hf_sd[f"{pre}encoder.layer.{i}.{k}"])
        wq = gg("attention.self.query.weight")
        wk = gg("attention.self.key.weight")
        wv = gg("attention.self.value.weight")
        d = config.hidden_size
        per_layer.append({
            "attention.qkv.weight": np.stack(
                [w.reshape(h, hd, d) for w in (wq, wk, wv)], axis=0),
            "attention.qkv.bias": np.stack(
                [gg(f"attention.self.{n}.bias").reshape(h, hd)
                 for n in ("query", "key", "value")], axis=0),
            "attention.dense.weight": gg("attention.output.dense.weight"),
            "attention.dense.bias": gg("attention.output.dense.bias"),
            "input_layernorm.weight": gg("attention.output.LayerNorm.weight"),
            "input_layernorm.bias": gg("attention.output.LayerNorm.bias"),
            "fc.weight": gg("intermediate.dense.weight"),
            "fc.bias": gg("intermediate.dense.bias"),
            "proj.weight": gg("output.dense.weight"),
            "proj.bias": gg("output.dense.bias"),
            "post_layernorm.weight": gg("output.LayerNorm.weight"),
            "post_layernorm.bias": gg("output.LayerNorm.bias"),
        })
    state.update({f"layers.{k}": np.stack([d[k] for d in per_layer], axis=0)
                  for k in per_layer[0]})
    return state

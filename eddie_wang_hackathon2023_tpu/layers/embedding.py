"""Embedding layers (ref ``tensorrt_llm/layers/embedding.py:8,38``).

The reference shards the vocab across TP ranks via the lookup plugin
(plugins/lookupPlugin); here the table is annotated P('tp', None) and XLA's
gather over a sharded operand performs the same distributed lookup.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..functional import embedding
from ..module import Module
from ..parameter import Parameter
from ..parallel.mapping import TP_AXIS


class Embedding(Module):

    def __init__(self, num_embeddings: int, embedding_dim: int, dtype=None,
                 tp_size: int = 1, tp_group=None, sharding_dim: int = 0):
        super().__init__()
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        pspec = P(TP_AXIS, None) if sharding_dim == 0 else P(None, TP_AXIS)
        self.weight = Parameter(shape=(num_embeddings, embedding_dim),
                                dtype=dtype, pspec=pspec)

    def forward(self, tokens):
        return embedding(tokens, self.weight.value)


class PromptTuningEmbedding(Embedding):
    """ref embedding.py:38 — ids >= vocab_size index a per-task prompt table.

    forward(tokens, prompt_embedding_table, tasks, task_vocab_size):
    regular ids gather from the vocab table, virtual ids (>= vocab_size)
    gather from the flattened [num_tasks * task_vocab_size, hidden] table.
    """

    def __init__(self, num_embeddings: int, embedding_dim: int,
                 vocab_size=None, dtype=None, tp_size: int = 1, tp_group=None):
        super().__init__(num_embeddings, embedding_dim, dtype, tp_size, tp_group)
        self.vocab_size = vocab_size if vocab_size is not None else num_embeddings

    def forward(self, tokens, prompt_embedding_table=None, tasks=None,
                task_vocab_size=None):
        if prompt_embedding_table is None:
            return super().forward(tokens)
        is_prompt = tokens >= self.vocab_size
        normal_ids = jnp.where(is_prompt, 0, tokens)
        prompt_ids = jnp.where(is_prompt, tokens - self.vocab_size, 0)
        if tasks is not None:
            prompt_ids = prompt_ids + tasks * task_vocab_size
        normal = embedding(normal_ids, self.weight.value)
        prompt = embedding(prompt_ids, prompt_embedding_table)
        return jnp.where(is_prompt[..., None], prompt, normal)

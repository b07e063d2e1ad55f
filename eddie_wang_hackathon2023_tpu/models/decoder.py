"""Generic decoder-only transformer LM.

The reference ships nine near-identical ~500-line model files
(``T/models/{gpt,llama,opt,bloom,gptj,gptneox,chatglm6b,...}/model.py``,
4628 LoC total) that differ only in position embedding, norm flavour, MLP
gating, residual topology and bias placement.  Here those degrees of
freedom are a :class:`DecoderConfig` and one scanned block implementation;
each family in ``models/families.py`` is a config constructor plus an HF
weight mapper.  Same capability surface, one implementation to optimise.

Forward contract (used by runtime/generation.py):
    logits, new_cache = model(tokens, kv_cache, write_index,
                              sequence_length, attention_start)
with the stacked in-place KV cache of models/whisper/model.py.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..functional import ACT2FN
from ..layers import (Attention, AttentionMaskType, Embedding, LayerNorm,
                      Linear, PositionEmbeddingType, RmsNorm)
from ..module import Module, stack_parameter_shapes
from ..parameter import Parameter
from ..quantization import QuantMode


@dataclasses.dataclass
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: Optional[int] = None          # != num_heads => MQA/GQA
    ffn_hidden_size: Optional[int] = None       # default 4*hidden
    max_position_embeddings: int = 2048
    position_embedding: str = "learned"         # learned | rope | alibi | glm_rope | none
    position_offset: int = 0                    # OPT's +2 quirk
    rotary_pct: float = 1.0
    rotary_base: float = 10000.0
    neox_rotary_style: bool = True              # False => GPT-J interleaved
    norm: str = "layernorm"                     # layernorm | rmsnorm
    norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    gated_mlp: bool = False
    attn_bias: bool = True
    mlp_bias: bool = True
    parallel_attn: bool = False                 # GPT-J/NeoX residual topology
    # ChatGLM-6B deepnorm-ish topology: residual input is ln(x)*alpha, not x
    # (ref T/models/chatglm6b/model.py:311-319 `hidden*7.484375 + out`);
    # None => standard residual.  ChatGLM uses (2*num_layers)**0.5.
    deepnorm_alpha: Optional[float] = None
    # ChatGLM: prompt tokens attend bidirectionally; generated tokens attend
    # to everything written so far (ref AttentionMaskType.bidirectional)
    bidirectional_context: bool = False
    embedding_norm: bool = False                # Bloom's LN after embedding
    final_norm: bool = True
    tie_word_embeddings: bool = True
    lm_head_bias: bool = False                  # GPT-J ties a bias onto it
    apply_query_key_layer_scaling: bool = False
    dtype: str = "bfloat16"
    quant_mode: QuantMode = QuantMode(0)
    # pad the vocab to a multiple (usually tp_size) so embedding/lm-head
    # shard instead of replicating (ref pad_vocab_size, T/_utils.py:194);
    # logits are sliced back to vocab_size before returning
    vocab_pad_multiple: int = 1

    def __post_init__(self):
        if self.num_kv_heads is None:
            self.num_kv_heads = self.num_heads
        if self.ffn_hidden_size is None:
            self.ffn_hidden_size = 4 * self.hidden_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def padded_vocab(self) -> int:
        from ..parallel.mapping import pad_vocab_size
        return pad_vocab_size(self.vocab_size, self.vocab_pad_multiple)


def _make_norm(config: DecoderConfig):
    if config.norm == "rmsnorm":
        return RmsNorm(config.hidden_size, eps=config.norm_eps,
                       dtype=config.dtype)
    return LayerNorm(config.hidden_size, eps=config.norm_eps,
                     dtype=config.dtype)


class DecoderBlock(Module):

    def __init__(self, config: DecoderConfig):
        super().__init__()
        c = config
        self.config = c
        pe = {"rope": PositionEmbeddingType.rope,
              "alibi": PositionEmbeddingType.alibi,
              "glm_rope": PositionEmbeddingType.glm_2d_rope}.get(
                  c.position_embedding, PositionEmbeddingType.learned_absolute)
        self.input_layernorm = _make_norm(c)
        self.attention = Attention(
            c.hidden_size, c.num_heads, c.max_position_embeddings,
            num_layers=c.num_layers,
            attention_mask_type=(AttentionMaskType.bidirectional
                                 if c.bidirectional_context
                                 else AttentionMaskType.causal),
            bias=c.attn_bias, dtype=c.dtype,
            position_embedding_type=pe,
            neox_rotary_style=c.neox_rotary_style,
            rotary_embedding_percentage=c.rotary_pct,
            rotary_base=c.rotary_base,
            apply_query_key_layer_scaling=c.apply_query_key_layer_scaling,
            use_int8_kv_cache=c.quant_mode.has_int8_kv_cache(),
            use_fp8_kv_cache=c.quant_mode.has_fp8_kv_cache(),
            num_kv_heads=c.num_kv_heads)
        if not c.parallel_attn or c.deepnorm_alpha is not None:
            self.post_layernorm = _make_norm(c)
        if c.gated_mlp:
            from ..layers import GatedMLP
            self.mlp = GatedMLP(c.hidden_size, c.ffn_hidden_size,
                                c.hidden_act, bias=c.mlp_bias, dtype=c.dtype)
        else:
            from ..layers import MLP
            self.mlp = MLP(c.hidden_size, c.ffn_hidden_size, c.hidden_act,
                           bias=c.mlp_bias, dtype=c.dtype)

    def forward(self, x, kv_cache, write_index, sequence_length,
                attention_start=None, position_ids=None,
                beam_indirection=None):
        normed = self.input_layernorm(x)
        attn_out, new_cache = self.attention(
            normed, past_key_value=kv_cache, sequence_length=sequence_length,
            cache_write_index=write_index, attention_start=attention_start,
            position_ids=position_ids, beam_indirection=beam_indirection,
            use_cache=True)
        if self.config.deepnorm_alpha is not None:
            alpha = self.config.deepnorm_alpha
            x = normed * alpha + attn_out
            normed2 = self.post_layernorm(x)
            x = normed2 * alpha + self.mlp(normed2)
        elif self.config.parallel_attn:
            # GPT-J/NeoX: mlp reads the same normed input; one residual add
            mlp_out = self.mlp(normed)
            x = x + attn_out + mlp_out
        else:
            x = x + attn_out
            x = x + self.mlp(self.post_layernorm(x))
        return x, new_cache


class DecoderLMHead(Module):
    """Embedding -> scanned blocks -> final norm -> LM head."""

    def __init__(self, config: DecoderConfig):
        super().__init__()
        c = config
        self.config = c
        self.vocab_embedding = Embedding(c.padded_vocab, c.hidden_size,
                                         dtype=c.dtype)
        if c.position_embedding == "learned":
            self.position_embedding = Embedding(
                c.max_position_embeddings + c.position_offset, c.hidden_size,
                dtype=c.dtype)
        if c.embedding_norm:
            self.ln_embed = _make_norm(c)
        self.blocks = stack_parameter_shapes(DecoderBlock(c), c.num_layers)
        if c.final_norm:
            self.ln_f = _make_norm(c)
        if not c.tie_word_embeddings:
            self.lm_head = Linear(c.hidden_size, c.padded_vocab,
                                  bias=c.lm_head_bias, dtype=c.dtype)

    def new_kv_cache(self, batch: int, max_len: Optional[int] = None):
        c = self.config
        max_len = max_len or c.max_position_embeddings
        per_layer = self.blocks.attention.new_kv_cache(batch, max_len)
        return jnp.zeros((c.num_layers,) + per_layer.shape, per_layer.dtype)

    def new_paged_pool(self, num_blocks: int, tokens_per_block: int):
        """Stacked block pool [L, N, 2, Hkv, T, D] for paged serving
        (ref paged_kv_cache mode, D/gpt_attention.md:168-200)."""
        from ..ops.paged_attention import new_block_pool
        c = self.config
        dtype = self.blocks.attention.new_kv_cache(1, 1).dtype
        return new_block_pool(num_blocks, c.num_kv_heads, tokens_per_block,
                              c.head_dim, dtype=dtype,
                              num_layers=c.num_layers)

    @property
    def needs_context_lengths(self) -> bool:
        """GLM's 2D positions depend on the original prompt length, which the
        runtime must thread through every decode step (the reference solves
        this with ChatGLM6BHeadModelGenerationSession._prepare_generation_inputs,
        T/runtime/generation.py:1021-1035)."""
        return self.config.position_embedding == "glm_rope"

    def megakernel_eligible(self) -> bool:
        """Static structure check for the whole-decoder-layer megakernel
        (ops/pallas_decoder_layer.py).  Round 4 widened the family
        coverage: pre-LN residual topology (GPT-2/OPT-class), RoPE
        (neox + GPT-J interleaved, partial rotary_dim), rmsnorm, gated
        MLPs and parallel-attn residuals (LLaMA/GPT-J/NeoX-class) —
        with uniformly WOQ-int8 per-out-channel weights OR uniformly
        plain float weights (bf16 panel stream with unit scales).
        ALiBi/GLM positions, MQA/GQA, deepnorm residuals and fp8 still
        take the scan."""
        from ..quantization.layers import (WeightOnlyQuantLinear,
                                           WeightOnlyQuantQKVLinear)
        c = self.config
        if c.position_embedding not in ("learned", "none", "rope"):
            return False
        if c.position_embedding == "rope" and \
                int(c.head_dim * c.rotary_pct) % 2:
            return False
        if c.deepnorm_alpha is not None or c.bidirectional_context:
            return False
        if c.norm not in ("layernorm", "rmsnorm"):
            return False
        if c.hidden_act not in ("gelu", "relu", "gelu_exact", "silu"):
            return False
        if c.num_kv_heads != c.num_heads:
            # MQA/GQA (round 5): needs head_dim 128 (one head per lane
            # row) — SantaCoder/StarCoder/GQA-LLaMA class
            if c.head_dim != 128 or c.num_heads % c.num_kv_heads:
                return False
        if c.hidden_size % 128 or 128 % c.head_dim:
            return False
        if c.hidden_size > 2048:
            # r5 device A/B: LLaMA-7B (d=4096) megakernel 21.6 vs 80.0
            # tok/s scanned; a ring-depth sweep (nbuf 2/3/4 via
            # EWT_MK_NBUF: 21.6/21.3/21.5) showed prefetch depth is NOT
            # the bottleneck, so the loss is structural at 16.7 MB
            # panels.  d<=2048 wins (GPT-350M 460, llama-1b 317 vs 311,
            # SantaCoder-1B 286 vs 271)
            return False
        b = self.blocks
        qkv = getattr(b.attention, "qkv", None)
        mods = [b.attention.dense, b.mlp.fc, b.mlp.proj]
        if c.gated_mlp:
            mods.append(b.mlp.gate)
        if isinstance(qkv, WeightOnlyQuantQKVLinear):
            from ..ops.pallas_decoder_layer import woq_block_eligible
            # allow_int4=False: the r5 device A/B measured the int4
            # megakernel LOSING on decoder-only stacks (gated LLaMA-1B
            # 88 vs 233 tok/s scanned) while winning on whisper - see
            # woq_block_eligible
            return woq_block_eligible(qkv, mods, c.hidden_size,
                                      allow_int4=False)
        # plain-float block (round 4): the kernel streams bf16 panels
        # with unit scales — QKVLinear (fused or separate-KV layout) +
        # Linear/RowLinear
        from ..layers.attention import QKVLinear
        from ..layers.linear import Linear, RowLinear
        if not isinstance(qkv, QKVLinear):
            return False
        for m in mods:
            if type(m) not in (Linear, RowLinear) \
                    or getattr(m, "tp_size", 1) != 1:
                return False
        return True

    def megakernel_blobs(self, params):
        """Pack the megakernel weight image from this model's state dict
        (run under jit once at session setup)."""
        from ..ops.pallas_decoder_layer import DECODER_KEYS, \
            pack_decoder_blobs
        c = self.config
        state = {k[len("blocks."):]: v for k, v in params.items()
                 if k.startswith("blocks.")}
        keys = dict(DECODER_KEYS)
        if c.parallel_attn:
            keys["ln"] = ("input_layernorm",)   # MLP shares the input LN
        return pack_decoder_blobs(
            state, n_layer=c.num_layers, hidden=c.hidden_size,
            n_head=c.num_heads, head_dim=c.head_dim,
            ffn=c.ffn_hidden_size, with_cross=False,
            gated=c.gated_mlp, n_kv_head=c.num_kv_heads, keys=keys)

    def forward(self, tokens, kv_cache, write_index, sequence_length,
                attention_start=None, context_lengths=None,
                beam_indirection=None, kv_tail=None,
                tail_len=None,
                megakernel_blobs=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens [B, L] int32 (left-padded prompts use attention_start);
        ``context_lengths`` [B]: true prompt lengths (glm_rope only);
        returns (logits [B, L, V] fp32, new stacked cache).

        ``kv_tail`` [Kmax,n_layer,B,2,H,hd] + ``tail_len`` (scalar int32,
        requires scalar write_index and no beam_indirection): K-step
        deferred-store decode — the cache is NOT written; returns
        (logits, kv_cache_unchanged, new_tail) and the caller merges once
        per Kmax steps (ops.attention merge_tail_kv)."""
        c = self.config
        b, l = tokens.shape
        x = self.vocab_embedding(tokens)
        # absolute cache positions of these tokens (write_index may be a
        # scalar or per-row [B] for continuous batching)
        if getattr(write_index, "ndim", 0) >= 1:
            abs_pos = write_index[:, None] + jnp.arange(l, dtype=jnp.int32)[None, :]
        else:
            abs_pos = write_index + jnp.arange(l, dtype=jnp.int32)[None, :]
        if attention_start is not None:
            position_ids = jnp.maximum(
                abs_pos - attention_start[:, None].astype(jnp.int32), 0)
        else:
            position_ids = jnp.broadcast_to(abs_pos, (b, l))
        if c.position_embedding == "glm_rope":
            # ChatGLM-6B 2D scheme (ref generation.py:1002-1035): within the
            # prompt pos0 counts up but the final [sop] token repeats the
            # [gMASK] position plen-2 with block-pos 1; generated token s
            # keeps pos0=plen-2 and block-pos s+2.  Both collapse to:
            #   pos0 = min(p, plen-2), pos1 = max(p-plen+2, 0)
            # with p the position inside the true (unpadded) sequence.
            assert context_lengths is not None, \
                "glm_rope needs context_lengths (true prompt lengths [B])"
            plen = context_lengths[:, None].astype(jnp.int32)
            pos0 = jnp.minimum(position_ids, plen - 2)
            pos1 = jnp.maximum(position_ids - plen + 2, 0)
            position_ids = jnp.stack([pos0, pos1], axis=1)     # [B, 2, L]
        if c.position_embedding == "learned":
            x = x + self.position_embedding(position_ids + c.position_offset)
        if c.embedding_norm:
            x = self.ln_embed(x)

        block = self.blocks
        stacked = block.state_dict()

        # full cache rides the layer scan; each layer writes only its fresh
        # token(s).  Single-token decode defers every layer's write into
        # one batched store after the scan (see ops.attention.
        # append_kv_stacked / write_fresh_kv for the profiling story).
        layer_ids = jnp.arange(c.num_layers, dtype=jnp.int32)
        from ..ops.paged_attention import PagedCacheState, PagedKV
        if isinstance(kv_cache, PagedCacheState):
            # block-paged serving path: the pool rides the scan; each layer
            # scatters its K/V through the block tables
            table = kv_cache.block_table

            def step2(carry, scanned):
                h, pool = carry
                layer_params, li = scanned
                h, pool = block.apply(
                    dict(layer_params), h,
                    kv_cache=PagedKV(pool, table, li),
                    write_index=write_index,
                    sequence_length=sequence_length,
                    attention_start=attention_start,
                    position_ids=position_ids,
                    beam_indirection=beam_indirection)
                return (h, pool), None

            (x, pool), _ = jax.lax.scan(step2, (x, kv_cache.pool),
                                        (stacked, layer_ids))
            new_kv = PagedCacheState(pool, table)
        elif l == 1 and c.position_embedding != "alibi":
            tail_mode = kv_tail is not None
            if tail_mode:
                assert beam_indirection is None and \
                    getattr(write_index, "ndim", 0) == 0
            from ..plugin import get_plugin_config
            if (megakernel_blobs is not None and tokens.shape[1] == 1
                    and tokens.shape[0]
                    <= get_plugin_config().get_megakernel_max_batch()
                    and getattr(write_index, "ndim", 0) == 0
                    and beam_indirection is None
                    and get_plugin_config().use_decode_megakernel()
                    and self.megakernel_eligible()):
                # whole-decoder-layer megakernel (see the whisper decoder
                # and ops/pallas_decoder_layer.py for the design record)
                from ..ops.attention import write_fresh_kv, write_tail_kv
                from ..ops.pallas_decoder_layer import (fused_decoder_stack,
                                                        make_rope_matrix)
                rope_mat = None
                if c.position_embedding == "rope":
                    # per-row rotation matrices — positions can differ
                    # across the batch under left-padding
                    rope_mat = jax.vmap(lambda p: make_rope_matrix(
                        p, c.head_dim,
                        block.attention.rotary_embedding_dim,
                        c.rotary_base, c.neox_rotary_style,
                        128 // c.head_dim))(position_ids[:, 0])
                # row-uniform length contract: the gate above requires a
                # scalar write_index, so every row is at the same length
                seq1 = jnp.asarray(sequence_length,
                                   jnp.int32).reshape(-1)[:1]
                hid, fresh = fused_decoder_stack(
                    x[:, 0, :], megakernel_blobs, kv_cache,
                    seq1, block.attention.scale,
                    start_index=attention_start,
                    tail_kv=((kv_tail, tail_len) if tail_mode else None),
                    head_dim=c.head_dim, eps=c.norm_eps, act=c.hidden_act,
                    norm=c.norm, gated=c.gated_mlp,
                    parallel=c.parallel_attn, rope_mat=rope_mat)
                if c.final_norm:
                    hid = self.ln_f(hid[:, None, :])
                else:
                    hid = hid[:, None, :]
                logits = self._logits(hid)
                if b == 1:      # fresh [L, 2, H, D] -> [L, B=1, 2, H, D]
                    fresh = fresh[:, None]
                if tail_mode:
                    new_tail = write_tail_kv(kv_tail, fresh, tail_len)
                    return logits, kv_cache, new_tail
                new_kv = write_fresh_kv(kv_cache, fresh[..., None],
                                        write_index)
                return logits, new_kv

            # hoist the out-proj qweight out of the scan xs for the fused
            # Pallas decode epilogue (stacked [L,K,N] bound whole; the
            # kernel index_map DMAs the layer panel — a scan-xs slice
            # costs a materialised per-layer HBM copy each step; see
            # models/whisper/model.py).  Beam indirection takes the XLA
            # gather path where self.dense needs the per-layer slice.
            hoisted = {}
            if beam_indirection is None and tokens.shape[0] == 1:
                # batch-1 only: see Attention._decode_proj_operands
                from ..plugin import get_plugin_config
                cfg = get_plugin_config()
                if cfg.use_pallas_decode() and cfg.use_fuse_decode_proj():
                    from ..layers.attention import proj_fusion_hoistable
                    if proj_fusion_hoistable(block.attention):
                        key = "attention.dense." + (
                            "qweight"
                            if getattr(block.attention.dense, "qweight",
                                       None) is not None else "weight")
                        if key in stacked:
                            hoisted[key] = stacked.pop(key)

            def step(h, scanned):
                layer_params, li = scanned
                params = dict(layer_params)
                params.update(hoisted)
                ca = ((kv_cache, li, "defer", kv_tail, tail_len)
                      if tail_mode else (kv_cache, li, "defer"))
                h, fresh = block.apply(
                    params, h, kv_cache=ca,
                    write_index=write_index,
                    sequence_length=sequence_length,
                    attention_start=attention_start,
                    position_ids=position_ids,
                    beam_indirection=beam_indirection)
                return h, fresh

            x, (k_new, v_new) = jax.lax.scan(step, x, (stacked, layer_ids))
            if tail_mode:
                from ..ops.attention import write_tail_kv
                kv_new = jnp.stack([k_new, v_new], axis=2)[..., 0]
                new_tail = write_tail_kv(kv_tail, kv_new, tail_len)
                if c.final_norm:
                    x = self.ln_f(x)
                return self._logits(x), kv_cache, new_tail
            from ..ops.attention import write_fresh_kv
            kv_new = jnp.stack([k_new, v_new], axis=2)
            new_kv = write_fresh_kv(kv_cache, kv_new, write_index)
        else:
            def step(carry, scanned):
                h, cache = carry
                layer_params, li = scanned
                h, cache = block.apply(
                    dict(layer_params), h, kv_cache=(cache, li),
                    write_index=write_index, sequence_length=sequence_length,
                    attention_start=attention_start,
                    position_ids=position_ids)
                return (h, cache), None

            (x, new_kv), _ = jax.lax.scan(step, (x, kv_cache),
                                          (stacked, layer_ids))
        if c.final_norm:
            x = self.ln_f(x)
        return self._logits(x), new_kv

    def _logits(self, x):
        c = self.config
        if c.tie_word_embeddings:
            logits = jnp.einsum("bld,vd->blv", x,
                                self.vocab_embedding.weight.value,
                                preferred_element_type=jnp.float32)
        else:
            logits = self.lm_head(x).astype(jnp.float32)
        if c.padded_vocab != c.vocab_size:
            # sharded GEMM over the padded vocab; slice back to the logical
            # vocab (the ColumnLinear gather epilogue)
            logits = logits[..., :c.vocab_size]
        return logits

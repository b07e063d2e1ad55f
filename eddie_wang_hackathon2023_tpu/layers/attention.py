"""Unified self/cross attention layer.

Counterpart of the reference's hackathon-modified ``tensorrt_llm/layers/
attention.py:48-415``: fused-QKV self-attention, separate q_linear for
cross-attention consuming precomputed cross-K/V, causal/padding masks,
ALiBi, RoPE, MQA, int8 KV cache, and both KV-cache modes:

* concat mode (reference explicit-math path, attention.py:281-306): past
  [B,2,H,S_past,D] is concatenated with fresh K/V and returned — used for
  one-shot calls and tests;
* in-place mode (reference GPTAttention-plugin semantics,
  gptAttentionCommon.cpp:650): a preallocated [B,2,H,S_max,D] buffer is
  updated at ``cache_write_index`` via dynamic_update_slice (donated under
  jit => true in-place) and attention is masked by ``sequence_length``.

TPU-native layout choice: the fused QKV weight is stored
[3, n_heads, head_dim, hidden] (not the GPU's flat [3H, hidden]) so a
PartitionSpec of (None, 'tp', None, None) shards *heads* across the mesh —
the contiguous-split-vs-head-split mismatch that forces the reference to
build per-rank reordered weight files (E/whisper/weight.py splits q/k/v
before fusing) disappears.
"""
from __future__ import annotations

import enum
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .._utils import on_tpu as _on_tpu
from ..functional import (causal_bias, generate_alibi_biases,
                          generate_alibi_slopes, rope)
from ..module import Module
from ..parameter import Parameter
from ..parallel.mapping import TP_AXIS
from ..ops.attention import (append_kv, cached_decode_attention,
                             multihead_attention)
from ..ops.flash_attention import flash_mha
from .linear import ColumnLinear, RowLinear


def _pallas_decode() -> bool:
    """Fused Pallas decode-attention kernel knob: on TPU the hand kernel
    replaces the XLA einsum formulation of the cached decode attention
    (see ops/pallas_decode_attention.py).  Resolution: EWT_PALLAS_DECODE
    env > PluginConfig.pallas_decode > on-TPU auto."""
    from ..plugin import get_plugin_config
    return get_plugin_config().use_pallas_decode()


def proj_fusion_hoistable(attn) -> bool:
    """True when ``attn``'s out-projection qualifies for the fused Pallas
    decode epilogue (int8 WOQ dense, tp=1 — see
    Attention._decode_proj_operands).  Scanned decoders use this to hoist
    the stacked dense qweight out of the scan xs (models/whisper/model.py):
    bound whole, the kernel DMAs the layer panel straight from the stacked
    array instead of XLA materialising a per-layer HBM slice copy each
    step."""
    d = getattr(attn, "dense", None)
    # the fused kernel itself declines MQA/GQA (its batched-over-heads
    # dots assume equal q/KV heads) — hoisting for a model that will
    # never take the kernel would hand the XLA dense a stacked 3-D weight
    if getattr(attn, "num_attention_kv_heads", None) != \
            getattr(attn, "num_attention_heads", None):
        return False
    # the epilogue holds one [H*D, N] weight panel in scoped VMEM; at
    # d=4096 (7B class) that is 16.7 MB int8 and overflows the 16 MiB
    # scoped-VMEM stack (device-verified compile OOM, r5 suite llama7b
    # row).  Checked HERE so the scan-xs hoist decision always matches
    # the kernel's operand decision — a hoisted stacked weight with the
    # fusion declined would hand the XLA dense a 3-D weight.
    hd = (getattr(attn, "num_attention_heads", 0)
          * getattr(attn, "attention_head_size", 0))
    if d is not None:
        itemsize = 1 if getattr(d, "qweight", None) is not None else 2
        if hd * getattr(attn, "hidden_size", 0) * itemsize > 8 * 2 ** 20:
            return False
    if _woq8_unsharded(d):
        return True
    # bf16/f32 dense epilogue: same fusion with the weight pre-swapped to
    # [K, N] (see _decode_proj_operands) — default ON per the round-3
    # device A/B: GPT-350M bf16 bs1 338 vs 289 tok/s, Whisper large-v2
    # bf16 5.35 vs 5.06 utt/s
    from ..plugin import get_plugin_config
    return (get_plugin_config().use_fuse_decode_proj_bf16()
            and d is not None
            and getattr(d, "qweight", None) is None
            and getattr(d, "weight", None) is not None
            and getattr(d, "tp_size", 1) == 1)


def _woq8_unsharded(linear) -> bool:
    return (linear is not None
            and getattr(linear, "qweight", None) is not None
            and getattr(linear, "bits", None) == 8
            and getattr(linear, "tp_size", 1) == 1)


class AttentionMaskType(enum.Enum):
    padding = 0
    causal = 1
    bidirectional = 2


class PositionEmbeddingType(enum.Enum):
    learned_absolute = 0
    rope = 1
    alibi = 2
    # ChatGLM-6B two-dimensional rotary: the 2*half head dim is split in two
    # halves, each rotated neox-style with its own position-id row
    # (ref T/models/chatglm6b/model.py:151-175 rotate_embedding)
    glm_2d_rope = 3


class QKVLinear(Module):
    """Fused QKV projection with head-major weight layout (see module doc)."""

    def __init__(self, hidden_size: int, num_heads: int, num_kv_heads: int,
                 head_dim: int, bias: bool = True, dtype=None):
        super().__init__()
        self.num_heads = num_heads
        self.num_kv_heads = num_kv_heads
        self.head_dim = head_dim
        if num_kv_heads == num_heads:
            self.weight = Parameter(shape=(3, num_heads, head_dim, hidden_size),
                                    dtype=dtype, pspec=P(None, TP_AXIS, None, None))
            if bias:
                self.bias = Parameter(shape=(3, num_heads, head_dim),
                                      dtype=dtype, pspec=P(None, TP_AXIS, None))
            else:
                self.register_parameter("bias", None)
        else:
            # MQA/GQA: store q and kv separately (ref multi_query_mode,
            # attention.py:120-131)
            self.weight = Parameter(shape=(num_heads, head_dim, hidden_size),
                                    dtype=dtype, pspec=P(TP_AXIS, None, None))
            self.kv_weight = Parameter(
                shape=(2, num_kv_heads, head_dim, hidden_size), dtype=dtype)
            if bias:
                self.bias = Parameter(shape=(num_heads, head_dim), dtype=dtype,
                                      pspec=P(TP_AXIS, None))
                self.kv_bias = Parameter(shape=(2, num_kv_heads, head_dim),
                                         dtype=dtype)
            else:
                self.register_parameter("bias", None)
                self.register_parameter("kv_bias", None)

    def forward(self, x):
        """x [B,L,hidden] -> q [B,L,Hq,D], k [B,L,Hkv,D], v [B,L,Hkv,D].

        The head-major weight is flattened to a plain [3*H*D, hidden] GEMM
        operand (free reshape — the storage is contiguous) so the MXU sees
        one large matmul; the head split happens on the activation side."""
        b, l, hidden = x.shape
        h, d = self.num_heads, self.head_dim
        if self.num_kv_heads == self.num_heads:
            w = self.weight.value.reshape(3 * h * d, hidden)
            qkv = jnp.matmul(x, w.T, preferred_element_type=jnp.float32)
            qkv = qkv.astype(x.dtype)
            if l > 1:
                from ..plugin import get_plugin_config
                if get_plugin_config().use_qkv_flat_barrier():
                    # keep the GEMM output flat/N-minor; the head split
                    # below becomes an explicit relayout copy instead of
                    # a 64-lane-minor GEMM epilogue (see PluginConfig)
                    qkv = jax.lax.optimization_barrier(qkv)
            qkv = qkv.reshape(b, l, 3, h, d)
            if self.bias is not None:
                qkv = qkv + self.bias.value.astype(qkv.dtype)
            return qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        hk = self.num_kv_heads
        q = jnp.matmul(x, self.weight.value.reshape(h * d, hidden).T,
                       preferred_element_type=jnp.float32)
        q = q.astype(x.dtype).reshape(b, l, h, d)
        kv = jnp.matmul(x, self.kv_weight.value.reshape(2 * hk * d, hidden).T,
                        preferred_element_type=jnp.float32)
        kv = kv.astype(x.dtype).reshape(b, l, 2, hk, d)
        if self.bias is not None:
            q = q + self.bias.value.astype(q.dtype)
            kv = kv + self.kv_bias.value.astype(kv.dtype)
        return q, kv[:, :, 0], kv[:, :, 1]


class Attention(Module):

    def __init__(self,
                 hidden_size: int,
                 num_attention_heads: int,
                 max_position_embeddings: int,
                 num_layers: int = 1,
                 cross_attention: bool = False,
                 apply_query_key_layer_scaling: bool = False,
                 attention_mask_type: AttentionMaskType = AttentionMaskType.padding,
                 bias: bool = True,
                 dtype=None,
                 position_embedding_type: PositionEmbeddingType = PositionEmbeddingType.learned_absolute,
                 neox_rotary_style: bool = True,
                 use_int8_kv_cache: bool = False,
                 use_fp8_kv_cache: bool = False,
                 rotary_embedding_percentage: float = 1.0,
                 rotary_base: float = 10000.0,
                 tp_group=None,
                 tp_size: int = 1,
                 multi_query_mode: bool = False,
                 num_kv_heads: Optional[int] = None):
        super().__init__()
        self.attention_mask_type = attention_mask_type
        self.attention_head_size = hidden_size // num_attention_heads
        self.num_attention_heads = num_attention_heads
        # MQA (1 KV head, ref multi_query_mode attention.py:120-131) and
        # GQA (1 < num_kv_heads < H — beyond the reference, which ships
        # MQA only) share the separate-KV QKVLinear layout and the
        # grouped attention reads (ops.attention, _gqa kernel path)
        if num_kv_heads is not None:
            assert num_attention_heads % num_kv_heads == 0, \
                (num_attention_heads, num_kv_heads)
            self.num_attention_kv_heads = num_kv_heads
        else:
            self.num_attention_kv_heads = \
                1 if multi_query_mode else num_attention_heads
        self.hidden_size = hidden_size
        self.max_position_embeddings = max_position_embeddings
        self.num_layers = num_layers
        self.apply_query_key_layer_scaling = apply_query_key_layer_scaling
        self.norm_factor = math.sqrt(self.attention_head_size)
        self.q_scaling = 1.0
        if apply_query_key_layer_scaling:
            self.norm_factor *= num_layers
            self.q_scaling *= num_layers
        self.position_embedding_type = position_embedding_type
        self.multi_query_mode = multi_query_mode
        self.neox_rotary_style = neox_rotary_style
        self.rotary_base = rotary_base
        self.rotary_embedding_dim = 0
        if position_embedding_type == PositionEmbeddingType.rope:
            self.rotary_embedding_dim = int(self.attention_head_size *
                                            rotary_embedding_percentage)
        elif position_embedding_type == PositionEmbeddingType.glm_2d_rope:
            self.rotary_embedding_dim = self.attention_head_size // 2
        self.dtype = dtype
        self.use_int8_kv_cache = use_int8_kv_cache
        self.use_fp8_kv_cache = use_fp8_kv_cache
        assert not (use_int8_kv_cache and use_fp8_kv_cache)
        if use_int8_kv_cache or use_fp8_kv_cache:
            # scale_y_quant_orig semantics, ref attention.py:100-105
            # (fp8 KV mode, ref QuantMode.FP8_KV_CACHE, shares the scale
            # plumbing; values are cast to e4m3 instead of int8)
            self.kv_orig_quant_scale = Parameter(shape=(1,), dtype="float32")
            self.kv_quant_orig_scale = Parameter(shape=(1,), dtype="float32")
        else:
            self.register_parameter("kv_orig_quant_scale", None)
            self.register_parameter("kv_quant_orig_scale", None)
        self.cross_attention = cross_attention

        if cross_attention:
            self.q_linear = ColumnLinear(hidden_size, hidden_size, bias=bias,
                                         dtype=dtype, tp_size=tp_size,
                                         gather_output=False)
            self.register_parameter("qkv", None)
            self._modules.pop("qkv", None)
            object.__setattr__(self, "qkv", None)
        else:
            self.qkv = QKVLinear(hidden_size, self.num_attention_heads,
                                 self.num_attention_kv_heads,
                                 self.attention_head_size, bias=bias,
                                 dtype=dtype)
            object.__setattr__(self, "q_linear", None)

        self.dense = RowLinear(hidden_size, hidden_size, bias=bias,
                               dtype=dtype, tp_size=tp_size)

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _unpack_cross_kv(cv):
        """-> (key, value, scale-or-None, seq_minor).  Accepted forms:
        * [B,2,H,S,D] per-layer cross KV (seq_minor=False);
        * (kv, scale) — int8 per-layer KV with its dequant scale;
        * (full, layer_idx) stacked mode, full = [L,B,2,H,D,S] seq-minor
          or (kv_stack, scales[L]) — sliced here as two separate K/V
          dynamic-slices so the reads fuse into the attention einsums."""
        if isinstance(cv, tuple) and (isinstance(cv[0], tuple)
                                      or getattr(cv[0], "ndim", 0) == 6):
            from ..ops.attention import layer_kv_views
            full, l = cv
            scale = None
            if isinstance(full, tuple):
                full, scales = full
                scale = jax.lax.dynamic_index_in_dim(
                    scales, jnp.asarray(l, jnp.int32), 0, keepdims=False)
            k, v = layer_kv_views(full, l)
            return k, v, scale, True
        if isinstance(cv, tuple):
            kv, scale = cv
            return kv[:, 0], kv[:, 1], scale, False
        return cv[:, 0], cv[:, 1], None, False

    def _decode_proj_operands(self, batch: int = 1):
        """Out-projection operands for the fused Pallas decode kernel
        (ops.pallas_decode_attention proj=): the int8 WOQ dense (qweight
        already [K, N] K-major, kernel view [H, D, N] free) or — behind
        PluginConfig.fuse_decode_proj_bf16, default ON per the round-3
        device A/B — the plain float Linear, minors swapped to [K, N]
        below.  tp>1 needs the XLA dense's automatic partial-sum
        reduction.  Returns (w, scale, bias) or None.

        Inside a scanned decoder the bound weight may be the FULL
        stacked [L, ...] array (see ``proj_fusion_hoistable``) — passed
        through as-is; the kernel's index_map picks the layer panel.

        ``batch``: the fused epilogue runs its per-head dots once per
        grid row, SEQUENTIALLY in b — at batch>1 XLA's batched GEMV
        amortises the weight read across rows instead, so fusion is
        batch-1 only."""
        from ..plugin import get_plugin_config
        if batch != 1:
            return None
        cfg = get_plugin_config()
        if not cfg.use_fuse_decode_proj():
            return None
        if not proj_fusion_hoistable(self):
            return None
        d = self.dense
        if getattr(d, "qweight", None) is not None:
            return (d.qweight.value, d.per_channel_scale.value,
                    None if d.bias is None else d.bias.value)
        # float dense rides the kernel in the int8 path's [.., K, N]
        # layout: swap the Linear-native [N, K] minors HERE — the swap is
        # loop-invariant, so XLA relayouts once outside the decode
        # while_loop, not per step.  (An in-kernel "nk" layout was tried
        # instead and deleted: its [1, N, H, D] VMEM panel padded
        # (20,64)->(24,128) sublane x lane — 7.9 MB/panel on large-v2 —
        # and overflowed the 16 MiB scoped-VMEM stack on device.)
        return (jnp.swapaxes(d.weight.value, -1, -2), None,
                None if d.bias is None else d.bias.value)

    def _split_heads(self, x):
        b, l, _ = x.shape
        return x.reshape(b, l, self.num_attention_heads,
                         self.attention_head_size).transpose(0, 2, 1, 3)

    def _merge_heads(self, x):
        b, h, l, d = x.shape
        return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)

    @property
    def scale(self) -> float:
        return 1.0 / self.norm_factor

    def new_kv_cache(self, batch: int, max_len: int):
        """Allocate the in-place cache buffer ([B,2,H,D,S] — SEQ-MINOR so
        decode matvecs read full 128-lane tiles, see ops.attention.append_kv;
        int8 when quantised — ref WhisperDecoder.prepare_inputs int8
        branch)."""
        kv_dtype = (jnp.int8 if self.use_int8_kv_cache
                    else jnp.float8_e4m3fn if self.use_fp8_kv_cache
                    else (self.dtype or jnp.float32))
        return jnp.zeros((batch, 2, self.num_attention_kv_heads,
                          self.attention_head_size, max_len), dtype=kv_dtype)

    # -- forward ----------------------------------------------------------

    def forward(self,
                hidden_states,
                attention_mask=None,
                past_key_value=None,
                sequence_length=None,
                cross_key_value=None,
                position_ids=None,
                cache_write_index=None,
                attention_start=None,
                beam_indirection=None,
                valid_len: Optional[int] = None,
                use_cache: bool = False):
        b, l, _ = hidden_states.shape

        if self.cross_attention:
            assert cross_key_value is not None, \
                "cross attention consumes precomputed cross K/V (ref attention.py:308-323)"
            key, value, cross_scale, seq_minor = \
                self._unpack_cross_kv(cross_key_value)

            def _ret(out):
                return (out, past_key_value) if use_cache else out

            query = self._split_heads(self.q_linear(hidden_states))
            if seq_minor and l == 1 and _pallas_decode():
                # stacked seq-minor decode: fused kernel (+ out-proj
                # epilogue when the operands qualify)
                assert attention_mask is None
                from ..ops.pallas_decode_attention import \
                    fused_decode_attention
                full, li = cross_key_value
                if isinstance(full, tuple):
                    full = full[0]
                s_full = jnp.full((b,), key.shape[3], jnp.int32)
                proj = self._decode_proj_operands(batch=b)
                res = fused_decode_attention(
                    full, li, query, s_full, self.scale,
                    kv_quant_orig_scale=cross_scale, proj=proj)
                out = (res[:, None, :] if proj is not None
                       else self.dense(self._merge_heads(res)))
                return _ret(out)
            if seq_minor:
                # stacked [.,.,D,S] views: unmasked attention via the
                # seq-minor einsums (int8 dequant handled inside)
                assert attention_mask is None
                s_full = jnp.full((query.shape[0],), key.shape[3], jnp.int32)
                ctx = cached_decode_attention(
                    query, (key, value), s_full, scale=self.scale,
                    kv_quant_orig_scale=cross_scale)
                return _ret(self.dense(self._merge_heads(ctx)))
            if key.dtype == jnp.int8:
                key = (key.astype(jnp.float32) * cross_scale).astype(query.dtype)
                value = (value.astype(jnp.float32) * cross_scale).astype(query.dtype)
            else:
                key = key.astype(query.dtype)
                value = value.astype(query.dtype)
            ctx = flash_mha(query, key, value, causal=False, scale=self.scale,
                            bias=attention_mask)
            return _ret(self.dense(self._merge_heads(ctx)))

        q, k, v = self.qkv(hidden_states)          # [B,L,H,D]
        if self.position_embedding_type == PositionEmbeddingType.rope:
            if position_ids is None:
                base = cache_write_index if cache_write_index is not None else 0
                position_ids = base + jnp.arange(l, dtype=jnp.int32)[None, :]
                position_ids = jnp.broadcast_to(position_ids, (b, l))
            q = rope(q, position_ids, self.rotary_base, self.rotary_embedding_dim,
                     self.neox_rotary_style)
            k = rope(k, position_ids, self.rotary_base, self.rotary_embedding_dim,
                     self.neox_rotary_style)
        elif self.position_embedding_type == PositionEmbeddingType.glm_2d_rope:
            assert position_ids is not None and position_ids.shape[1] == 2, \
                "glm_2d_rope needs position_ids [B, 2, L] (pos, block-pos)"
            half = self.rotary_embedding_dim

            def rot2d(x):
                lo = rope(x[..., :half], position_ids[:, 0], self.rotary_base,
                          half, neox_style=True)
                hi = rope(x[..., half:], position_ids[:, 1], self.rotary_base,
                          half, neox_style=True)
                return jnp.concatenate([lo, hi], axis=-1)

            q, k = rot2d(q), rot2d(k)
        q = q.transpose(0, 2, 1, 3)                # [B,H,L,D]
        k = k.transpose(0, 2, 1, 3)                # [B,Hkv,L,D]
        v = v.transpose(0, 2, 1, 3)

        kv_rep = self.num_attention_heads // self.num_attention_kv_heads

        def _rep_kv(k_, v_):
            """Materialised head repeat for kernels that need equal
            heads (flash prefill).  The cached decode paths never call
            this — they read the Hkv-head cache grouped/broadcast."""
            if kv_rep == 1:
                return k_, v_
            return (jnp.repeat(k_, kv_rep, axis=1),
                    jnp.repeat(v_, kv_rep, axis=1))

        alibi = None
        if self.position_embedding_type == PositionEmbeddingType.alibi:
            slopes = jnp.asarray(generate_alibi_slopes(self.num_attention_heads))

        if cache_write_index is not None:
            # ---- in-place mode (gpt_attention plugin semantics) ----
            assert past_key_value is not None and sequence_length is not None
            quant_kv = self.use_int8_kv_cache or self.use_fp8_kv_cache
            kv_oq = self.kv_orig_quant_scale.value if quant_kv else None
            kv_qo = self.kv_quant_orig_scale.value if quant_kv else None
            # ---- block-paged mode (ref paged_kv_cache attention,
            # D/gpt_attention.md:168-200): pool + block tables instead of a
            # dense per-slot cache; writes scatter through the tables ----
            from ..ops.paged_attention import PagedKV
            if isinstance(past_key_value, PagedKV):
                from ..ops.paged_attention import (paged_append_kv,
                                                   paged_append_window,
                                                   paged_decode_attention,
                                                   paged_prefill)
                pk = past_key_value
                if q.shape[2] == 1:
                    # generation phase: scatter one token, then read the
                    # paged history.  Default on TPU: the paged Pallas
                    # kernel (round 5) — the block table rides as a
                    # scalar-prefetch argument consumed by the kv
                    # BlockSpec index maps, so pool blocks are DMA'd
                    # directly with NO gathered [B, MB*T, ...] copy and
                    # no materialised per-layer pool slice (the
                    # reference likewise consumes its pointer arrays
                    # inside the fused plugin, D/gpt_attention.md:
                    # 168-200).  Beams keep the XLA masked cross-beam
                    # formulation.
                    pool = paged_append_kv(
                        pk.pool, k, v, pk.block_table,
                        jnp.asarray(cache_write_index, jnp.int32).reshape(-1),
                        kv_orig_quant_scale=kv_oq, layer_idx=pk.layer_idx)
                    if _pallas_decode() and beam_indirection is None \
                            and b <= 2:
                        # batch gate from the r5 device A/B: bs1 serving
                        # 30.7 vs 24.2 tok/s (kernel wins, latency
                        # mode), bs8 119 vs 164 (XLA's batched gather +
                        # einsums amortise across rows; the kernel's
                        # per-row grid does not)
                        from ..ops.pallas_decode_attention import \
                            paged_decode_attention_pallas
                        ctx = paged_decode_attention_pallas(
                            pool, pk.layer_idx, q, pk.block_table,
                            sequence_length, self.scale,
                            kv_quant_orig_scale=kv_qo)
                    else:
                        pool_l = jax.lax.dynamic_index_in_dim(
                            pool, pk.layer_idx, 0, keepdims=False)
                        ctx = paged_decode_attention(
                            q, pool_l, pk.block_table, sequence_length,
                            scale=self.scale, kv_quant_orig_scale=kv_qo,
                            beam_indirection=beam_indirection)
                elif getattr(cache_write_index, "ndim", 0) >= 1:
                    # mixed context+generation window (ref ibGptAttention
                    # mixed enqueue): W tokens per row at per-row start
                    # offsets, chunk boundaries NOT block-aligned — the
                    # window scatters through the tables, then attends the
                    # paged history causally from its own offset
                    assert self.attention_mask_type == AttentionMaskType.causal
                    wp = jnp.asarray(cache_write_index, jnp.int32)
                    pool = paged_append_window(
                        pk.pool, k, v, pk.block_table, wp,
                        kv_orig_quant_scale=kv_oq, layer_idx=pk.layer_idx)
                    pool_l = jax.lax.dynamic_index_in_dim(
                        pool, pk.layer_idx, 0, keepdims=False)
                    ctx = paged_decode_attention(
                        q, pool_l, pk.block_table, sequence_length,
                        scale=self.scale, kv_quant_orig_scale=kv_qo,
                        causal_offset=wp)
                else:
                    # context phase (admission prefill from position 0):
                    # paged store + attention over the contiguous fresh KV
                    # (the reference's context FMHA reads unpaged QKV)
                    pool = paged_prefill(pk.pool, k, v, pk.block_table,
                                         kv_orig_quant_scale=kv_oq,
                                         layer_idx=pk.layer_idx)
                    assert self.attention_mask_type == AttentionMaskType.causal
                    kf, vf = ((k, v) if self.num_attention_kv_heads <= 1
                              else _rep_kv(k, v))
                    ctx = multihead_attention(
                        q, kf, vf, bias=causal_bias(q.shape[2], k.shape[2]),
                        scale=self.scale)
                out = self.dense(self._merge_heads(ctx))
                return (out, pool) if use_cache else out
            # stacked-cache mode: (full [n_layer,...] cache, layer_idx) —
            # write only the fresh token(s) into the carried buffer and
            # read this layer's view for the attention (avoids the
            # slice/update/restack copies a scan-over-cache incurs; see
            # ops.attention.append_kv_stacked)
            stacked_cache = isinstance(past_key_value, tuple)
            if stacked_cache and len(past_key_value) in (3, 5):
                # ---- deferred-write decode (see cached_decode_attention
                # fresh_kv doc): attention over stale cache + fresh token;
                # the caller batches all layers' writes into one update.
                # 5-tuple form adds the K-step tail (ops.attention
                # write_tail_kv): (full, layer, "defer", tail, tail_len)
                from ..ops.attention import (cast_kv_for_cache,
                                             layer_kv_views,
                                             layer_tail_views)
                if len(past_key_value) == 5:
                    full_cache, layer_idx, _, kv_tail, tail_len = \
                        past_key_value
                else:
                    full_cache, layer_idx, _ = past_key_value
                    kv_tail = tail_len = None
                assert q.shape[2] == 1 and attention_mask is None and \
                    self.position_embedding_type != PositionEmbeddingType.alibi
                k_st, v_st = cast_kv_for_cache(k, v, full_cache.dtype, kv_oq)
                if beam_indirection is not None:
                    assert kv_tail is None, \
                        "K-step tail not supported with beam indirection"
                    # cache_indirection beam mode (ref T/functional.py:2738
                    # cache_indirection plugin arg): the per-(beam,
                    # position) physical-row map rides into the attention
                    # READ as masked cross-beam scores — XLA lowered the
                    # previous take_along_axis formulation to a
                    # materialised reordered cache copy (2x cache bytes
                    # written+re-read per layer per step; 13.2 ms/tok at
                    # beam=4/ctx=2048 on v5e).  Round 5 moved the
                    # indirection INTO the fused Pallas kernel (the
                    # reference's masked-MHA kernel composes it into its
                    # cache read, gptAttentionCommon.cpp:650): panels are
                    # streamed once per beam GROUP with the row map as
                    # lane masks.  The XLA formulation stays as the
                    # fallback for MQA/GQA caches.
                    from ..plugin import get_plugin_config
                    if _pallas_decode() and \
                            get_plugin_config().use_beam_pallas() and \
                            self.num_attention_kv_heads == \
                            self.num_attention_heads:
                        from ..ops.pallas_decode_attention import \
                            fused_decode_attention
                        ctx = fused_decode_attention(
                            full_cache, layer_idx, q, sequence_length,
                            self.scale, kv_quant_orig_scale=kv_qo,
                            fresh_kv=(k_st, v_st),
                            start_index=attention_start,
                            beam_indirection=beam_indirection)
                    else:
                        from ..ops.attention import \
                            beam_indirect_decode_attention
                        ctx = beam_indirect_decode_attention(
                            q, layer_kv_views(full_cache, layer_idx),
                            sequence_length, beam_indirection,
                            scale=self.scale, kv_quant_orig_scale=kv_qo,
                            start_index=attention_start,
                            fresh_kv=(k_st, v_st))
                elif _pallas_decode():
                    # equal heads take the batched-over-heads kernel;
                    # MQA/GQA routes to the grouped kernel inside
                    # fused_decode_attention (query head groups on the
                    # dot's row dim — no materialised head repeat)
                    from ..ops.pallas_decode_attention import \
                        fused_decode_attention
                    equal_heads = (self.num_attention_kv_heads
                                   == self.num_attention_heads)
                    proj = (self._decode_proj_operands(batch=b)
                            if equal_heads else None)
                    res = fused_decode_attention(
                        full_cache, layer_idx, q, sequence_length,
                        self.scale, kv_quant_orig_scale=kv_qo,
                        fresh_kv=(k_st, v_st), start_index=attention_start,
                        tail_kv=(None if kv_tail is None
                                 else (kv_tail, tail_len)),
                        proj=proj)
                    out = (res[:, None, :] if proj is not None
                           else self.dense(self._merge_heads(res)))
                    return (out, (k_st, v_st)) if use_cache else out
                else:
                    ctx = cached_decode_attention(
                        q, layer_kv_views(full_cache, layer_idx),
                        sequence_length, scale=self.scale,
                        kv_quant_orig_scale=kv_qo,
                        start_index=attention_start, fresh_kv=(k_st, v_st),
                        tail_kv=(None if kv_tail is None else
                                 layer_tail_views(kv_tail, layer_idx)
                                 + (tail_len,)))
                out = self.dense(self._merge_heads(ctx))
                return (out, (k_st, v_st)) if use_cache else out
            if stacked_cache:
                from ..ops.attention import append_kv_stacked, layer_kv_views
                full_cache, layer_idx = past_key_value
                full_cache = append_kv_stacked(full_cache, k, v, layer_idx,
                                               cache_write_index,
                                               kv_orig_quant_scale=kv_oq)
                # two separate K/V slices fuse into their einsums (no
                # materialised layer view)
                past_key_value = layer_kv_views(full_cache, layer_idx)
                returned_cache = full_cache
            else:
                past_key_value = append_kv(past_key_value, k, v,
                                           cache_write_index,
                                           kv_orig_quant_scale=kv_oq)
                returned_cache = past_key_value
            # context/prefill fast path: statically-known empty cache, no
            # left-padding -> fused flash attention over the fresh K/V only
            # (the reference's context-FMHA dispatch,
            # gptAttentionCommon.cpp:362 enqueueContext)
            # (bidirectional prefill excluded: with right-padded prompts the
            # unmasked flash path would let real tokens attend pad garbage;
            # the cached path below masks keys by sequence_length)
            if (isinstance(cache_write_index, int) and cache_write_index == 0
                    and q.shape[2] > 1 and attention_start is None
                    and not self.use_int8_kv_cache
                    and not self.use_fp8_kv_cache
                    and self.attention_mask_type == AttentionMaskType.causal
                    and self.position_embedding_type
                    != PositionEmbeddingType.alibi):
                kf, vf = _rep_kv(k, v)   # flash needs equal head counts
                ctx = flash_mha(
                    q, kf, vf,
                    causal=self.attention_mask_type == AttentionMaskType.causal,
                    scale=self.scale)
                out = self.dense(self._merge_heads(ctx))
                return (out, returned_cache) if use_cache else out
            causal_offset = None
            if self.attention_mask_type == AttentionMaskType.causal:
                causal_offset = jnp.asarray(cache_write_index, jnp.int32)
            if self.position_embedding_type == PositionEmbeddingType.alibi:
                s_max = (past_key_value[0].shape[3]
                         if isinstance(past_key_value, tuple)
                         else past_key_value.shape[4])
                alibi = generate_alibi_biases(slopes, s_max)
            q_for_cache = q
            ctx = cached_decode_attention(
                q_for_cache, past_key_value, sequence_length,
                scale=self.scale, kv_quant_orig_scale=kv_qo,
                causal_offset=causal_offset, start_index=attention_start,
                bias=alibi)
            out = self.dense(self._merge_heads(ctx))
            return (out, returned_cache) if use_cache else out

        # ---- concat / one-shot mode (explicit-math path) ----
        if past_key_value is not None:
            past_k = past_key_value[:, 0]
            past_v = past_key_value[:, 1]
            if past_key_value.dtype == jnp.int8:
                scale = self.kv_quant_orig_scale.value
                past_k = (past_k.astype(jnp.float32) * scale).astype(q.dtype)
                past_v = (past_v.astype(jnp.float32) * scale).astype(q.dtype)
            k_full = jnp.concatenate([past_k.astype(q.dtype), k], axis=2)
            v_full = jnp.concatenate([past_v.astype(q.dtype), v], axis=2)
        else:
            k_full, v_full = k, v

        is_causal = self.attention_mask_type == AttentionMaskType.causal
        if (attention_mask is None and past_key_value is None
                and self.position_embedding_type != PositionEmbeddingType.alibi):
            # fused context attention (flash on TPU, XLA elsewhere).
            # ``valid_len`` = pad-once contract: the caller carries the
            # sequence pre-padded to the flash block multiple and only the
            # first N positions are real (flash_mha masks the rest via
            # segment ids with no further pad copies).
            if valid_len is not None:
                kf, vf = _rep_kv(k_full, v_full)
                ctx = flash_mha(q, kf, vf, causal=is_causal,
                                scale=self.scale, kv_valid_len=valid_len)
            elif q.shape[2] < 128 or not _on_tpu():
                kf, vf = ((k_full, v_full)
                          if self.num_attention_kv_heads <= 1
                          else _rep_kv(k_full, v_full))
                ctx = multihead_attention(q, kf, vf,
                                          bias=causal_bias(q.shape[2],
                                                           k_full.shape[2])
                                          if is_causal else None,
                                          scale=self.scale)
            else:
                kf, vf = _rep_kv(k_full, v_full)
                ctx = flash_mha(q, kf, vf, causal=is_causal,
                                scale=self.scale)
        else:
            bias = attention_mask
            if is_causal:
                cb = causal_bias(q.shape[2], k_full.shape[2])
                bias = cb if bias is None else bias + cb
            if self.position_embedding_type == PositionEmbeddingType.alibi:
                ab = generate_alibi_biases(slopes, k_full.shape[2])
                bias = ab if bias is None else bias + ab
            kf, vf = ((k_full, v_full) if self.num_attention_kv_heads <= 1
                      else _rep_kv(k_full, v_full))
            ctx = multihead_attention(q, kf, vf, bias=bias,
                                      scale=self.scale)
        out = self.dense(self._merge_heads(ctx))

        if use_cache:
            present = jnp.stack([k_full, v_full], axis=1)
            if self.use_int8_kv_cache or self.use_fp8_kv_cache:
                from ..ops.attention import quantize_cache_values
                present = quantize_cache_values(
                    present,
                    jnp.int8 if self.use_int8_kv_cache else jnp.float8_e4m3fn,
                    self.kv_orig_quant_scale.value)
            return out, present
        return out

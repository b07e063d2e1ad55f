"""Whisper encoder/decoder — the hackathon's flagship workload.

Counterpart of ``T/models/whisper/model.py`` (ResidualAttentionBlock:18,
WhisperEncoder:124, WhisperDecoder:200, CrossAttn_KV:523) re-designed for
TPU/XLA:

* the reference builds three TRT engines (encoder / decoder / cross-KV);
  here they are three jitted functions over one parameter store;
* the transformer blocks are *scanned* (``lax.scan``) over parameters that
  are stored stacked with a leading [n_layer] axis (see
  ``stack_parameter_shapes``) — one compiled block body instead of 32 and
  zero per-step weight copies;
* the decoder KV cache is a preallocated stacked buffer
  [n_layer, B, 2, H, n_text_ctx, D] updated in place (donated under jit) —
  the gpt_attention-plugin semantics (enqueueGeneration), not the
  concat-and-return path the reference uses without plugins;
* cross-attention K/V for all layers is precomputed once per utterance
  ([n_layer, B, 2, H, 1500, D]) — the CrossAttn_KV "warping" engine.

WER-critical numerics kept from the reference: fp32 QK^T/softmax
(attention.py:386-398), zero K-bias (E/whisper/weight.py:89-95), tied
token-embedding logits (model.py:290), sinusoidal encoder positions as a
loaded constant, tanh-gelu activations.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...functional import gelu, round_half_away
from ...layers import (Attention, AttentionMaskType, Conv1d, Embedding,
                       LayerNorm, Linear)
from ...module import Module, stack_parameter_shapes
from ...parameter import Parameter
from ...quantization import QuantMode
from .config import WhisperConfig


class ResidualAttentionBlock(Module):
    """Pre-LN self-attn (+optional cross-attn) + 4x GELU MLP
    (ref model.py:18-122)."""

    def __init__(self, n_state: int, n_head: int, n_ctx: int, dtype,
                 cross_attention: bool = False,
                 quant_mode: QuantMode = QuantMode(0),
                 mask_type: AttentionMaskType = AttentionMaskType.padding):
        super().__init__()
        self.attn_ln = LayerNorm(n_state, dtype=dtype)
        self.attn = Attention(
            n_state, n_head, n_ctx, bias=True, dtype=dtype,
            attention_mask_type=mask_type,
            use_int8_kv_cache=quant_mode.has_int8_kv_cache(),
            use_fp8_kv_cache=quant_mode.has_fp8_kv_cache())
        self.cross_attention = cross_attention
        if cross_attention:
            self.cross_attn_ln = LayerNorm(n_state, dtype=dtype)
            self.cross_attn = Attention(n_state, n_head, n_ctx,
                                        cross_attention=True, bias=True,
                                        dtype=dtype)
        self.mlp_ln = LayerNorm(n_state, dtype=dtype)
        self.mlp1 = Linear(n_state, 4 * n_state, bias=True, dtype=dtype)
        self.mlp2 = Linear(4 * n_state, n_state, bias=True, dtype=dtype)

    def forward(self, x, kv_cache=None, cross_kv=None, write_index=None,
                sequence_length=None, valid_len=None,
                use_cache: bool = False, beam_indirection=None):
        attn_out = self.attn(self.attn_ln(x),
                             past_key_value=kv_cache,
                             sequence_length=sequence_length,
                             cache_write_index=write_index,
                             valid_len=valid_len,
                             beam_indirection=beam_indirection,
                             use_cache=use_cache)
        if use_cache:
            attn_out, kv_cache = attn_out
        x = x + attn_out
        if self.cross_attention:
            x = x + self.cross_attn(self.cross_attn_ln(x),
                                    cross_key_value=cross_kv)
        x = x + self.mlp2(gelu(self.mlp1(self.mlp_ln(x))))
        if use_cache:
            return x, kv_cache
        return x


class WhisperEncoder(Module):
    """Conv1d(n_mels->d,k3,p1)+GELU -> Conv1d(d->d,k3,s2,p1)+GELU ->
    +sinusoid pos -> n_layer scanned blocks -> LN (ref model.py:124-197).
    Input [B, n_mels, 3000] -> output [B, 1500, d]."""

    def __init__(self, config: WhisperConfig,
                 quant_mode: QuantMode = QuantMode(0)):
        super().__init__()
        c = config
        self.config = c
        self.conv1 = Conv1d(c.n_mels, c.n_audio_state, 3, padding=1,
                            dtype=c.dtype)
        self.conv2 = Conv1d(c.n_audio_state, c.n_audio_state, 3, stride=2,
                            padding=1, dtype=c.dtype)
        self.positional_embedding = Parameter(
            shape=(c.n_audio_ctx, c.n_audio_state), dtype=c.dtype)
        # template block; parameters carry a leading [n_audio_layer] axis
        self.blocks = stack_parameter_shapes(
            ResidualAttentionBlock(c.n_audio_state, c.n_audio_head,
                                   c.n_audio_ctx, c.dtype,
                                   quant_mode=quant_mode),
            c.n_audio_layer)
        self.ln_post = LayerNorm(c.n_audio_state, dtype=c.dtype)

    def forward(self, mel):
        x = gelu(self.conv1(mel))
        x = gelu(self.conv2(x))
        x = x.transpose(0, 2, 1)  # [B, 1500, d]
        x = x + self.positional_embedding.value.astype(x.dtype)

        # Pad-once: carry the sequence padded to the flash block multiple
        # (1500 -> 1536) through ALL blocks instead of letting every
        # flash_mha call pad q/k/v and slice the output (32 layers x 4
        # full-tensor copies), and so every GEMM sees an aligned M dim.
        # Padded rows stay finite (LN of a zero row = bias) and are masked
        # out of attention via valid_len -> segment ids; sliced off after
        # the scan.
        valid = x.shape[1]
        pad = (-valid) % 128 if valid >= 128 else 0
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

        block = self.blocks
        stacked = block.state_dict()
        vl = valid if pad else None

        def step(h, layer_params):
            return block.apply(dict(layer_params), h, valid_len=vl), None

        x, _ = jax.lax.scan(step, x, stacked)
        if pad:
            x = x[:, :valid]
        return self.ln_post(x)


class _KVLinearBlock(Module):
    """K (no bias) / V (bias) projections — Whisper checkpoint semantics
    (ref KVLinearBlock, model.py:469)."""

    def __init__(self, n_state: int, dtype):
        super().__init__()
        self.k_linear = Linear(n_state, n_state, bias=False, dtype=dtype)
        self.v_linear = Linear(n_state, n_state, bias=True, dtype=dtype)

    def forward(self, xa):
        return self.k_linear(xa), self.v_linear(xa)


class CrossAttnKV(Module):
    """The cross_kv_cache_warping engine (ref model.py:469-555): computes
    every layer's cross-attention K/V from encoder output once per
    utterance.

    ``int8_output=True`` additionally quantises the result per layer with
    dynamically-computed scales (amax/127 of the actual values — exact,
    no calibration needed since the tensor is produced whole).  This is a
    beyond-reference optimisation: cross-KV is ~0.5 GB/step of decode HBM
    traffic for large-v2, and the reference keeps it fp16.

    ``static_scale=True`` takes the per-layer scales from the
    ``kv_scale`` parameter instead (calibrated offline, exactly the
    reference's int8-KV-cache scale model — TRT-LLM's KV scales are
    static calibration products, never computed at runtime).  This is
    the deployment recipe: the dynamic path's two full-tensor amax
    reduction passes and the materialised bf16 intermediate (~3-4 ms of
    the warping engine on large-v2) disappear — XLA fuses
    divide/round/clip/convert into the GEMM epilogue and the engine
    writes int8 straight out of the MXU.  Calibrate with
    ``quantization.calibration.calibrate_cross_kv_scales``."""

    def __init__(self, config: WhisperConfig, int8_output: bool = False,
                 static_scale: bool = False):
        super().__init__()
        c = config
        self.config = c
        self.int8_output = int8_output
        self.static_scale = static_scale and int8_output
        if self.static_scale:
            self.kv_scale = Parameter(shape=(c.n_text_layer,),
                                      dtype="float32")
        self.blocks = stack_parameter_shapes(
            _KVLinearBlock(c.n_text_state, c.dtype), c.n_text_layer)

    def forward(self, xa):
        """xa [B, 1500, d] -> stacked [n_layer, B, 2, H, head_dim, 1500]
        (SEQ-MINOR, matching the decode cache layout — full-lane reads in
        the per-step cross matvecs; plus [n_layer] fp32 dequant scales
        when int8_output)."""
        c = self.config
        b, l, _ = xa.shape
        h, hd = c.n_text_head, c.head_dim
        stacked = self.blocks.state_dict()
        wk = stacked["k_linear.weight"]            # [L, d, d] ([out, in])
        wv = stacked["v_linear.weight"]
        bv = stacked["v_linear.bias"]              # [L, d]
        n_layer = wk.shape[0]
        d = wk.shape[1]
        # ONE stacked GEMM instead of a 32-layer scan of small ones (the
        # scan measured 13 ms vs a ~2 ms GEMM roofline: 64 sequential
        # [1500,1280]x[1280,1280] dispatches plus per-layer transposes).
        # At B=1 the operands are ordered so S is the GEMM's natural
        # minor output axis — out[L*2*d, S] = W[L*2*d, i] @ xa.T — and
        # the seq-minor cache layout falls straight out of the MXU with
        # no transpose (device-profiled: 7.85 vs 9.10 ms for the einsum
        # formulation, benchmarks/crosskv_variants.py).
        if b == 1:
            xt = xa[0].T                           # [i, S]
            w = jnp.concatenate([wk[:, None], wv[:, None]],
                                axis=1)            # [L, 2, d(out), d(in)]
            kv = (w.reshape(n_layer * 2 * d, d) @ xt).reshape(
                n_layer, 1, 2, d, l)               # [L, B=1, 2, d, S]
            bias = jnp.pad(bv[:, None, :, None],   # zero bias on the K slot
                           ((0, 0), (1, 0), (0, 0), (0, 0)))
            kv = kv + bias[:, None].astype(kv.dtype)
        else:
            k = jnp.einsum("bsi,loi->lbos", xa, wk)    # [L, B, d, S]
            v = jnp.einsum("bsi,loi->lbos", xa, wv)
            v = v + bv[:, None, :, None].astype(v.dtype)
            kv = jnp.stack([k, v], axis=2)             # [L, B, 2, d, S]
        if self.int8_output:
            kvf = kv.astype(jnp.float32)
            if self.static_scale:
                # calibrated scales: pure elementwise epilogue, fuses
                # into the GEMM — no amax passes, no bf16 materialisation
                scale = self.kv_scale.value.astype(jnp.float32)
            else:
                amax = jnp.max(jnp.abs(kvf), axis=(1, 2, 3, 4))  # per layer
                scale = jnp.maximum(amax, 1e-6) / 127.0   # [L] fp32
            q = jnp.clip(
                round_half_away(kvf / scale[:, None, None, None, None]),
                -127, 127).astype(jnp.int8)
            return q.reshape(n_layer, b, 2, h, hd, l), scale
        return kv.reshape(n_layer, b, 2, h, hd, l)


class WhisperDecoder(Module):
    """Token emb + positional slice -> n_layer scanned causal blocks with
    in-place KV cache + cross-attn -> LN -> tied-embedding logits
    (ref model.py:200-467)."""

    def __init__(self, config: WhisperConfig,
                 quant_mode: QuantMode = QuantMode(0),
                 quantize_lm_head: bool = False):
        super().__init__()
        c = config
        self.config = c
        self.quant_mode = quant_mode
        self.token_embedding = Embedding(c.padded_vocab, c.n_text_state,
                                         dtype=c.dtype)
        # int8 tied-logits GEMM: the reference EXCLUDES lm_head from WOQ by
        # choice (T/models/quantized/quant.py:51 exclude list), but at
        # batch-1 decode the [n_vocab, d] tied-embedding read is the single
        # largest tensor touched per step (132 MB bf16 on large-v2); a
        # per-vocab-row int8 copy halves it.  The float embedding stays for
        # the input lookup; see quantize_lm_head_state for the transform
        self.quantize_lm_head = quantize_lm_head
        if quantize_lm_head:
            from ...parallel.mapping import TP_AXIS
            from jax.sharding import PartitionSpec as P
            self.lm_head_qweight = Parameter(
                shape=(c.padded_vocab, c.n_text_state), dtype="int8",
                pspec=P(TP_AXIS, None))
            self.lm_head_scale = Parameter(shape=(c.padded_vocab,),
                                           dtype="float32",
                                           pspec=P(TP_AXIS))
        self.positional_embedding = Parameter(
            shape=(c.n_text_ctx, c.n_text_state), dtype=c.dtype)
        self.blocks = stack_parameter_shapes(
            ResidualAttentionBlock(c.n_text_state, c.n_text_head, c.n_text_ctx,
                                   c.dtype, cross_attention=True,
                                   quant_mode=quant_mode,
                                   mask_type=AttentionMaskType.causal),
            c.n_text_layer)
        self.ln = LayerNorm(c.n_text_state, dtype=c.dtype)

    def new_kv_cache(self, batch: int, max_len: Optional[int] = None):
        """Stacked [n_layer, B, 2, H, S, head_dim] cache buffer (int8 when
        quant_mode.has_int8_kv_cache(), ref model.py:234-237)."""
        c = self.config
        max_len = max_len or c.n_text_ctx
        per_layer = self.blocks.attn.new_kv_cache(batch, max_len)
        return jnp.zeros((c.n_text_layer,) + per_layer.shape, per_layer.dtype)

    def megakernel_eligible(self) -> bool:
        """Static structure check for the whole-decoder-layer megakernel
        (ops/pallas_decoder_layer.py): batch-1, equal q/kv heads,
        lane-divisible shapes, and uniformly WOQ-int8 per-out-channel
        weights OR uniformly plain float weights (the kernel streams
        bf16 panels with unit scales in the float case)."""
        from ...layers.attention import QKVLinear
        from ...layers.linear import Linear, RowLinear
        from ...quantization.layers import (WeightOnlyQuantLinear,
                                            WeightOnlyQuantQKVLinear)
        b = self.blocks
        c = self.config
        if c.n_text_state % 128 or 128 % c.head_dim:
            return False
        if b.mlp1.out_features % c.n_text_state:
            return False
        qkv = getattr(b.attn, "qkv", None)
        mods = [b.attn.dense, b.cross_attn.q_linear, b.cross_attn.dense,
                b.mlp1, b.mlp2]
        if isinstance(qkv, WeightOnlyQuantQKVLinear):
            from ...ops.pallas_decoder_layer import woq_block_eligible
            return woq_block_eligible(qkv, mods, c.n_text_state)
        # plain-float block: QKVLinear with fused (equal-heads) weight +
        # Linear/RowLinear everywhere, tp=1
        if not isinstance(qkv, QKVLinear) or \
                qkv.num_kv_heads != qkv.num_heads:
            return False
        for m in mods:
            if type(m) not in (Linear, RowLinear) \
                    or getattr(m, "tp_size", 1) != 1:
                return False
        return True

    def forward(self, tokens, kv_cache, cross_kv, write_index,
                sequence_length, kv_tail=None,
                tail_len=None,
                beam_indirection=None,
                megakernel_blobs=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tokens [B, L] int32; kv_cache [n_layer,B,2,H,S,hd] (donated =>
        in-place); cross_kv [n_layer,B,2,H,1500,hd]; write_index scalar
        int32; sequence_length [B] int32 (valid length incl. these tokens).
        Returns (logits [B, L, n_vocab] float32, updated kv_cache).

        ``kv_tail`` [Kmax,n_layer,B,2,H,hd] + ``tail_len`` (scalar int32)
        switch single-token decode to K-step deferred-store mode
        (ops.attention write_tail_kv): the cache is NOT written; instead
        the step's fresh K/V is appended to the tail and the return value
        becomes (logits, kv_cache_unchanged, new_tail) — the caller owns
        the merge cadence (merge_tail_kv once per Kmax steps)."""
        c = self.config
        x = self.token_embedding(tokens)
        pos = jax.lax.dynamic_slice(
            self.positional_embedding.value, (write_index, 0),
            (tokens.shape[1], c.n_text_state))
        x = x + pos.astype(x.dtype)

        block = self.blocks
        stacked = block.state_dict()

        # the FULL cache rides the layer scan; each layer writes only its
        # fresh token(s) (profiling showed cache-as-xs/ys costs ~4
        # layer-cache copies per layer per step).  For single-token decode
        # the writes are deferred entirely: the scan collects every
        # layer's fresh K/V and ONE update stores them all (a per-layer
        # one-token dynamic-update-slice costs ~1 us launch overhead).
        layer_ids = jnp.arange(c.n_text_layer, dtype=jnp.int32)
        from ...plugin import get_plugin_config
        unroll = get_plugin_config().get_scan_unroll()
        if (megakernel_blobs is not None and tokens.shape[1] == 1
                and tokens.shape[0]
                <= get_plugin_config().get_megakernel_max_batch()
                and getattr(write_index, "ndim", 0) == 0
                and beam_indirection is None
                and get_plugin_config().use_decode_megakernel()
                and self.megakernel_eligible()):
            # whole-decoder-layer megakernel: every layer's LN / GEMV /
            # attention / GELU / residual in ONE pallas_call (round-4;
            # see ops/pallas_decoder_layer.py for the design record).
            # batch>1 rides the same kernel with per-batch scratch
            # row-blocks (one cross/self cache panel per utterance).
            from ...ops.attention import write_fresh_kv, write_tail_kv
            from ...ops.pallas_decoder_layer import fused_decoder_stack
            cross, cscales = (cross_kv if isinstance(cross_kv, tuple)
                              else (cross_kv, None))
            tail_mode = kv_tail is not None
            # row-uniform length contract: the gate above requires a
            # scalar write_index, so every row is at the same length
            seq1 = jnp.asarray(sequence_length, jnp.int32).reshape(-1)[:1]
            hid, fresh = fused_decoder_stack(
                x[:, 0, :], megakernel_blobs, kv_cache, seq1,
                self.blocks.attn.scale, cross_cache=cross,
                cross_scale=cscales,
                tail_kv=((kv_tail, tail_len) if tail_mode else None),
                head_dim=c.head_dim)
            logits = self._logits(self.ln(hid[:, None, :]))
            if tokens.shape[0] == 1:
                fresh = fresh[:, None]   # [L, 2, H, D] -> [L, 1, 2, H, D]
            if tail_mode:
                new_tail = write_tail_kv(kv_tail, fresh, tail_len)
                return logits, kv_cache, new_tail
            new_kv = write_fresh_kv(kv_cache, fresh[..., None],
                                    write_index)
            return logits, new_kv
        if tokens.shape[1] == 1:
            tail_mode = kv_tail is not None
            cache_arg = ((kv_cache, None, "defer", kv_tail, tail_len)
                         if tail_mode else (kv_cache, None, "defer"))

            # hoist the attention out-proj qweights out of the scan xs:
            # bound whole (stacked [L, K, N]), the fused Pallas decode
            # kernel DMAs the layer panel via its index_map; as scan xs,
            # XLA materialises a per-layer HBM slice copy for the custom
            # call every step (profiled 0.24 ms/step on large-v2 int8)
            hoisted = {}
            cfg = get_plugin_config()
            # batch-1 only, matching _decode_proj_operands/_decode_q_operands
            # (at batch>1 the fusions decline and dense/q_linear run as
            # XLA GEMVs, which need the per-layer sliced weight)
            if tokens.shape[0] == 1 and cfg.use_pallas_decode():
                from ...layers.attention import proj_fusion_hoistable
                if cfg.use_fuse_decode_proj():
                    for mod, base in ((block.attn, "attn.dense."),
                                      (block.cross_attn,
                                       "cross_attn.dense.")):
                        if not proj_fusion_hoistable(mod):
                            continue
                        key = base + (
                            "qweight"
                            if getattr(mod.dense, "qweight", None)
                            is not None else "weight")
                        if key in stacked:
                            hoisted[key] = stacked.pop(key)

            def step(h, scanned):
                layer_params, l = scanned
                params = dict(layer_params)
                params.update(hoisted)
                ca = (cache_arg[:1] + (l,) + cache_arg[2:])
                h, fresh = block.apply(
                    params, h, kv_cache=ca,
                    cross_kv=(cross_kv, l), write_index=write_index,
                    sequence_length=sequence_length,
                    beam_indirection=beam_indirection, use_cache=True)
                return h, fresh

            x, (k_new, v_new) = jax.lax.scan(step, x, (stacked, layer_ids),
                                             unroll=unroll)
            if tail_mode:
                from ...ops.attention import write_tail_kv
                # [L,B,2,H,hd]: drop the L_new=1 seq-minor axis
                kv_new = jnp.stack([k_new, v_new], axis=2)[..., 0]
                new_tail = write_tail_kv(kv_tail, kv_new, tail_len)
                x = self.ln(x)
                return self._logits(x), kv_cache, new_tail
            from ...ops.attention import write_fresh_kv
            kv_new = jnp.stack([k_new, v_new], axis=2)  # [L,B,2,H,1,hd]
            new_kv = write_fresh_kv(kv_cache, kv_new, write_index)
        else:
            def step(carry, scanned):
                h, cache = carry
                layer_params, l = scanned
                h, cache = block.apply(
                    dict(layer_params), h, kv_cache=(cache, l),
                    cross_kv=(cross_kv, l), write_index=write_index,
                    sequence_length=sequence_length, use_cache=True)
                return (h, cache), None

            (x, new_kv), _ = jax.lax.scan(
                step, (x, kv_cache), (stacked, layer_ids))
        x = self.ln(x)
        return self._logits(x), new_kv

    def _logits(self, x):
        c = self.config
        if self.quantize_lm_head:
            # int8 -> compute-dtype convert fuses into the GEMM weight read
            # (same measured-faster pattern as the WOQ linears); scales
            # apply per vocab row on the f32 accumulator
            qw = self.lm_head_qweight.value.astype(x.dtype)
            logits = jnp.einsum("bld,vd->blv", x, qw,
                                preferred_element_type=jnp.float32)
            logits = logits * self.lm_head_scale.value[None, None, :]
        else:
            logits = jnp.einsum("bld,vd->blv", x,
                                self.token_embedding.weight.value,
                                preferred_element_type=jnp.float32)
        if c.padded_vocab != c.n_vocab:
            # the sharded GEMM runs on the padded vocab; the slice back to
            # the logical vocab is the ColumnLinear gather epilogue
            logits = logits[..., :c.n_vocab]
        return logits


def quantize_lm_head_state(dec_state):
    """Add int8 lm-head tensors to a WhisperDecoder state dict built for
    ``quantize_lm_head=True``: symmetric per-vocab-row quantisation of the
    tied embedding (the offline weightOnlyQuantOp equivalent, applied to
    the one matrix the reference's exclude-list spares)."""
    import numpy as np
    w = np.asarray(dec_state["token_embedding.weight"], np.float32)
    amax = np.abs(w).max(axis=1)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale[:, None]), -127, 127).astype(np.int8)
    out = dict(dec_state)
    out["lm_head_qweight"] = q
    out["lm_head_scale"] = scale.astype(np.float32)
    return out

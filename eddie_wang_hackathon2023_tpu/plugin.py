"""Single kernel-recipe config surface.

Counterpart of the reference's ``tensorrt_llm/plugin/plugin.py`` PluginConfig
(``set_gpt_attention_plugin``/``set_gemm_plugin``/... feature flags recorded
per engine build, E/whisper/build.py:137-150): there, plugin choice is a
build-time decision serialized next to the engine so a deployment is
reproducible.  The TPU build picks kernels automatically (hand Pallas vs XLA
per measurement, see docs/parity_checklist.md), which left the recipe spread
over EWT_* env knobs.  ``PluginConfig`` pins those choices in ONE object that:

* is consulted by every kernel-choice site (fused Pallas decode attention,
  int4 dequant GEMM, flash-attention block sizes, fused one-program
  transcribe);
* round-trips through the builder's ``build_config.json`` so a checkpoint
  dir reproduces the exact kernel recipe it was benchmarked with;
* keeps EWT_* env vars as the strongest *runtime* override (set explicitly
  => wins over any config), preserving the bench/debug workflow.

Precedence at each site:  EWT_* env var  >  active PluginConfig field  >
hardware auto-default (``None`` field).
"""
from __future__ import annotations

import contextlib
import dataclasses
import os
from typing import Optional, Tuple

from ._utils import on_tpu


@dataclasses.dataclass
class PluginConfig:
    """Kernel recipe. ``None`` = auto (pick per hardware, the default)."""

    # fused Pallas decode-attention kernel for the cached decode step
    # (ops/pallas_decode_attention.py) vs the XLA einsum formulation
    pallas_decode: Optional[bool] = None
    # fused Pallas int4 dequant-GEMM (ops/pallas_quant_matmul.py) vs XLA
    # unpack (which materialises the int8 weight per call)
    int4_pallas: Optional[bool] = None
    # int4 scale granularity along K (GPTQ-style groups; the CUTLASS
    # fpA_intB path has the same finer-granularity mode,
    # weightOnlyQuantMatmulPlugin.cpp:57).  Per-out-channel int4 measured
    # 18.9% relative WER divergence on Whisper (WER.md) — one 3-bit
    # mantissa over 1280+ rows is too coarse.  None = 128; 0 = per-channel
    int4_group_size: Optional[int] = None
    # flash-attention (block_q, block_k_major, block_k); None = 512,512,512
    flash_blocks: Optional[Tuple[int, int, int]] = None
    # whisper transcribe as ONE jitted mel->tokens program vs the (faster
    # on v5e, see pipeline.transcribe) staged 3-program pipeline
    fused_transcribe: Optional[bool] = None
    # lax.scan unroll factor for the decoder layer stack (cuts per-iteration
    # while-loop sync overhead at the cost of code size); None = 1
    scan_unroll: Optional[int] = None
    # K-step deferred KV tail (ops.attention write_tail_kv): the strided
    # one-column cache store is amortised over K decode steps.  None = auto
    # (8 on TPU, off elsewhere); 0 disables
    decode_tail: Optional[int] = None
    # sequence-panel width of the fused decode-attention kernel (cache
    # streamed in [2,H,D,chunk] blocks with online softmax; panels past
    # the valid length are skipped).  None = 256
    decode_chunk: Optional[int] = None
    # fuse the attention out-projection (int8 weight-only dense) into the
    # Pallas decode-attention kernel epilogue (weight DMA overlaps the
    # cache streaming; kills the separate launch-overhead-bound 1.6 MB
    # GEMV per attention).  Only applies where pallas_decode applies and
    # the dense layer is int8 WOQ, tp=1.  None = on with pallas_decode
    fuse_decode_proj: Optional[bool] = None
    # extend the fused out-projection epilogue to UN-quantised (bf16/f32)
    # dense weights (minors pre-swapped to [K, N] by the layer).  None =
    # ON: the round-3 device A/B measured GPT-350M bf16 bs1 338 vs 289
    # tok/s and Whisper large-v2 bf16 5.35 vs 5.06 utt/s.
    # (Four sibling fusions were measured in the same sweep and DELETED
    # per the adopt-or-delete discipline: the q-projection prologue
    # (760.6 vs 152.7 ms/utt), the QKV prologue (scoped-VMEM compile
    # OOM), pre-LN-into-prologue (died with the prologue) and
    # residual-into-epilogue (155.3-155.8 vs 152.7 ms/utt).)
    fuse_decode_proj_bf16: Optional[bool] = None
    # whole-decoder-layer megakernel (ops/pallas_decoder_layer.py): ONE
    # pallas_call per decode step runs every layer's LN/GEMV/attention/
    # GELU/residual with the hidden state resident in VMEM — removes the
    # ~0.6 ms/step small-op dispatch floor the round-3 trace named.
    # Applies to single-token decode at batch<=8 (per-batch VMEM scratch
    # row-blocks), WOQ-int8 / int4 (per-channel or group-wise, round 5)
    # or plain-float blocks, whisper + GPT/LLaMA/GPT-J-class families
    # (learned/rope positions, layernorm/rmsnorm, plain/gated MLP,
    # sequential/parallel residuals), MQA/GQA at head_dim 128
    # (SantaCoder/StarCoder/GQA-LLaMA class, round 5), bf16/int8/fp8-KV
    # caches, greedy/sampling (beams take the fused per-layer beam
    # kernel instead — see beam_pallas).  None = ON on TPU: the round-4
    # device A/B measured whisper large-v2 woq8 decode 1.66 vs 2.17
    # ms/tok (7.44 vs 6.55 utt/s) on v5e; ineligible or pspec-SHARDED
    # configs fall back to the scanned path automatically
    # (params_cross_device_sharded).
    decode_megakernel: Optional[bool] = None
    # largest batch the megakernel engages for (hard kernel cap 8; larger
    # batches always take the scanned path).  None = 1: the round-4
    # device A/B measured the batch-8 megakernel LOSING 4x on whisper
    # (3.84 vs 15.29 utt/s scanned) and 14% on GPT-350M (2064 vs 2388
    # tok/s @bs8) — at batch>=8 the scanned path's [B,d]x[d,d] GEMMs
    # amortise the weight read across rows on the MXU, while the
    # megakernel still streams every panel per step and serialises the
    # per-row attention scratch.  Batch>1 support stays (token-exact
    # tests, `EWT_MK_MAX_BATCH` opt-in) for latency-bound small-batch
    # deployments; adopt only with a device A/B at that batch size.
    megakernel_max_batch: Optional[int] = None
    # beam decode through the fused Pallas kernel's in-kernel
    # cache_indirection (_beam_kernel: panels streamed once per beam
    # GROUP, row map applied as lane masks — the reference masked-MHA
    # kernel composes the indirection the same way,
    # gptAttentionCommon.cpp:650) vs the XLA masked cross-beam-score
    # formulation.  None = on wherever pallas_decode applies
    beam_pallas: Optional[bool] = None
    # materialise the fused QKV projection's flat [B,L,3*H*D] result
    # (optimization_barrier) before the head split in context/prefill
    # calls, so XLA emits the GEMM in a well-tiled N-minor layout instead
    # of fusing the [.,3,H,64] head reshape (64-lane minor = half-empty
    # tiles) into the GEMM epilogue.  None = off
    qkv_flat_barrier: Optional[bool] = None

    # -- resolution (env > field > auto) ---------------------------------
    def use_pallas_decode(self) -> bool:
        v = os.environ.get("EWT_PALLAS_DECODE")
        if v is not None:
            return v not in ("0", "false", "off")
        if self.pallas_decode is not None:
            return self.pallas_decode
        return on_tpu()

    def use_int4_pallas(self) -> bool:
        if os.environ.get("EWT_INT4_XLA") == "1":
            return False
        if self.int4_pallas is not None:
            return self.int4_pallas
        return on_tpu()

    def get_int4_group_size(self) -> int:
        v = os.environ.get("EWT_INT4_GROUP")
        if v is not None:
            return int(v)
        if self.int4_group_size is not None:
            return self.int4_group_size
        return 128

    def get_flash_blocks(self) -> Tuple[int, int, int]:
        v = os.environ.get("EWT_FLASH_BLOCKS")
        if v is not None:
            return tuple(int(x) for x in v.split(","))  # type: ignore
        if self.flash_blocks is not None:
            return tuple(self.flash_blocks)  # type: ignore
        # device-traced sweep on v5e (benchmarks/flash_sweep.py, encoder
        # [1,20,1536,64]): 0.189 ms/call vs 0.205 at 512,512,512 — a
        # whole-cache k_major block drops the revisit overhead
        return (512, 1536, 512)

    def use_fused_transcribe(self) -> bool:
        v = os.environ.get("EWT_FUSED_E2E")
        if v is not None:
            return v not in ("0", "false", "off")
        return bool(self.fused_transcribe)

    def use_fuse_decode_proj(self) -> bool:
        v = os.environ.get("EWT_FUSE_PROJ")
        if v is not None:
            return v not in ("0", "false", "off")
        if self.fuse_decode_proj is not None:
            return self.fuse_decode_proj
        return True

    def use_fuse_decode_proj_bf16(self) -> bool:
        v = os.environ.get("EWT_FUSE_PROJ_BF16")
        if v is not None:
            return v not in ("0", "false", "off")
        if self.fuse_decode_proj_bf16 is not None:
            return self.fuse_decode_proj_bf16
        return True

    def use_decode_megakernel(self) -> bool:
        v = os.environ.get("EWT_MEGAKERNEL")
        if v is not None:
            return v not in ("0", "false", "off")
        if self.decode_megakernel is not None:
            return self.decode_megakernel
        return on_tpu()

    def get_megakernel_max_batch(self) -> int:
        v = os.environ.get("EWT_MK_MAX_BATCH")
        if v is not None:
            return min(int(v), 8)
        if self.megakernel_max_batch is not None:
            return min(self.megakernel_max_batch, 8)
        return 1

    def use_beam_pallas(self) -> bool:
        v = os.environ.get("EWT_BEAM_PALLAS")
        if v is not None:
            return v not in ("0", "false", "off")
        if self.beam_pallas is not None:
            return self.beam_pallas
        return True

    def use_qkv_flat_barrier(self) -> bool:
        v = os.environ.get("EWT_QKV_BARRIER")
        if v is not None:
            return v not in ("0", "false", "off")
        return bool(self.qkv_flat_barrier)

    def get_scan_unroll(self) -> int:
        v = os.environ.get("EWT_SCAN_UNROLL")
        if v is not None:
            return int(v)
        return self.scan_unroll or 1

    def get_decode_tail(self) -> int:
        v = os.environ.get("EWT_DECODE_TAIL")
        if v is not None:
            return int(v)
        if self.decode_tail is not None:
            return self.decode_tail
        # measured sweep on v5e large-v2 int8 (K=0/8/16/24/32 ->
        # 3.08/2.91/2.68/2.85/3.64 ms/tok): the once-per-K full-cache
        # merge amortises up to K=16, past that the per-step tail
        # attention read + merge slab size win back the loss
        return 16 if on_tpu() else 0

    def get_decode_chunk(self, s_max: Optional[int] = None) -> int:
        v = os.environ.get("EWT_DECODE_CHUNK")
        if v is not None:
            return int(v)
        if self.decode_chunk:
            return self.decode_chunk
        # device-traced sweep (benchmarks/decode_chunk_sweep.py, v5e —
        # re-confirmed round 3 on the current libtpu): large caches
        # (cross 1500-col int8) want 512-wide panels (9.18 vs 9.87
        # us/layer at 256); short-valid self caches want 128 (5.22 vs
        # 6.16 us — less speculative DMA past seq_len).
        # (A fused fc1+act+fc2 Pallas MLP kernel was also tried here and
        # measured 3.13-3.29 ms/tok — XLA's two fused dequant-GEMM
        # dispatches beat the hand kernel, so it was removed.)
        if s_max is not None and s_max >= 1024:
            return 512
        return 128

    # -- (de)serialisation (builder build_config.json) -------------------
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        if d["flash_blocks"] is not None:
            d["flash_blocks"] = list(d["flash_blocks"])
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "PluginConfig":
        kw = {f.name: d[f.name] for f in dataclasses.fields(cls)
              if f.name in d}
        if kw.get("flash_blocks") is not None:
            kw["flash_blocks"] = tuple(kw["flash_blocks"])
        return cls(**kw)


_active = PluginConfig()


def get_plugin_config() -> PluginConfig:
    return _active


def set_plugin_config(cfg: PluginConfig) -> PluginConfig:
    """Install ``cfg`` as the process-wide kernel recipe; returns the old."""
    global _active
    old, _active = _active, cfg
    return old


@contextlib.contextmanager
def plugin_config(**fields):
    """Scoped recipe override: ``with plugin_config(pallas_decode=False):``.

    NOTE: kernel choice happens at trace time — a function already jitted
    under a different recipe keeps its compiled kernels; use distinct
    wrappers (or ``jax.clear_caches``) to re-trace under a new recipe.
    """
    old = set_plugin_config(dataclasses.replace(_active, **fields))
    try:
        yield _active
    finally:
        set_plugin_config(old)

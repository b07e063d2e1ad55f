"""Whole-decoder-layer megakernel for single-token decode (Pallas).

Round-4 evolution of the fused decode-attention kernel
(``pallas_decode_attention.py``): ONE ``pallas_call`` whose grid is
``(n_layer, n_stages)`` executes the ENTIRE transformer stack of a
single decode step — every LayerNorm, the QKV / out / cross-q /
cross-out / fc1 / fc2 weight-only-int8 GEMVs, both attentions (online-
softmax over streamed cache panels), GELU and the residual adds — with
the hidden state living in VMEM scratch across all layers.  Per step,
XLA dispatches ONE kernel for the whole block stack instead of ~30
fusions x 32 layers.

Why this shape (see benchmarks/megakernel_probe*.py, v5e device data):

* a streamed flat [K, N] int8 dequant-GEMV chain inside one kernel runs
  at ~746 GB/s (91% of v5e HBM bw) — faster than XLA's own dequant-GEMV
  stream at the same shapes (6.17 us/panel through XLA's per-op
  dispatch vs 2.20 in-kernel).  The round-1..3 "hand GEMV loses to XLA"
  results were per-op kernels that paid one launch per GEMV; amortising
  the launch over the whole layer stack inverts the outcome.
* head-major [H, K, D] panels are MXU-hostile (~120 GB/s — the same
  pathology that killed round 3's fused cross-q prologue), so every
  GEMV here is flat [K, N] producing a lane-major [1, N] row, and
* attention consumes q through the lane-native fp32 reshape
  ``[1, H*D] -> [H*D//128, 128]`` (supported; the direct
  ``[1,HD] -> [H,1,D]`` cast is rejected by Mosaic layout inference).
  With head_dim 64 each 128-lane row holds a PAIR of heads; scores/
  probabilities are computed per sub-head with lane masks and the KV
  cache's pair view ``[H, D, S] -> [H//2, 128, S]`` is a free
  reinterpretation of the same bytes (row-major [h][d][s]).

Weight layout: all six per-layer matrices decompose into uniform
``[d, d]`` int8 K-major panels (QKV = 3, out-proj = 1, cross-q = 1,
cross-out = 1, fc1 = ffn/d, fc2 = ffn/d), packed once at load time into
``wblob [L, n_panels, d, d]`` (:func:`pack_decoder_blobs`).  The grid's
stage axis walks the panels; Pallas double-buffers each ~1.6 MB panel
DMA against the previous stage's ~2 us of compute.  Attention stages
hold their BlockSpec index at the *next* weight panel so its DMA gets
extra slack, and the cache index maps clamp panels past the valid
length so their DMA is elided (the round-2 chunk-skipping trick).

Reference counterpart: this subsumes what TensorRT does with a fully
fused engine execution — the decoderMaskedMultiheadAttention kernels
(``C/tensorrt_llm/kernels/decoderMaskedMultiheadAttention/``), the
weightOnlyQuantMatmul plugin GEMVs and TRT's own layer fusion, executed
as one enqueue per step (``C/tensorrt_llm/runtime/gptSession.cpp:782``).

Scope (fallbacks handle the rest): batch <= 8 (one fresh token per
row, rows advance together; per-batch VMEM scratch row-blocks — see
``fused_decoder_stack``), weight-only int8 (per-out-channel scales) or
plain float, equal q/kv heads, head_dim in {32, 64, 128}, d % 128 == 0
(ffn is zero-padded to the next multiple of d by the packer), optional
cross attention, bf16/f32 activations, self cache bf16 or int8
(+scales), cross cache bf16 or int8 (+per-layer scales), no beam
indirection.

Round-4 family extensions (LLaMA/GPT-J/NeoX-class decoders):

* **RoPE** rides the kernel as ONE [128, 128] rotation matrix input
  built per step from the decode position (:func:`make_rope_matrix`):
  because every head shares the same per-dim frequencies, the
  block-diagonal per-head rotation is identical for both heads of a
  lane row, so q and the fresh k each rotate with a single
  [HP, DL] x [DL, DL] MXU dot — no lane shuffles, which Mosaic would
  reject on packed vectors.  Covers neox-paired and GPT-J-interleaved
  styles and partial rotary_dim (identity tail block).
* **RMSNorm** (no mean subtraction, no bias) as a norm flavour.
* **Gated MLP** (LLaMA SwiGLU): a third per-layer panel family "fcg"
  multiplies the activated fc1 slices in VMEM (h = act(fc1(x)) *
  gate(x), the layers.GatedMLP contract).
* **Parallel-attention residual** (GPT-J/NeoX): the MLP reads the SAME
  input LayerNorm (held in VMEM scratch through the dense stage) and
  there is a single residual add — expressed as: the dense stage skips
  the post-LN refresh.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30

# weight-panel slots (wblob axis 1) and aux-row slots, with cross:
#   panels: 0..2 q/k/v, 3 dense, 4 cross_q, 5 cross_dense,
#           6..6+nf-1 fc1, 6+nf..6+2nf-1 fc2
# without cross: 0..2 q/k/v, 3 dense, 4..4+nf-1 fc1, then fc2.
# pair-aux (scale/bias in [HP, DL] layout) slots: 0 q, 1 k, 2 v
# (, 3 cross_q); flat-aux slots: 0 dense (, 1 cross_dense), then fc1
# slices, then one fc2 slot.  LN rows: 2 per norm in block order.


class MegakernelBlobs(NamedTuple):
    """Packed per-layer weights/params for :func:`fused_decoder_stack`."""
    wblob: jax.Array        # [L, NPAN, d, d] int8 (int4: [L, NPAN, d/2, d]
    #                         nibble-packed in the half-split order of
    #                         ops.quant_matmul.quantize_weights_int4)
    pair_scale: jax.Array   # [L, NQ, HP, DL] f32
    pair_bias: jax.Array    # [L, NQ, HP, DL] f32
    flat_scale: jax.Array   # [L, NF, d] f32
    flat_bias: jax.Array    # [L, NF, d] f32
    ln_par: jax.Array       # [L, 2*n_ln, d] f32
    kv_oq: jax.Array        # [L] f32 (self-KV quantize scale; ones if float)
    kv_qo: jax.Array        # [L] f32 (self-KV dequantize scale)
    # int4 group-wise scales [L, NPAN, NG, d] f32 (GPTQ-style groups
    # along each panel's K rows, ref CUTLASS fpA_intB finer-granularity
    # mode weightOnlyQuantMatmulPlugin.cpp:57); None for int8/float and
    # per-out-channel int4 (those ride pair_scale/flat_scale)
    gscale: Optional[jax.Array] = None


def _stages(nf: int, ncs: int, ncc: int, with_cross: bool,
            gated: bool = False, grouped: bool = False):
    # grouped (MQA/GQA): K and V are one combined zero-padded panel
    # (2*dkv <= d always holds for rep >= 2), one stage fewer
    st = [("q",), ("kv",)] if grouped else [("q",), ("k",), ("v",)]
    st += [("selfattn", c) for c in range(ncs)]
    st += [("dense",)]
    if with_cross:
        st += [("crossq",)]
        st += [("crossattn", c) for c in range(ncc)]
        st += [("crossdense",)]
    st += [("fc1", j) for j in range(nf)]
    if gated:
        st += [("fcg", j) for j in range(nf)]
    st += [("fc2", j) for j in range(nf)]
    return st


def _panel_of(stage, nf: int, with_cross: bool,
              gated: bool = False, grouped: bool = False) -> Optional[int]:
    kind = stage[0]
    if kind == "q":
        return 0
    if grouped:
        if kind == "kv":
            return 1
        if kind == "dense":
            return 2
        base = 3
        assert not with_cross, "grouped megakernel is decoder-only"
    else:
        if kind == "k":
            return 1
        if kind == "v":
            return 2
        if kind == "dense":
            return 3
        base = 4
        if with_cross:
            if kind == "crossq":
                return 4
            if kind == "crossdense":
                return 5
            base = 6
    if kind == "fc1":
        return base + stage[1]
    if kind == "fcg":
        return base + nf + stage[1]
    if kind == "fc2":
        return base + (2 * nf if gated else nf) + stage[1]
    return None  # attention stages consume no weight panel


def make_rope_matrix(position, head_dim: int, rotary_dim: int,
                     theta: float, neox_style: bool, nsub: int):
    """[nsub*head_dim, nsub*head_dim] f32 rotation matrix R such that
    ``row @ R`` applies :func:`functional.rope` at ``position`` to every
    head packed in a 128-lane row (nsub = 128 // head_dim identical
    per-head blocks).  Pure jnp on a traced position scalar — built
    outside the kernel each decode step (~128x128, negligible)."""
    D, rd = head_dim, rotary_dim
    half = rd // 2
    f32 = jnp.float32
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=f32) / half))
    ang = jnp.asarray(position, f32) * freqs                 # [half]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    i = jnp.arange(half)
    r = jnp.zeros((D, D), f32)
    if neox_style:
        r = r.at[i, i].set(cos).at[i + half, i + half].set(cos)
        r = r.at[i, i + half].set(sin).at[i + half, i].set(-sin)
    else:  # GPT-J interleaved pairs (2i, 2i+1)
        r = r.at[2 * i, 2 * i].set(cos).at[2 * i + 1, 2 * i + 1].set(cos)
        r = r.at[2 * i, 2 * i + 1].set(sin).at[2 * i + 1, 2 * i].set(-sin)
    if rd < D:
        j = jnp.arange(rd, D)
        r = r.at[j, j].set(1.0)
    if nsub == 1:
        return r
    return jnp.kron(jnp.eye(nsub, dtype=f32), r)


# manual weight-stream ring sizing (ADVICE r4 high): the ring must be
# bounded by a VMEM budget, not by divisor structure — gated-MLP stacks
# make npan prime (13 at LLaMA-7B nf=3) and an npan-sized ring at d=4096
# is 218 MB of int8 panels.  Depth beyond a handful of panels buys
# nothing once the DMA engine is saturated (the adopted round-4 config
# ran 7 slots), so cap at 8 slots / ~24 MB and let the global-counter
# slot indexing handle arbitrary npan.
_RING_BUDGET = 24 << 20
_RING_HARD_CAP = 48 << 20


def _pick_nbuf(npan: int, panel_bytes: int) -> int:
    """VMEM ring slots for the manual weight stream: >= 2 (double
    buffer), <= 8, and ring bytes bounded by ``_RING_BUDGET``.
    ``EWT_MK_NBUF`` overrides for ring-depth experiments (clamped to
    npan and the 100 MB kernel VMEM limit's practical ceiling)."""
    import os
    v = os.environ.get("EWT_MK_NBUF")
    if v:
        return max(2, min(int(v), npan))
    return min(npan, 8, max(2, _RING_BUDGET // panel_bytes))


def params_cross_device_sharded(params) -> bool:
    """True when any bound parameter is partitioned across >1 devices
    (pspec-sharded TP/DP state).  The megakernel is a single-core
    program: its pallas_call cannot be SPMD-partitioned, so a sharded
    model must take the scanned path (whose einsums XLA partitions with
    the usual ICI collectives).  The structural eligibility checks can't
    see jax shardings — this runtime check closes that gap (a sharded
    blob pack would otherwise force a full-weight allgather per step or
    a partitioner error on the first tp>1 run)."""
    for v in params.values():
        sh = getattr(v, "sharding", None)
        if sh is None:
            continue
        try:
            if len(sh.device_set) > 1 and not sh.is_fully_replicated:
                return True
        except AttributeError:
            continue
    return False


def woq_block_eligible(qkv, mods, hidden: int,
                       allow_int4: bool = True) -> bool:
    """Shared WOQ eligibility check for the megakernel gates: every
    projection uniformly int8 per-out-channel, OR uniformly int4
    (per-out-channel or group-wise with the group dividing d/2 - each
    K-group must live in one nibble plane), tp=1.  Round 5 widened this
    from int8-only: int4 panels stream HALF the HBM bytes and unpack in
    VMEM (_unpack4/gemv), the same trade the reference CUTLASS
    fpA_intB path makes (fpA_intB_gemm.h:53-90).

    ``allow_int4``: the r5 device A/Bs SPLIT on int4 - whisper large-v2
    megakernel 6.89 vs 4.62 utt/s scanned (ADOPTED: the cross-attention
    stages hide the VPU unpack behind cache DMA), but gated LLaMA-1B
    88 vs 233 tok/s (LOST: back-to-back GEMV stages leave the 16-group
    unpack exposed) - decoder-only models pass False and keep the
    scanned path for int4."""
    from ..quantization.layers import WeightOnlyQuantLinear
    bits = {qkv.bits} | {getattr(m, "bits", None) for m in mods}
    if bits == {4} and not allow_int4:
        return False
    if bits not in ({8}, {4}):
        return False
    groups = {qkv.group_size} | {getattr(m, "group_size", None)
                                 for m in mods}
    if len(groups) != 1:
        return False
    gs = groups.pop()
    if gs and (8 in bits or hidden % (2 * gs)):
        # the group must divide HALF of d: each K-group has to live
        # wholly in one nibble plane of the half-split packing so the
        # grouped GEMV needs no materialised [d, d] concat (gemv)
        return False
    for m in mods:
        if not isinstance(m, WeightOnlyQuantLinear) \
                or getattr(m, "tp_size", 1) != 1:
            return False
    return True


def _stage_lookup(s, values):
    """values[s] for a static python list, expressed as scalar step-function
    arithmetic (index maps may not capture constant arrays)."""
    out = jnp.asarray(values[0], jnp.int32)
    for i in range(1, len(values)):
        dlt = values[i] - values[i - 1]
        if dlt:
            out = out + dlt * (s >= i).astype(jnp.int32)
    return out


def _hold_next(values):
    """Fill None entries with the next non-None value (so attention
    stages prefetch the upcoming weight panel); trailing Nones get the
    last panel (held, no DMA)."""
    out = list(values)
    nxt = None
    for i in reversed(range(len(out))):
        if out[i] is None:
            out[i] = nxt if nxt is not None else 0
        else:
            nxt = out[i]
    return out


def _kernel(slen_ref, start_ref, tlen_ref, kvoq_ref, kvqo_ref, cscale_ref,
            # inputs
            x_ref, w_ref, ps_ref, pb_ref, fs_ref, fb_ref, ln_ref,
            selfc_ref, *rest,
            stages, nf: int, ncs: int, ncc: int, with_cross: bool,
            d: int, hp: int, dl: int, hd: int, nsub: int, nb: int,
            cs_s: int, cs_c: int, s_self: int, s_cross: int,
            scale: float, self_quant: bool, cross_quant: bool,
            self_fp8: bool,
            with_tail: bool, kmax: int, adt, eps: float, act: str,
            norm: str = "layernorm", gated: bool = False,
            parallel: bool = False, with_rope: bool = False,
            manual: bool = False, nbuf: int = 0, npan: int = 0,
            n_layer: int = 0, w4: bool = False, ng: int = 0,
            hpk: int = 0):
    hpk = hpk or hp                  # kv pair-rows (MQA/GQA: hpk < hp)
    rep = hp // hpk                  # query heads per kv head
    grouped = rep > 1
    dkv = hpk * dl
    if with_cross:
        crossc_ref = rest[0]
        rest = rest[1:]
    if with_tail:
        tail_ref = rest[0]
        rest = rest[1:]
    if with_rope:
        rope_ref = rest[0]
        rest = rest[1:]
    if ng:
        gsc_ref = rest[0]                 # [1, 1, NG, d] current panel
        rest = rest[1:]
    hid_ref, fresh_ref = rest[0], rest[1]
    if manual:
        wbuf, wsem = rest[-2], rest[-1]
        rest = rest[:-2]
    (x_scr, ln_scr, q_scr, kf_scr, vf_scr, m_scr, d_scr, ctx_scr,
     h_scr, acc_scr) = rest[2:]

    l = pl.program_id(0)
    s = pl.program_id(1)
    f32 = jnp.float32

    # -- manual weight stream (round 4): the blob stays in HBM; panels
    # ride a nbuf-slot circular VMEM buffer with explicit async copies
    # started DEPTH = nbuf-1 consumptions ahead.  The BlockSpec pipeline
    # can only prefetch ONE stage ahead, so during the 2-5 attention
    # stages per layer the weight DMA engine idled; with the stream
    # decoupled from the stage grid it runs back-to-back.
    if manual:
        depth = nbuf - 1

        def _slot(dlay, c):
            # ring slots are indexed by the GLOBAL panel counter
            # (l*npan + c), so nbuf need not divide npan — gated MLP
            # shapes make npan prime (e.g. 13 at LLaMA nf=3) and a
            # divisor-sized ring at d=4096 would exceed physical VMEM
            return jax.lax.rem((l + dlay) * npan + c, nbuf)

        def _dma(dlay, c):
            sl = _slot(dlay, c)
            return pltpu.make_async_copy(
                w_ref.at[l + dlay, c], wbuf.at[sl], wsem.at[sl])

        def _start_ahead(c):
            nc = c + depth
            if nc < npan:
                _dma(0, nc).start()
            else:
                @pl.when(l + 1 < n_layer)
                def _():
                    # (l+1)*npan + (nc-npan) == l*npan + nc: the slot is
                    # the same global counter as the in-layer branch
                    _dma(1, nc - npan).start()

        def _wait_panel(c):
            # byte-count wait: the reconstructed copy has the same shape
            # as the start (which may have used l+1 at a layer boundary)
            _dma(0, c).wait()

    lane = jax.lax.broadcasted_iota(jnp.int32, (hp, dl), 1)
    sub_masks = [(lane // hd) == u for u in range(nsub)]
    # 3-D mask twins for the [HP, 1, DL] query — built by iota, never by
    # reshaping the 2-D mask (packed-vector shape casts are what Mosaic
    # rejects; see module docstring)
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (hp, 1, dl), 2)
    sub_masks3 = [(lane3 // hd) == u for u in range(nsub)]

    # batch>1 (round 4): every per-token scratch keeps the batch as
    # leading row-blocks ([NB*HP, ...]) so per-batch work is a sublane
    # slice — no in-kernel transposes, and nb=1 emits exactly the
    # original program.  GEMVs become [NB, d] GEMMs for free.
    def tile_rows(a):
        """[HP, DL] per-pair aux -> [NB*HP, DL] (repeat per batch)."""
        if nb == 1:
            return a
        return jnp.broadcast_to(a[None], (nb,) + a.shape).reshape(
            nb * a.shape[0], a.shape[1])

    def rot_rows(val, nrow):
        """Apply the per-row rotation matrix to a pair-layout
        [NB*nrow, DL] projection (q or fresh k) — fp32 rotate, cast
        back, matching functional.rope's dtype contract."""
        rows = []
        for b in range(nb):
            rows.append(jax.lax.dot(
                val[b * nrow:(b + 1) * nrow].astype(f32), rope_ref[b],
                preferred_element_type=f32))
        r = rows[0] if nb == 1 else jnp.concatenate(rows, axis=0)
        return r.astype(adt)

    def ln_to_scr(row: int):
        xf = x_scr[...].astype(f32)
        if norm == "rmsnorm":
            var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
            y = xf * jax.lax.rsqrt(var + eps)
        else:
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * ln_ref[0, 2 * row:2 * row + 1, :] \
            + ln_ref[0, 2 * row + 1:2 * row + 2, :]
        ln_scr[...] = y.astype(adt)

    def rope_rotate(val):
        """[NB, DL, DL] rotation (positions can differ per batch row
        under left-padding) applied to the q rows [NB*HP, DL]."""
        return rot_rows(val, hp)

    def _panel(c):
        """The current stage's weight panel (VMEM): [d, d] int8/float,
        or [d/2, d] nibble-packed int4."""
        if manual:
            return wbuf[_slot(0, c)]
        return w_ref[0, 0]

    def _unpack4(c):
        """Sign-extended nibble planes of an int4 panel: (lo, hi) [d/2, d]
        in the activation dtype — K rows [0, d/2) and [d/2, d) of the
        half-split packing.  Shifts run in int32 (Mosaic legalizes
        arith.shli on i32 only — i8 shifts fail with 'failed to
        legalize' on device); the first formulation additionally
        materialised a [d, d] concat plus per-group scaled-slice concats
        and sank its device A/B at 1.15 vs 4.62 utt/s — gemv now
        consumes the planes via split dots with no concat."""
        p = _panel(c).astype(jnp.int32)                  # [d/2, d]
        lo = ((p << 28) >> 28).astype(adt)
        hi = ((p << 24) >> 28).astype(adt)
        return lo, hi

    def _weight(c):
        """Dequantised [d, d] panel in the activation dtype (used by the
        out-projection's row-sliced pair dots; the GEMV stages consume
        the planes without materialising the concat — see gemv)."""
        if not w4:
            return _panel(c).astype(adt)
        lo, hi = _unpack4(c)
        w = jnp.concatenate([lo, hi], axis=0)            # [d, d]
        if ng:
            gsz = d // ng
            gs_blk = gsc_ref[0, 0]                       # [NG, d]
            parts = [w[g * gsz:(g + 1) * gsz, :]
                     * gs_blk[g:g + 1, :].astype(adt) for g in range(ng)]
            w = jnp.concatenate(parts, axis=0)
        return w

    def gemv(lhs, c):
        if not w4:
            return jax.lax.dot(lhs, _panel(c).astype(adt),
                               preferred_element_type=f32)
        lo, hi = _unpack4(c)
        if ng:
            # group-wise scales: each K-group lives wholly in one nibble
            # plane (the packer asserts gsz | d/2), so the dequant is a
            # per-group [gsz, d] scale-mul + one K=gsz dot — NO
            # materialised [d, d] concat
            gsz = d // ng
            gs_blk = gsc_ref[0, 0]                       # [NG, d]
            half = ng // 2
            acc = None
            for g in range(ng):
                plane = lo if g < half else hi
                r0 = (g - (half if g >= half else 0)) * gsz
                wg = plane[r0:r0 + gsz, :] * gs_blk[g:g + 1, :].astype(adt)
                part = jax.lax.dot(lhs[:, g * gsz:(g + 1) * gsz], wg,
                                   preferred_element_type=f32)
                acc = part if acc is None else acc + part
            return acc
        # per-channel: two half-K dots straight off the nibble planes
        # (post-dot fp32 scale rides the existing pair/flat slots)
        return jax.lax.dot(lhs[:, :d // 2], lo,
                           preferred_element_type=f32) + \
            jax.lax.dot(lhs[:, d // 2:], hi,
                        preferred_element_type=f32)

    def qkv_stage(slot: int, c: int):
        """q/k/v/cross-q projection: flat GEMV -> pair layout -> scale,
        bias (matching WeightOnlyQuant*Linear numerics: fp32 acc * scale
        -> activation dtype -> + bias)."""
        acc = gemv(ln_scr[...], c)                       # [NB, d] f32
        accp = acc.reshape(nb * hp, dl)                  # lane-native
        val = (accp * tile_rows(ps_ref[0, slot])).astype(adt) \
            + tile_rows(pb_ref[0, slot]).astype(adt)     # [NB*HP, DL]
        return val

    def kv_stage(c: int):
        """Grouped (MQA/GQA) combined K+V projection: one [d, d] panel
        whose first 2*dkv out-columns hold K then V weights (packer
        contract, rest zero); slice per slot, scale/bias, rope on K."""
        acc = gemv(ln_scr[...], c)                       # [NB, d] f32
        for i, slot in ((0, 1), (1, 2)):
            part = acc[:, i * dkv:(i + 1) * dkv].reshape(nb * hpk, dl)
            val = (part * tile_rows(ps_ref[0, slot, :hpk])).astype(adt) \
                + tile_rows(pb_ref[0, slot, :hpk]).astype(adt)
            if i == 0 and with_rope:
                val = rot_rows(val, hpk)
            store_fresh(i, val)

    def store_fresh(slot: int, val):
        """Quantize exactly as ops.attention.cast_kv_for_cache and keep
        the stored values (f32) for the in-kernel fresh contribution."""
        tgt = kf_scr if slot == 0 else vf_scr
        if self_quant:
            scaled = val.astype(f32) * kvoq_ref[l]
            q = jnp.clip(jnp.trunc(scaled + jnp.where(scaled >= 0, .5, -.5)),
                         -128, 127)
            fresh_ref[0, slot] = q.astype(fresh_ref.dtype)
            tgt[...] = q
        elif self_fp8:
            # fp8 e4m3 KV (ref QuantMode.FP8_KV_CACHE): IEEE-saturating
            # cast; the scratch keeps the POST-cast value so the fresh
            # contribution matches a write-then-read exactly
            scaled = val.astype(f32) * kvoq_ref[l]
            q = scaled.astype(jnp.float8_e4m3fn)
            fresh_ref[0, slot] = q
            tgt[...] = q.astype(f32)
        else:
            fresh_ref[0, slot] = val.astype(fresh_ref.dtype)
            tgt[...] = val.astype(f32)

    def attn_chunk(c: int, is_cross: bool):
        cache = (crossc_ref if is_cross else selfc_ref)[0]  # [NB,2,HP,DL,cs]
        cs = cs_c if is_cross else cs_s
        smax = s_cross if is_cross else s_self
        nch = ncc if is_cross else ncs
        if is_cross:
            kscale = cscale_ref[l] if cross_quant else 1.0
            cache_len = smax                      # cross attends all cols
        else:
            kscale = kvqo_ref[l] if (self_quant or self_fp8) else 1.0
            cache_len = slen_ref[0] - 1           # fresh token not in cache
            if with_tail:
                cache_len = cache_len - tlen_ref[0]

        if c == 0:
            m_scr[...] = jnp.full(m_scr.shape, NEG, f32)
            d_scr[...] = jnp.zeros(d_scr.shape, f32)
            ctx_scr[...] = jnp.zeros(ctx_scr.shape, f32)

        n_need = jnp.maximum(jax.lax.div(cache_len + cs - 1, cs), 1)

        @pl.when(c < n_need)
        def _compute():
            if grouped and not is_cross:
                # MQA/GQA (nsub==1): per kv head, the rep query rows of
                # its group ride the dot's row dimension — the cache
                # keeps hpk rows and is streamed once, no head repeat
                pos2 = c * cs + jax.lax.broadcasted_iota(
                    jnp.int32, (1, cs), 1)
                for b in range(nb):
                    o = b * hp
                    kp = cache[b, 0].astype(adt)        # [hpk, dl, cs]
                    vp = cache[b, 1].astype(adt)
                    if smax % cs:
                        col3 = c * cs + jax.lax.broadcasted_iota(
                            jnp.int32, (hpk, dl, cs), 2)
                        vp = jnp.where(col3 < smax, vp, 0)
                    valid2 = jnp.logical_and(pos2 < cache_len,
                                             pos2 >= start_ref[b])
                    for gk in range(hpk):
                        r0, r1 = o + gk * rep, o + (gk + 1) * rep
                        q2 = q_scr[r0:r1, 0, :]         # [rep, dl]
                        sc = jax.lax.dot(q2, kp[gk],
                                         preferred_element_type=f32)
                        sc = jnp.where(valid2, sc * (scale * kscale), NEG)
                        m_prev = m_scr[r0:r1, 0:1]      # [rep, 1]
                        m_new = jnp.maximum(
                            m_prev, jnp.max(sc, axis=1, keepdims=True))
                        p = jnp.where(valid2, jnp.exp(sc - m_new), 0.0)
                        alpha = jnp.exp(m_prev - m_new)
                        d_scr[r0:r1, 0:1] = d_scr[r0:r1, 0:1] * alpha \
                            + jnp.sum(p, axis=1, keepdims=True)
                        pv = jax.lax.dot_general(
                            p.astype(adt), vp[gk],
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=f32)  # [rep, dl]
                        ctx_scr[r0:r1] = ctx_scr[r0:r1] * alpha + pv
                        m_scr[r0:r1, 0:1] = m_new
                return
            col = None
            if smax % cs:
                col = c * cs + jax.lax.broadcasted_iota(
                    jnp.int32, (hp, dl, cs), 2)
            pos = c * cs + jax.lax.broadcasted_iota(jnp.int32, (hp, 1, cs), 2)
            for b in range(nb):
                o = b * hp
                k = cache[b, 0].astype(adt)              # [HP, DL, cs]
                v = cache[b, 1].astype(adt)
                if col is not None:
                    v = jnp.where(col < smax, v, 0)
                start = 0 if is_cross else start_ref[b]
                valid = jnp.logical_and(pos < cache_len, pos >= start)
                qv = q_scr[o:o + hp]                     # [HP, 1, DL]
                for u in range(nsub):
                    qs = jnp.where(sub_masks3[u], qv, 0)
                    sc = jax.lax.dot_general(
                        qs, k,
                        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=f32)      # [HP, 1, cs]
                    sc = jnp.where(valid, sc * (scale * kscale), NEG)
                    m_prev = m_scr[o:o + hp, u:u + 1]
                    m_new = jnp.maximum(m_prev, jnp.max(sc, axis=2))
                    p = jnp.where(valid, jnp.exp(sc - m_new[:, :, None]), 0.0)
                    alpha = jnp.exp(m_prev - m_new)      # [HP, 1]
                    d_scr[o:o + hp, u:u + 1] = \
                        d_scr[o:o + hp, u:u + 1] * alpha + jnp.sum(p, axis=2)
                    pv = jax.lax.dot_general(
                        v, p.astype(adt),
                        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                        preferred_element_type=f32)[:, :, 0]  # [HP, DL]
                    ctx_scr[o:o + hp] = jnp.where(
                        sub_masks[u], ctx_scr[o:o + hp] * alpha + pv,
                        ctx_scr[o:o + hp])
                    m_scr[o:o + hp, u:u + 1] = m_new

        if c == nch - 1:
            # finalize — always runs on the last (static) chunk stage
            if is_cross:
                for u in range(nsub):
                    du = d_scr[:, u:u + 1]             # [NB*HP, 1]
                    ctx_scr[...] = jnp.where(
                        tile_rows(sub_masks[u]),
                        ctx_scr[...] * (kscale / du), ctx_scr[...])
            elif grouped:
                # MQA/GQA finalize: fresh K/V (and tail) live at hpk
                # rows; each kv head's rep query rows share them
                for b in range(nb):
                    o, ok = b * hp, b * hpk
                    for gk in range(hpk):
                        r0, r1 = o + gk * rep, o + (gk + 1) * rep
                        qf = q_scr[r0:r1, 0, :].astype(f32)   # [rep, dl]
                        kf = kf_scr[ok + gk:ok + gk + 1]      # [1, dl]
                        pvf = vf_scr[ok + gk:ok + gk + 1]
                        sf = jnp.sum(qf * kf, axis=1,
                                     keepdims=True) * (scale * kscale)
                        m = m_scr[r0:r1, 0:1]
                        du = d_scr[r0:r1, 0:1]
                        if with_tail:
                            t = tail_ref[:, 0, b]      # [Kmax, 2, hpk, dl]
                            tk = t[:, 0, gk].astype(adt)      # [Kmax, dl]
                            tv = t[:, 1, gk].astype(adt)
                            qa = q_scr[r0:r1, 0, :]           # [rep, dl]
                            st = jax.lax.dot_general(
                                qa, tk,
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=f32)   # [rep, Kmax]
                            tmask = jax.lax.broadcasted_iota(
                                jnp.int32, (1, kmax), 1) < tlen_ref[0]
                            st = jnp.where(tmask, st * (scale * kscale),
                                           NEG)
                            m_fin = jnp.maximum(jnp.maximum(
                                m, jnp.max(st, axis=1, keepdims=True)), sf)
                            alpha = jnp.exp(m - m_fin)
                            p_t = jnp.where(tmask, jnp.exp(st - m_fin), 0.0)
                            pf = jnp.exp(sf - m_fin)
                            denom = du * alpha + \
                                jnp.sum(p_t, axis=1, keepdims=True) + pf
                            ctx_t = jax.lax.dot(
                                p_t.astype(adt), tv,
                                preferred_element_type=f32)   # [rep, dl]
                            ctx_new = ((ctx_scr[r0:r1] * alpha + ctx_t)
                                       * kscale + pvf * (kscale * pf)) \
                                / denom
                        else:
                            m_fin = jnp.maximum(m, sf)
                            alpha = jnp.exp(m - m_fin)
                            pf = jnp.exp(sf - m_fin)
                            denom = du * alpha + pf
                            ctx_new = (ctx_scr[r0:r1] * alpha * kscale
                                       + pvf * (kscale * pf)) / denom
                        ctx_scr[r0:r1] = ctx_new
            else:
                # fresh-token contribution (the deferred-write decode
                # contract of pallas_decode_attention with_fresh), plus
                # the K-step deferred tail when enabled (write_tail_kv)
                for b in range(nb):
                    o = b * hp
                    qf = q_scr[o:o + hp, 0, :].astype(f32)    # [HP, DL]
                    pk = qf * kf_scr[o:o + hp]                # [HP, DL]
                    pvf = vf_scr[o:o + hp]
                    if with_tail:
                        t = tail_ref[:, 0, b]          # [Kmax, 2, HP, DL]
                        tk = jnp.transpose(t[:, 0], (1, 0, 2)).astype(adt)
                        tv = jnp.transpose(t[:, 1], (1, 0, 2)).astype(adt)
                        tpos = jax.lax.broadcasted_iota(
                            jnp.int32, (hp, 1, kmax), 2)
                        tmask = tpos < tlen_ref[0]
                        qv = q_scr[o:o + hp]           # [HP, 1, DL]
                    for u in range(nsub):
                        sf = jnp.sum(jnp.where(sub_masks[u], pk, 0.0),
                                     axis=1, keepdims=True) * (scale * kscale)
                        m = m_scr[o:o + hp, u:u + 1]
                        du = d_scr[o:o + hp, u:u + 1]
                        if with_tail:
                            qs = jnp.where(sub_masks3[u], qv, 0)
                            st = jax.lax.dot_general(
                                qs, tk,
                                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=f32)   # [HP, 1, Kmax]
                            st = jnp.where(tmask, st * (scale * kscale), NEG)
                            m_fin = jnp.maximum(
                                jnp.maximum(m, jnp.max(st, axis=2)), sf)
                            alpha = jnp.exp(m - m_fin)
                            p_t = jnp.where(
                                tmask, jnp.exp(st - m_fin[:, :, None]), 0.0)
                            pf = jnp.exp(sf - m_fin)
                            denom = du * alpha + jnp.sum(p_t, axis=2) + pf
                            ctx_t = jax.lax.dot_general(
                                p_t.astype(adt), tv,
                                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)[:, 0, :]
                            ctx_new = ((ctx_scr[o:o + hp] * alpha + ctx_t)
                                       * kscale + pvf * (kscale * pf)) / denom
                        else:
                            m_fin = jnp.maximum(m, sf)
                            alpha = jnp.exp(m - m_fin)
                            pf = jnp.exp(sf - m_fin)          # [HP, 1]
                            denom = du * alpha + pf
                            ctx_new = (ctx_scr[o:o + hp] * alpha * kscale
                                       + pvf * (kscale * pf)) / denom
                        ctx_scr[o:o + hp] = jnp.where(
                            sub_masks[u], ctx_new, ctx_scr[o:o + hp])

    def proj_stage(flat_slot: int, ln_next: Optional[int], c: int = 0):
        """Attention out-projection from the pair-layout context: per-pair
        [1, DL] x [DL, d] dots (the proven fused-epilogue pattern), then
        scale/bias/residual, then the next LayerNorm."""
        wbf = _weight(c)                                 # [d, d]
        ctx = ctx_scr[...].astype(adt)                   # [NB*HP, DL]
        rows = []
        for b in range(nb):
            acc = None
            for p in range(hp):
                r = b * hp + p
                part = jax.lax.dot(ctx[r:r + 1, :],
                                   wbf[p * dl:(p + 1) * dl, :],
                                   preferred_element_type=f32)
                acc = part if acc is None else acc + part
            rows.append(acc)
        acc = rows[0] if nb == 1 else jnp.concatenate(rows, axis=0)
        out = (acc * fs_ref[0, flat_slot:flat_slot + 1, :]).astype(adt) \
            + fb_ref[0, flat_slot:flat_slot + 1, :].astype(adt)
        x_scr[...] = x_scr[...] + out
        if ln_next is not None:
            ln_to_scr(ln_next)

    def fc1_stage(j: int, flat_slot: int, c: int = 0):
        acc = gemv(ln_scr[...], c)
        hv = (acc * fs_ref[0, flat_slot:flat_slot + 1, :]).astype(adt) \
            + fb_ref[0, flat_slot:flat_slot + 1, :].astype(adt)
        if act == "relu":
            hv = jnp.maximum(hv, 0)
        elif act == "gelu_exact":
            hv = jax.nn.gelu(hv, approximate=False)
        elif act == "silu":
            # f32 logistic: Mosaic's bf16 `logistic` lowering emits an
            # ill-typed f32->bf16 vector.broadcast on the current libtpu
            # (device-verified failure, r4 suite llama rows)
            hvf = hv.astype(jnp.float32)
            hv = (hvf * jax.lax.logistic(hvf)).astype(adt)
        else:
            hv = jax.nn.gelu(hv, approximate=True)
        h_scr[:, j * d:(j + 1) * d] = hv

    def fcg_stage(j: int, flat_slot: int, c: int = 0):
        """Gated-MLP gate slice: h_j *= gate_j(ln_x) (layers.GatedMLP:
        act(fc(x)) * gate(x) — activation on fc only)."""
        acc = gemv(ln_scr[...], c)
        gv = (acc * fs_ref[0, flat_slot:flat_slot + 1, :]).astype(adt) \
            + fb_ref[0, flat_slot:flat_slot + 1, :].astype(adt)
        h_scr[:, j * d:(j + 1) * d] = h_scr[:, j * d:(j + 1) * d] * gv

    def fc2_stage(j: int, flat_slot: int, last: bool, c: int = 0):
        part = gemv(h_scr[:, j * d:(j + 1) * d], c)
        if j == 0:
            acc_scr[...] = part
        else:
            acc_scr[...] = acc_scr[...] + part
        if last:
            out = (acc_scr[...]
                   * fs_ref[0, flat_slot:flat_slot + 1, :]).astype(adt) \
                + fb_ref[0, flat_slot:flat_slot + 1, :].astype(adt)
            x_new = x_scr[...] + out
            x_scr[...] = x_new
            hid_ref[...] = x_new

    fc1_flat = 2 if with_cross else 1
    fcg_flat = fc1_flat + nf
    fc2_flat = fc1_flat + (2 * nf if gated else nf)

    for i, stage in enumerate(stages):
        kind = stage[0]
        cpan = _panel_of(stage, nf, with_cross, gated, grouped)

        def body(stage=stage, kind=kind, cpan=cpan, first=(i == 0)):
            if manual and cpan is not None:
                if first:
                    # warm-up: nothing has started yet at (l=0, s=0)
                    @pl.when(l == 0)
                    def _():
                        for c in range(depth):
                            _dma(0, c).start()
                _start_ahead(cpan)
                _wait_panel(cpan)
            if kind == "q":
                @pl.when(l == 0)
                def _():
                    x_scr[...] = x_ref[...]
                ln_to_scr(0)
                qv = qkv_stage(0, cpan)
                q_scr[:, 0, :] = rope_rotate(qv) if with_rope else qv
            elif kind == "k":
                kv = qkv_stage(1, cpan)
                store_fresh(0, rope_rotate(kv) if with_rope else kv)
            elif kind == "v":
                store_fresh(1, qkv_stage(2, cpan))
            elif kind == "kv":
                kv_stage(cpan)
            elif kind == "selfattn":
                attn_chunk(stage[1], is_cross=False)
            elif kind == "dense":
                # parallel-attn topology: the MLP reads the SAME input
                # LN (still in ln_scr) — skip the post-LN refresh
                proj_stage(0, None if parallel else 1, cpan)
            elif kind == "crossq":
                q_scr[:, 0, :] = qkv_stage(3, cpan)
            elif kind == "crossattn":
                attn_chunk(stage[1], is_cross=True)
            elif kind == "crossdense":
                proj_stage(1, 2, cpan)
            elif kind == "fc1":
                fc1_stage(stage[1], fc1_flat + stage[1], cpan)
            elif kind == "fcg":
                fcg_stage(stage[1], fcg_flat + stage[1], cpan)
            elif kind == "fc2":
                fc2_stage(stage[1], fc2_flat, stage[1] == nf - 1, cpan)

        pl.when(s == i)(body)


def fused_decoder_stack(x, blobs: MegakernelBlobs, self_cache, seq_len,
                        scale: float,
                        cross_cache=None, cross_scale=None,
                        start_index=None, tail_kv=None,
                        head_dim: int = 64,
                        cs_self: Optional[int] = None,
                        cs_cross: Optional[int] = None,
                        eps: float = 1e-5, act: str = "gelu",
                        norm: str = "layernorm", gated: bool = False,
                        parallel: bool = False, rope_mat=None,
                        interpret: bool = False,
                        wstream: Optional[str] = None):
    """Run every decoder layer of one decode step in ONE kernel.

    x [NB, d] activation dtype (embedded tokens + positions, pre-blocks;
    NB = batch, one fresh token per row — round 4 generalised the kernel
    to batch>1: scratches keep the batch as leading sublane row-blocks so
    per-batch attention is a slice, GEMVs become [NB, d] GEMMs, and nb=1
    emits the original program); self_cache [L, NB, 2, H, D, S] (bf16/
    int8 seq-minor stacked, the ops.attention layout — the fresh tokens
    must NOT be written yet); seq_len [1] int32 INCLUDING the fresh
    token (batch rows advance together — the offline decode contract;
    per-row left-padding rides start_index); cross_cache
    [L, NB, 2, H, D, Sc] with optional per-layer ``cross_scale`` [L]
    (int8); ``start_index`` [NB] int32 masks self-attention keys below
    it per row.  ``tail_kv``: (tail [Kmax, L, NB, 2, H, D] cache-dtype,
    tail_len scalar int32) — the K-step deferred-store tail
    (ops.attention write_tail_kv): the last ``tail_len`` tokens live
    there instead of the big cache; the caller appends this step's fresh
    output and merges once per Kmax steps.

    Returns (hidden [NB, d] — pre-final-LN, fresh_kv in cache dtype:
    [L, 2, H, D] when NB==1 else [L, NB, 2, H, D] — seq-minor values for
    ops.attention.write_fresh_kv / write_tail_kv).
    """
    L, b_kv, _, HKV, D, S = self_cache.shape
    nb = x.shape[0]
    assert b_kv == nb, "cache batch must match the token batch"
    assert nb <= 8, \
        f"megakernel batch cap is 8 (got {nb}): per-batch VMEM scratch " \
        "row-blocks and cache panels grow linearly — larger batches " \
        "take the scanned path (PluginConfig.get_megakernel_max_batch)"
    assert D == head_dim
    d = x.shape[1]
    H = d // D
    assert H * D == d and d % 128 == 0 and 128 % D == 0
    rep = H // HKV                     # MQA/GQA: query heads per kv head
    assert rep * HKV == H, (H, HKV)
    grouped = rep > 1
    nsub = 128 // D
    assert not grouped or nsub == 1, \
        "MQA/GQA megakernel requires head_dim 128 (one head per lane " \
        "row — SantaCoder/StarCoder/GQA-LLaMA class); other head dims " \
        "take the scanned path"
    hp, dl = (H * D) // 128, 128
    hpk = (HKV * D) // 128             # kv pair-rows (== hp when equal)
    with_cross = cross_cache is not None
    assert not (grouped and with_cross), "grouped megakernel is decoder-only"

    assert not (with_cross and gated), "no gated cross-attn decoder exists"
    npan = blobs.wblob.shape[1]
    base = 3 if grouped else (6 if with_cross else 4)
    nf = (npan - base) // (3 if gated else 2)
    ffn = nf * d
    with_rope = rope_mat is not None
    prow = blobs.wblob.shape[2]          # d (int8/float) or d/2 (int4)
    w4 = prow == d // 2
    assert w4 or prow == d, (prow, d)
    ng = blobs.gscale.shape[2] if blobs.gscale is not None else 0

    from ..plugin import get_plugin_config
    cfg = get_plugin_config()
    cs_s = min(cs_self or cfg.get_decode_chunk(S) or 256, S)
    cs_s = max(cs_s, 128) if S >= 128 else S
    ncs = -(-S // cs_s)
    if with_cross:
        Sc = cross_cache.shape[5]
        if cs_cross is None:
            # cross-only chunk override (the shared EWT_DECODE_CHUNK
            # knob also moves the self chunk, which wants to stay at
            # 128 for the short-seq DMA clamp in self_map)
            import os
            _v = os.environ.get("EWT_DECODE_CHUNK_CROSS")
            if _v:
                cs_cross = int(_v)
        cs_c = min(cs_cross or cfg.get_decode_chunk(Sc) or 512, Sc)
        cs_c = max(cs_c, 128) if Sc >= 128 else Sc
        ncc = -(-Sc // cs_c)
    else:
        Sc, cs_c, ncc = 0, 1, 0

    # weight-stream mode: "manual" decouples the panel DMAs from the
    # stage grid (explicit async copies through a circular VMEM buffer —
    # the BlockSpec pipeline can only run one stage ahead, idling the
    # weight stream through attention stages); "pipeline" is the round-3
    # BlockSpec formulation.  Ring slots are indexed by the global panel
    # counter, so nbuf is free to be any size >= 2.
    if wstream is None:
        import os
        # default "manual" — ADOPTED on the round-4 device A/B (same
        # session, v5e): whisper large-v2 woq8 7.67 vs 6.86 utt/s and
        # GPT-350M woq8 bs1 444 vs 308 tok/s vs the BlockSpec pipeline
        # (which only prefetches ONE stage ahead, idling the weight DMA
        # through attention stages)
        wstream = os.environ.get("EWT_MK_WSTREAM", "manual")
    manual = wstream == "manual"
    nbuf = 0
    if manual:
        panel_bytes = prow * d * blobs.wblob.dtype.itemsize
        if 2 * panel_bytes > _RING_HARD_CAP:
            # even a double-buffered ring overflows VMEM (bf16 panels at
            # d >= 4096): take the BlockSpec pipeline, which streams one
            # panel block pair under the same constraint
            manual = False
        else:
            nbuf = _pick_nbuf(npan, panel_bytes)

    stages = _stages(nf, ncs, ncc, with_cross, gated, grouped)
    wpan = _hold_next([_panel_of(st, nf, with_cross, gated, grouped)
                       for st in stages])
    first_self = 2 if grouped else 3
    self_cmap = []
    for i, st in enumerate(stages):
        if st[0] == "selfattn":
            self_cmap.append(st[1])
        elif i < first_self:
            self_cmap.append(-1)
        else:
            self_cmap.append(ncs - 1)
    cross_cmap = []
    seen_cross = False
    for st in stages:
        if st[0] == "crossattn":
            cross_cmap.append(st[1])
            seen_cross = True
        else:
            cross_cmap.append(ncc - 1 if seen_cross else -1)

    if not interpret:
        from .._utils import runtime_platform
        interpret = runtime_platform() != "tpu"

    adt = x.dtype if x.dtype in (jnp.float32, jnp.bfloat16) else jnp.bfloat16
    self_quant = self_cache.dtype == jnp.int8
    self_fp8 = self_cache.dtype == jnp.float8_e4m3fn
    cross_quant = with_cross and cross_cache.dtype in (jnp.int8,
                                                       jnp.float8_e4m3fn)

    # pair views of the caches — free reinterpretations (same bytes)
    selfc = self_cache.reshape(L, nb, 2, hpk, dl, S)
    if with_cross:
        crossc = cross_cache.reshape(L, nb, 2, hp, dl, Sc)

    # batch rows share seq_len (the offline decode contract: all slots
    # advance together; per-row left-padding rides start_index [NB]).
    # A [B] array with B > 1 is REJECTED at trace time rather than
    # silently truncated to row 0 (ADVICE r4): callers with genuinely
    # per-row lengths belong on the scanned path.
    seqlen_arr = jnp.asarray(seq_len, jnp.int32).reshape(-1)
    assert seqlen_arr.shape[0] == 1, \
        "fused_decoder_stack needs a row-uniform sequence length " \
        f"(scalar or shape (1,), got shape {seqlen_arr.shape}); pass " \
        "sequence_length[:1] if all rows advance together"
    if start_index is None:
        start_arr = jnp.zeros((nb,), jnp.int32)
    else:
        start_arr = jnp.asarray(start_index, jnp.int32).reshape(-1)
        if start_arr.shape[0] != nb:
            start_arr = jnp.broadcast_to(start_arr[:1], (nb,))
    with_tail = tail_kv is not None
    if with_tail:
        tail_arr, tail_len = tail_kv
        kmax = tail_arr.shape[0]
        tail_pair = tail_arr.reshape(kmax, L, nb, 2, hpk, dl)
        tlen_arr = jnp.reshape(jnp.asarray(tail_len, jnp.int32), (1,))
    else:
        kmax = 0
        tlen_arr = jnp.zeros((1,), jnp.int32)
    ones_l = jnp.ones((L,), jnp.float32)
    kvoq = blobs.kv_oq if (self_quant or self_fp8) else ones_l
    kvqo = blobs.kv_qo if (self_quant or self_fp8) else ones_l
    cscale = (jnp.asarray(cross_scale, jnp.float32).reshape(-1)
              if cross_quant and cross_scale is not None else ones_l)

    def x_map(l, s, *refs):
        return (0, 0)

    def w_map(l, s, *refs):
        return (l, _stage_lookup(s, wpan), 0, 0)

    def aux4_map(l, s, *refs):
        return (l, 0, 0, 0)

    def aux3_map(l, s, *refs):
        return (l, 0, 0)

    def self_map(l, s, slen, st, tln, koq, kqo, csc):
        cm = _stage_lookup(s, self_cmap)
        cache_len = slen[0] - 1 - (tln[0] if with_tail else 0)
        n_need = jnp.maximum(jax.lax.div(cache_len + cs_s - 1, cs_s), 1)
        before = cm < 0
        l_eff = jnp.where(before, jnp.maximum(l - 1, 0), l)
        c_eff = jnp.minimum(jnp.where(before, ncs - 1, cm), n_need - 1)
        return (l_eff, 0, 0, 0, 0, c_eff)

    def cross_map(l, s, slen, st, tln, koq, kqo, csc):
        cm = _stage_lookup(s, cross_cmap)
        before = cm < 0
        l_eff = jnp.where(before, jnp.maximum(l - 1, 0), l)
        c_eff = jnp.where(before, ncc - 1, cm)
        return (l_eff, 0, 0, 0, 0, c_eff)

    def tail_map(l, s, *refs):
        return (0, l, 0, 0, 0, 0)

    def fresh_map(l, s, *refs):
        return (l, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((nb, d), x_map, memory_space=pltpu.VMEM),
        (pl.BlockSpec(memory_space=pl.ANY) if manual else
         pl.BlockSpec((1, 1, prow, d), w_map, memory_space=pltpu.VMEM)),
        pl.BlockSpec((1,) + blobs.pair_scale.shape[1:], aux4_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + blobs.pair_bias.shape[1:], aux4_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + blobs.flat_scale.shape[1:], aux3_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + blobs.flat_bias.shape[1:], aux3_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1,) + blobs.ln_par.shape[1:], aux3_map,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nb, 2, hpk, dl, cs_s), self_map,
                     memory_space=pltpu.VMEM),
    ]
    args = [x.astype(adt), blobs.wblob, blobs.pair_scale, blobs.pair_bias,
            blobs.flat_scale, blobs.flat_bias, blobs.ln_par, selfc]
    if with_cross:
        in_specs.append(pl.BlockSpec((1, nb, 2, hp, dl, cs_c), cross_map,
                                     memory_space=pltpu.VMEM))
        args.append(crossc)
    if with_tail:
        in_specs.append(pl.BlockSpec((kmax, 1, nb, 2, hpk, dl), tail_map,
                                     memory_space=pltpu.VMEM))
        args.append(tail_pair)
    if with_rope:
        rope_arr = jnp.asarray(rope_mat, jnp.float32)
        if rope_arr.ndim == 2:
            rope_arr = rope_arr[None]
        if rope_arr.shape[0] != nb:
            rope_arr = jnp.broadcast_to(rope_arr[:1], (nb, dl, dl))
        in_specs.append(pl.BlockSpec((nb, dl, dl),
                                     lambda l, s, *refs: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(rope_arr)
    if ng:
        # current panel's int4 group scales ride the stage-indexed
        # BlockSpec pipeline (small: NG*d f32 per panel)
        in_specs.append(pl.BlockSpec((1, 1, ng, d), w_map,
                                     memory_space=pltpu.VMEM))
        args.append(blobs.gscale)

    out_shapes = (
        jax.ShapeDtypeStruct((nb, d), adt),
        jax.ShapeDtypeStruct((L, 2, nb * hpk, dl), self_cache.dtype),
    )
    out_specs = (
        pl.BlockSpec((nb, d), x_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, nb * hpk, dl), fresh_map,
                     memory_space=pltpu.VMEM),
    )

    scratch_shapes = [
        pltpu.VMEM((nb, d), adt),         # x (residual stream)
        pltpu.VMEM((nb, d), adt),         # current LN output
        pltpu.VMEM((nb * hp, 1, dl), adt),  # q (pair layout, per-b blocks)
        pltpu.VMEM((nb * hpk, dl), jnp.float32),  # fresh k (stored values)
        pltpu.VMEM((nb * hpk, dl), jnp.float32),  # fresh v
        pltpu.VMEM((nb * hp, nsub), jnp.float32),  # softmax running max
        pltpu.VMEM((nb * hp, nsub), jnp.float32),  # softmax running denom
        pltpu.VMEM((nb * hp, dl), jnp.float32),    # context accumulator
        pltpu.VMEM((nb, ffn), adt),       # fc1 activations
        pltpu.VMEM((nb, d), jnp.float32),  # fc2 accumulator
    ]
    if manual:
        scratch_shapes += [
            pltpu.VMEM((nbuf, prow, d), blobs.wblob.dtype),  # panel ring
            pltpu.SemaphoreType.DMA((nbuf,)),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(L, len(stages)),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    kernel = functools.partial(
        _kernel, stages=stages, nf=nf, ncs=ncs, ncc=ncc,
        with_cross=with_cross, d=d, hp=hp, dl=dl, hd=D, nsub=nsub, nb=nb,
        cs_s=cs_s, cs_c=cs_c, s_self=S, s_cross=Sc, scale=float(scale),
        self_quant=self_quant, cross_quant=cross_quant, self_fp8=self_fp8,
        with_tail=with_tail, kmax=kmax, adt=adt, eps=float(eps), act=act,
        norm=norm, gated=gated, parallel=parallel, with_rope=with_rope,
        manual=manual, nbuf=nbuf, npan=npan, n_layer=L, w4=w4, ng=ng,
        hpk=hpk)
    weight_bytes = L * npan * prow * d
    cache_bytes = nb * (L * 2 * HKV * D * S * self_cache.dtype.itemsize
                        + (L * 2 * d * Sc * cross_cache.dtype.itemsize
                           if with_cross else 0))
    hid, fresh = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=2 * weight_bytes * max(nb // 4, 1)
            + 4 * nb * L * d * (S + Sc),
            bytes_accessed=weight_bytes + cache_bytes,
            transcendentals=nb * L * (ffn + H * (S + Sc))),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(seqlen_arr, start_arr, tlen_arr, kvoq, kvqo, cscale, *args)
    fresh = fresh.reshape(L, 2, nb, HKV, D)
    if nb == 1:
        return hid, fresh[:, :, 0]
    # [L, NB, 2, H, D] — the per-batch seq-minor fresh kv contract of
    # ops.attention.write_fresh_kv
    return hid, jnp.swapaxes(fresh, 1, 2)


# state-dict key prefixes per block flavour (the packer is shared by the
# Whisper ResidualAttentionBlock and the generic DecoderBlock)
WHISPER_KEYS = dict(qkv="attn.qkv", dense="attn.dense",
                    crossq="cross_attn.q_linear",
                    crossdense="cross_attn.dense",
                    fc1="mlp1", fc2="mlp2",
                    ln=("attn_ln", "cross_attn_ln", "mlp_ln"),
                    kv="attn")
DECODER_KEYS = dict(qkv="attention.qkv", dense="attention.dense",
                    fc1="mlp.fc", fc2="mlp.proj", gate="mlp.gate",
                    ln=("input_layernorm", "post_layernorm"),
                    kv="attention")


def pack_decoder_blobs(state: dict, *, n_layer: int, hidden: int,
                       n_head: int, head_dim: int, ffn: int,
                       with_cross: bool, gated: bool = False,
                       n_kv_head: Optional[int] = None,
                       keys: Optional[dict] = None) -> MegakernelBlobs:
    """Build the megakernel blobs from a stacked block state dict (keys
    as produced by ``stack_parameter_shapes``; WOQ-int8 after surgery:
    ``attn.qkv.qweight`` [L, d, 3d], ``attn.dense.qweight`` [L, d, d],
    ``mlp1.qweight`` [L, d, ffn], ``mlp2.qweight`` [L, ffn, d], LN
    params, per-channel scales and biases).  Pure jnp — jit it once at
    session setup; the result is the deploy-time weight image the
    decode loop streams.

    The per-panel decomposition is a pure relayout of the offline
    quantizer's K-major [in, out] tensors (the thop
    symmetric_quantize_last_axis_of_batched_matrix equivalent,
    ops/quant_matmul.py): QKV/fc1 split along out-columns, fc2 along
    in-rows — per-output-channel fp32 accumulations are unchanged.

    FLOAT fallback (round 4): when the block is un-quantised the packer
    reads the plain ``.weight`` tensors instead — QKVLinear's head-major
    [L, 3, H, D, d] and Linear's [L, out, in] are transposed to the same
    K-major [in, out] panels, per-channel scales become ones, and the
    kernel streams bf16 panels (2 bytes/weight) with the identical
    stage program.
    """
    L, d = n_layer, hidden
    hp, dl = d // 128, 128
    n_kv_head = n_kv_head or n_head
    grouped_heads = n_kv_head != n_head     # MQA/GQA combined-kv panel
    dkv = n_kv_head * head_dim
    if grouped_heads:
        assert not with_cross and head_dim == 128 and 2 * dkv <= d
    # ffn is zero-padded up to the next multiple of d (LLaMA's 11008 on
    # d=4096 etc.) — numerically exact: act(0)=0 for gelu/relu/silu,
    # gated 0*0=0, and padded fc2 in-rows contribute nothing
    nf = -(-ffn // d)
    pffn = nf * d
    f32 = jnp.float32
    kk = keys or (WHISPER_KEYS if with_cross else DECODER_KEYS)
    quantized = (kk["qkv"] + ".qweight") in state

    def pad_cols(w):  # fc1/gate [L, d, ffn] -> [L, d, pffn]
        return w if pffn == ffn else jnp.pad(
            w, ((0, 0), (0, 0), (0, pffn - ffn)))

    def pad_rows(w):  # fc2 [L, ffn, d] -> [L, pffn, d]
        return w if pffn == ffn else jnp.pad(
            w, ((0, 0), (0, pffn - ffn), (0, 0)))

    def pad_flat(v, fill):  # per-ffn-channel scale/bias [L, ffn]
        if pffn == ffn:
            return v
        extra = jnp.full((L, pffn - ffn), fill, v.dtype)
        return jnp.concatenate([v, extra], axis=1)

    def g(key):
        return jnp.asarray(state[key])

    def zeros_like_or(key, shape):
        if key in state and state[key] is not None:
            return jnp.asarray(state[key], f32)
        return jnp.zeros(shape, f32)

    def km(key):
        """K-major [L, in, out] view of a plain Linear weight [L, out, in]."""
        return jnp.swapaxes(g(key + ".weight"), -1, -2)

    # int4 blocks (ops.quant_matmul.quantize_weights_int4 half-split
    # nibble packing): the per-MATRIX packing interleaves rows K/2 apart,
    # which crosses the [d, d] panel boundaries — unpack to int8 here
    # (this runs once at session setup), slice panels, and re-pack each
    # panel in ITS OWN half-split order for the in-kernel unpack.
    bits4 = quantized and \
        state[kk["qkv"] + ".qweight"].shape[-2] == d // 2
    grouped4 = bits4 and \
        jnp.asarray(state[kk["qkv"] + ".per_channel_scale"]).ndim == 3

    def maybe_unpack(w):                  # [L, K(/2), N] -> [L, K, N] int8
        if not bits4:
            return w
        lo = ((w << 4).astype(jnp.int8) >> 4)
        hi = (w >> 4).astype(jnp.int8)
        return jnp.concatenate([lo, hi], axis=1)

    def ones_or_scale(key, shape):
        if quantized and not grouped4:
            return g(key + ".per_channel_scale").astype(f32)
        return jnp.ones(shape, f32)

    def pad_panel_cols(w):     # [L, d, c] -> [L, d, d] zero-pad
        return w if w.shape[2] == d else jnp.pad(
            w, ((0, 0), (0, 0), (0, d - w.shape[2])))

    if quantized:
        qkv_w = maybe_unpack(g(kk["qkv"] + ".qweight"))
        if grouped_heads:              # [L, d, d+2*dkv]: q | k | v cols
            qkv_panels = [qkv_w[:, :, 0:d],
                          pad_panel_cols(qkv_w[:, :, d:])]
        else:                          # [L, d, 3d]
            qkv_panels = [qkv_w[:, :, 0:d], qkv_w[:, :, d:2 * d],
                          qkv_w[:, :, 2 * d:]]
        dense_p = maybe_unpack(g(kk["dense"] + ".qweight"))
        fc1 = pad_cols(maybe_unpack(g(kk["fc1"] + ".qweight")))
        fc2 = pad_rows(maybe_unpack(g(kk["fc2"] + ".qweight")))
        if gated:
            gate = pad_cols(maybe_unpack(g(kk["gate"] + ".qweight")))
        if with_cross:
            crossq_p = maybe_unpack(g(kk["crossq"] + ".qweight"))
            crossd_p = maybe_unpack(g(kk["crossdense"] + ".qweight"))
    else:
        if grouped_heads:
            # separate q [L, H, hd, dm] + kv [L, 2, Hkv, hd, dm] ->
            # K-major q panel and combined zero-padded kv panel
            qw = jnp.swapaxes(g(kk["qkv"] + ".weight").reshape(L, d, d),
                              -1, -2)
            kvw = jnp.swapaxes(
                g(kk["qkv"] + ".kv_weight").reshape(L, 2 * dkv, d),
                -1, -2)                       # [L, d, 2*dkv]
            qkv_panels = [qw, pad_panel_cols(kvw)]
        else:
            # head-major [L, 3, H, D, d] -> three K-major [L, d, d] panels
            qkv_hm = g(kk["qkv"] + ".weight").reshape(L, 3, d, d)
            qkv_panels = [jnp.swapaxes(qkv_hm[:, i], -1, -2)
                          for i in range(3)]
        dense_p = km(kk["dense"])
        fc1 = pad_cols(km(kk["fc1"]))                   # [L, d, pffn]
        fc2 = pad_rows(km(kk["fc2"]))                   # [L, pffn, d]
        if gated:
            gate = pad_cols(km(kk["gate"]))
        if with_cross:
            crossq_p = km(kk["crossq"])
            crossd_p = km(kk["crossdense"])

    panels = qkv_panels + [dense_p]
    if with_cross:
        panels += [crossq_p, crossd_p]
    panels += [fc1[:, :, j * d:(j + 1) * d] for j in range(nf)]
    if gated:
        panels += [gate[:, :, j * d:(j + 1) * d] for j in range(nf)]
    panels += [fc2[:, j * d:(j + 1) * d, :] for j in range(nf)]
    wblob = jnp.stack(panels, axis=1)
    if bits4:
        # re-pack each [d, d] panel half-split along its own K rows
        lo = wblob[:, :, :d // 2, :] & 0xF
        hi = (wblob[:, :, d // 2:, :] & 0xF) << 4
        wblob = (lo | hi).astype(jnp.int8)   # [L, NPAN, d/2, d]

    gscale = None
    if grouped4:
        # per-panel group scales [L, NPAN, NG, d]: every panel has K=d
        # rows, so the per-matrix [K/gs, N] arrays slice cleanly — qkv/
        # fc1 by out-columns, fc2 by K-group rows
        qkv_gs = g(kk["qkv"] + ".per_channel_scale").astype(f32)
        ng = qkv_gs.shape[1]                 # groups per d K-rows

        def pad_gs_cols(s):                  # [L, NG, ffn] -> [L, NG, pffn]
            return s if pffn == ffn else jnp.concatenate(
                [s, jnp.ones((L, ng, pffn - ffn), f32)], axis=2)

        def pad_gs_rows(s):                  # [L, ffn/gs, d] -> [L, pffn/gs, d]
            tgt = nf * ng                    # groups per panel x panels
            return s if s.shape[1] == tgt else jnp.concatenate(
                [s, jnp.ones((L, tgt - s.shape[1], d), f32)], axis=1)

        if grouped_heads:
            kv_gs = qkv_gs[:, :, d:]
            kv_gs = kv_gs if kv_gs.shape[2] == d else jnp.concatenate(
                [kv_gs, jnp.ones((L, ng, d - kv_gs.shape[2]), f32)],
                axis=2)
            gsp = [qkv_gs[:, :, 0:d], kv_gs]
        else:
            gsp = [qkv_gs[:, :, 0:d], qkv_gs[:, :, d:2 * d],
                   qkv_gs[:, :, 2 * d:]]
        gsp += [g(kk["dense"] + ".per_channel_scale").astype(f32)]
        if with_cross:
            gsp += [g(kk["crossq"] + ".per_channel_scale").astype(f32),
                    g(kk["crossdense"] + ".per_channel_scale").astype(f32)]
        fc1_gs = pad_gs_cols(g(kk["fc1"] + ".per_channel_scale").astype(f32))
        gsp += [fc1_gs[:, :, j * d:(j + 1) * d] for j in range(nf)]
        if gated:
            gate_gs = pad_gs_cols(
                g(kk["gate"] + ".per_channel_scale").astype(f32))
            gsp += [gate_gs[:, :, j * d:(j + 1) * d] for j in range(nf)]
        fc2_gs = pad_gs_rows(g(kk["fc2"] + ".per_channel_scale").astype(f32))
        gsp += [fc2_gs[:, j * ng:(j + 1) * ng, :] for j in range(nf)]
        gscale = jnp.stack(gsp, axis=1)      # [L, NPAN, NG, d]

    def to_pair(p):                # [L, d or dkv] -> [L, hp, dl]
        r = p.reshape(L, -1, dl)
        if r.shape[1] < hp:
            r = jnp.concatenate(
                [r, jnp.zeros((L, hp - r.shape[1], dl), r.dtype)], axis=1)
        return r

    if grouped_heads:
        out_total = d + 2 * dkv
        qkv_s = ones_or_scale(kk["qkv"], (L, out_total))
        q_b = zeros_like_or(kk["qkv"] + ".bias",
                            (L, n_head, head_dim)).reshape(L, d)
        kv_b = zeros_like_or(kk["qkv"] + ".kv_bias",
                             (L, 2, n_kv_head, head_dim)).reshape(
                                 L, 2 * dkv)
        pair_s = [qkv_s[:, 0:d], qkv_s[:, d:d + dkv],
                  qkv_s[:, d + dkv:]]
        pair_b = [q_b, kv_b[:, :dkv], kv_b[:, dkv:]]
    else:
        qkv_s = ones_or_scale(kk["qkv"], (L, 3 * d))        # [L, 3d]
        qkv_b = zeros_like_or(kk["qkv"] + ".bias",
                              (L, 3, n_head, head_dim)).reshape(L, 3 * d)
        pair_s = [qkv_s[:, 0:d], qkv_s[:, d:2 * d], qkv_s[:, 2 * d:]]
        pair_b = [qkv_b[:, 0:d], qkv_b[:, d:2 * d], qkv_b[:, 2 * d:]]
    if with_cross:
        pair_s.append(ones_or_scale(kk["crossq"], (L, d)))
        pair_b.append(zeros_like_or(kk["crossq"] + ".bias", (L, d)))
    pair_scale = jnp.stack([to_pair(p) for p in pair_s], axis=1)
    pair_bias = jnp.stack([to_pair(p) for p in pair_b], axis=1)

    flat_s = [ones_or_scale(kk["dense"], (L, d))]
    flat_b = [zeros_like_or(kk["dense"] + ".bias", (L, d))]
    if with_cross:
        flat_s.append(ones_or_scale(kk["crossdense"], (L, d)))
        flat_b.append(zeros_like_or(kk["crossdense"] + ".bias", (L, d)))
    fc1_s = pad_flat(ones_or_scale(kk["fc1"], (L, ffn)), 1.0)  # [L, pffn]
    fc1_b = pad_flat(zeros_like_or(kk["fc1"] + ".bias", (L, ffn)), 0.0)
    flat_s += [fc1_s[:, j * d:(j + 1) * d] for j in range(nf)]
    flat_b += [fc1_b[:, j * d:(j + 1) * d] for j in range(nf)]
    if gated:
        g_s = pad_flat(ones_or_scale(kk["gate"], (L, ffn)), 1.0)
        g_b = pad_flat(zeros_like_or(kk["gate"] + ".bias", (L, ffn)), 0.0)
        flat_s += [g_s[:, j * d:(j + 1) * d] for j in range(nf)]
        flat_b += [g_b[:, j * d:(j + 1) * d] for j in range(nf)]
    flat_s.append(ones_or_scale(kk["fc2"], (L, d)))
    flat_b.append(zeros_like_or(kk["fc2"] + ".bias", (L, d)))
    flat_scale = jnp.stack(flat_s, axis=1)
    flat_bias = jnp.stack(flat_b, axis=1)

    ln_rows = []
    for name in kk["ln"]:
        ln_rows += [g(name + ".weight").astype(f32),
                    zeros_like_or(name + ".bias", (L, d))]
    ln_par = jnp.stack(ln_rows, axis=1)

    kv_key = kk["kv"] + ".kv_orig_quant_scale"
    if kv_key in state and state[kv_key] is not None:
        kv_oq = jnp.asarray(state[kv_key], f32).reshape(L)
        kv_qo = jnp.asarray(state[kk["kv"] + ".kv_quant_orig_scale"],
                            f32).reshape(L)
    else:
        kv_oq = kv_qo = jnp.ones((L,), f32)

    return MegakernelBlobs(wblob, pair_scale, pair_bias, flat_scale,
                           flat_bias, ln_par, kv_oq, kv_qo, gscale)

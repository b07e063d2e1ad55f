"""Model surgery: swap float linears for quantised ones.

Counterpart of the reference's ``tensorrt_llm/models/quantized/quant.py``:
``weight_only_quantize`` (:51-97) recursively replaces Column/RowLinear with
WeightOnlyQuant variants (default ``exclude_modules=['lm_head']``).  Here
surgery also *transforms the state dict* (the reference does this separately
in every example's weight.py via the thop quantiser; we fold offline
quantisation into one step), and understands the stacked-[n_layer] parameter
layout used for scanned blocks.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from ..layers.attention import QKVLinear
from ..layers.linear import Linear, RowLinear
from ..module import Module
from ..ops.quant_matmul import quantize_weights_int4, quantize_weights_int8
from .layers import (WeightOnlyQuantLinear, WeightOnlyQuantQKVLinear,
                     WeightOnlyQuantRowLinear)
from .mode import QuantMode

DEFAULT_EXCLUDE = ["lm_head"]


def _quantize_stacked(w: np.ndarray, lead_ndim: int, bits: int,
                      group_size: int = 0):
    """w [*lead, out, in] -> (q [*lead, in(, /2), out] int8,
    scales [*lead, out] or [*lead, in/G, out] when grouped)."""
    lead = w.shape[:lead_ndim]
    out_f, in_f = w.shape[lead_ndim], w.shape[lead_ndim + 1]
    flat = w.reshape(-1, out_f, in_f)
    if bits == 8:
        qfn = quantize_weights_int8
    else:
        def qfn(m):
            return quantize_weights_int4(m, group_size=group_size or None)
    qs, ss = zip(*(qfn(np.ascontiguousarray(m.T)) for m in flat))
    q = np.stack(qs, 0).reshape(lead + qs[0].shape)
    s = np.stack(ss, 0).reshape(lead + ss[0].shape)
    return q, s


def _int4_group(quant_mode: QuantMode, in_features: int) -> int:
    """Resolve the int4 group size for a linear (0 for int8 / per-channel /
    indivisible in-features — tiny test models fall back cleanly)."""
    if not quant_mode.is_int4_weight_only():
        return 0
    from ..plugin import get_plugin_config
    g = get_plugin_config().get_int4_group_size()
    if g and in_features % g == 0:
        return g
    return 0


def _relayer(new_mod: Module, lead: Tuple[int, ...]) -> Module:
    """Prepend stacked lead dims to a freshly-built module's param shapes
    (and shift the sharding specs past the unsharded lead axes — else the
    per-dim axis names land early and mis-shard every stacked weight)."""
    if lead:
        from jax.sharding import PartitionSpec
        for _, p in new_mod.named_parameters():
            if p._shape is not None:
                p._shape = tuple(lead) + p._shape
            if tuple(p.pspec):
                p.pspec = PartitionSpec(*((None,) * len(lead)),
                                        *tuple(p.pspec))
    return new_mod


def weight_only_quantize(model: Module,
                         quant_mode: QuantMode,
                         exclude_modules: Optional[List[str]] = None,
                         current_key_name: Optional[List[str]] = None) -> Module:
    """In-place module swap (reference quant.py:51 semantics; weights must be
    (re)loaded afterwards with a quantised state dict)."""
    assert quant_mode.is_weight_only()
    bits = 4 if quant_mode.is_int4_weight_only() else 8
    exclude = exclude_modules if exclude_modules is not None else DEFAULT_EXCLUDE

    for name, child in list(model._modules.items()):
        if name in exclude:
            continue
        replaced = None
        if isinstance(child, QKVLinear):
            # fused weight [*lead, 3, H, hd, in] vs separate-KV (MQA/GQA)
            # q weight [*lead, H, hd, in]
            wdim = 4 if child.num_kv_heads == child.num_heads else 3
            lead = tuple(child.weight._shape[:-wdim])
            hidden = child.weight._shape[-1]
            replaced = _relayer(
                WeightOnlyQuantQKVLinear(hidden, child.num_heads,
                                         child.num_kv_heads, child.head_dim,
                                         bias=child.bias is not None,
                                         dtype=None, bits=bits,
                                         group_size=_int4_group(quant_mode,
                                                                hidden)),
                lead)
        elif isinstance(child, RowLinear):
            lead = tuple(child.weight._shape[:-2])
            replaced = _relayer(
                WeightOnlyQuantRowLinear(child.in_features, child.out_features,
                                         bias=child.bias is not None,
                                         dtype=child.dtype, bits=bits,
                                         tp_size=getattr(child, "tp_size", 1),
                                         group_size=_int4_group(
                                             quant_mode, child.in_features)),
                lead)
        elif isinstance(child, Linear):
            lead = tuple(child.weight._shape[:-2])
            replaced = _relayer(
                WeightOnlyQuantLinear(child.in_features, child.out_features,
                                      bias=child.bias is not None,
                                      dtype=child.dtype, bits=bits,
                                      tp_size=getattr(child, "tp_size", 1),
                                      group_size=_int4_group(
                                          quant_mode, child.in_features)),
                lead)
        if replaced is not None:
            setattr(model, name, replaced)
        else:
            weight_only_quantize(child, quant_mode, exclude, current_key_name)
    return model


def smooth_quantize(model: Module,
                    quant_mode: QuantMode,
                    exclude_modules: Optional[List[str]] = None) -> Module:
    """SmoothQuant W8A8 module swap (ref quant.py:8-48 smooth_quantize).

    Swaps every QKVLinear/Linear/RowLinear (except ``exclude_modules``,
    default lm_head) for the SmoothQuant variants; the per-token dynamic
    activation quantisation happens inside the swapped linears, so the
    float layernorms stay (the reference's fused LN+quant layer exists in
    smoothquant_layers for callers that want the handoff fused).
    Weights must be (re)loaded afterwards via smooth_quantize_state_dict."""
    from .smoothquant_layers import (SmoothQuantLinear, SmoothQuantQKVLinear,
                                     SmoothQuantRowLinear)
    assert quant_mode.has_act_and_weight_quant()
    exclude = exclude_modules if exclude_modules is not None else DEFAULT_EXCLUDE

    for name, child in list(model._modules.items()):
        if name in exclude:
            continue
        replaced = None
        if isinstance(child, QKVLinear):
            lead = tuple(child.weight._shape[:-4])
            hidden = child.weight._shape[-1]
            replaced = _relayer(
                SmoothQuantQKVLinear(hidden, child.num_heads,
                                     child.num_kv_heads, child.head_dim,
                                     bias=child.bias is not None,
                                     dtype=None, quant_mode=quant_mode), lead)
        elif isinstance(child, RowLinear):
            lead = tuple(child.weight._shape[:-2])
            replaced = _relayer(
                SmoothQuantRowLinear(child.in_features, child.out_features,
                                     bias=child.bias is not None,
                                     dtype=child.dtype,
                                     quant_mode=quant_mode), lead)
        elif isinstance(child, Linear):
            lead = tuple(child.weight._shape[:-2])
            replaced = _relayer(
                SmoothQuantLinear(child.in_features, child.out_features,
                                  bias=child.bias is not None,
                                  dtype=child.dtype,
                                  quant_mode=quant_mode), lead)
        if replaced is not None:
            setattr(model, name, replaced)
        else:
            smooth_quantize(child, quant_mode, exclude)
    return model


def _sq_quantize_stacked(w: np.ndarray, lead_ndim: int, per_channel: bool):
    """w [*lead, out, in] -> (q [*lead, in, out] int8, step [*lead, out|1])."""
    lead = w.shape[:lead_ndim]
    out_f, in_f = w.shape[lead_ndim], w.shape[lead_ndim + 1]
    flat = w.reshape(-1, out_f, in_f)
    qs, ss = [], []
    for m in flat:
        wt = np.ascontiguousarray(m.T.astype(np.float32))     # [in, out]
        axis = 0 if per_channel else None
        amax = np.max(np.abs(wt), axis=axis, keepdims=False)
        step = np.maximum(amax, 1e-8) / 127.0
        q = np.clip(np.round(wt / step), -127, 127).astype(np.int8)
        qs.append(q)
        ss.append(np.atleast_1d(step).astype(np.float32))
    q = np.stack(qs, 0).reshape(lead + qs[0].shape)
    s = np.stack(ss, 0).reshape(lead + ss[0].shape)
    return q, s


def smooth_quantize_state_dict(model: Module, state: Dict[str, np.ndarray],
                               quant_mode: QuantMode,
                               act_scales: Optional[Dict[str, np.ndarray]] = None,
                               ln_paths: Optional[Dict[str, str]] = None,
                               alpha: float = 0.5) -> Dict[str, np.ndarray]:
    """Transform float weights to match a smooth-quantised ``model``.

    ``act_scales``: optional {<linear path>: per-in-channel activation amax}
    from calibration; when given, the alpha smoothing of ref
    smoothquant.py:44 (smooth_gemm) is folded into the weight before
    quantisation, and — when ``ln_paths`` maps the linear to its preceding
    layernorm — the inverse scaling is folded into that LN's weight/bias so
    the network function is preserved (ref apply_smoothing)."""
    from .smoothquant_layers import (SmoothQuantLinear, SmoothQuantQKVLinear,
                                     smooth_gemm)
    per_channel = quant_mode.has_per_channel_scaling()
    out = dict(state)
    for path, mod in model.named_modules():
        if not isinstance(mod, (SmoothQuantQKVLinear, SmoothQuantLinear)):
            continue
        key = f"{path}.weight"
        if key not in out:
            continue
        w = np.asarray(out.pop(key), np.float32)
        if isinstance(mod, SmoothQuantQKVLinear):
            lead_ndim = w.ndim - 4
            lead = w.shape[:lead_ndim]
            three, h, hd, in_f = w.shape[lead_ndim:]
            w = w.reshape(lead + (three * h * hd, in_f))
        lead_ndim = w.ndim - 2
        if act_scales is not None and path in act_scales:
            ln = (ln_paths or {}).get(path)
            lw = out.get(f"{ln}.weight") if ln else None
            lb = out.get(f"{ln}.bias") if ln else None
            act = np.asarray(act_scales[path], np.float32)
            if lead_ndim == 0:
                _, sm = smooth_gemm(w, act, lw, lb, alpha=alpha)
                w = sm["gemm_weight"]
                if ln and lw is not None:
                    out[f"{ln}.weight"] = sm["layernorm_weight"]
                if ln and lb is not None:
                    out[f"{ln}.bias"] = sm["layernorm_bias"]
            else:
                # stacked [n_layer, out, in]: per-LAYER smoothing scales
                # (ref smooth_gemm runs per linear, one scale per layer —
                # a shared scale across layers degrades outlier migration)
                lead = w.shape[:lead_ndim]
                wf = w.reshape((-1,) + w.shape[lead_ndim:])
                n = wf.shape[0]
                actf = (np.broadcast_to(act, (n, wf.shape[-1]))
                        if act.ndim <= 1
                        else act.reshape(n, wf.shape[-1]))
                lwf = (np.asarray(lw, np.float32).reshape(n, -1)
                       if ln and lw is not None else None)
                lbf = (np.asarray(lb, np.float32).reshape(n, -1)
                       if ln and lb is not None else None)
                rows, lws, lbs = [], [], []
                for i in range(n):
                    _, sm = smooth_gemm(
                        wf[i], actf[i],
                        lwf[i] if lwf is not None else None,
                        lbf[i] if lbf is not None else None, alpha=alpha)
                    rows.append(sm["gemm_weight"])
                    if lwf is not None:
                        lws.append(sm["layernorm_weight"])
                    if lbf is not None:
                        lbs.append(sm["layernorm_bias"])
                w = np.stack(rows, 0).reshape(w.shape)
                if lwf is not None:
                    out[f"{ln}.weight"] = np.stack(lws, 0).reshape(
                        np.asarray(lw).shape)
                if lbf is not None:
                    out[f"{ln}.bias"] = np.stack(lbs, 0).reshape(
                        np.asarray(lb).shape)
        q, s = _sq_quantize_stacked(w, lead_ndim, per_channel)
        out[f"{path}.qweight"] = q
        out[f"{path}.per_channel_scale"] = s
        if not quant_mode.has_per_token_dynamic_scaling():
            out.setdefault(f"{path}.act_scale", np.ones((1,), np.float32))
    return out


def quantize_state_dict(model: Module, state: Dict[str, np.ndarray],
                        quant_mode: QuantMode) -> Dict[str, np.ndarray]:
    """Transform float weights in ``state`` to match a weight-only-quantised
    ``model`` (call *after* weight_only_quantize): every swapped module's
    ``<path>.weight`` becomes ``<path>.qweight`` + ``<path>.per_channel_scale``.
    Offline equivalent of thop's symmetric_quantize_last_axis_of_batched_matrix.
    """
    bits = 4 if quant_mode.is_int4_weight_only() else 8
    out = dict(state)
    for path, mod in model.named_modules():
        if isinstance(mod, WeightOnlyQuantQKVLinear):
            key = f"{path}.weight"
            w = np.asarray(out.pop(key), np.float32)
            if mod.num_kv_heads != mod.num_heads:
                # separate-KV (MQA/GQA): fuse q [*, H, hd, in] +
                # kv [*, 2, Hkv, hd, in] into one [*, (H+2Hkv)*hd, in]
                # out-row block (layer contract: q | k | v columns)
                kv = np.asarray(out.pop(f"{path}.kv_weight"), np.float32)
                lead_ndim = w.ndim - 3
                lead = w.shape[:lead_ndim]
                in_f = w.shape[-1]
                w2 = np.concatenate(
                    [w.reshape(lead + (-1, in_f)),
                     kv.reshape(lead + (-1, in_f))], axis=-2)
            else:
                # [*lead, 3, H, hd, in] -> [*lead, 3*H*hd, in]
                lead_ndim = w.ndim - 4
                lead = w.shape[:lead_ndim]
                three, h, hd, in_f = w.shape[lead_ndim:]
                w2 = w.reshape(lead + (three * h * hd, in_f))
            q, s = _quantize_stacked(w2, lead_ndim, bits,
                                     group_size=mod.group_size)
            out[f"{path}.qweight"] = q
            out[f"{path}.per_channel_scale"] = s
        elif isinstance(mod, WeightOnlyQuantLinear):
            key = f"{path}.weight"
            if key not in out:
                continue
            w = np.asarray(out.pop(key), np.float32)
            q, s = _quantize_stacked(w, w.ndim - 2, bits,
                                     group_size=mod.group_size)
            out[f"{path}.qweight"] = q
            out[f"{path}.per_channel_scale"] = s
    return out


def weight_only_quantize_state(model: Module, state: Dict[str, np.ndarray],
                               quant_mode: QuantMode,
                               exclude_modules: Optional[List[str]] = None):
    """Convenience: surgery + state transformation in one step."""
    model = weight_only_quantize(model, quant_mode, exclude_modules)
    return model, quantize_state_dict(model, state, quant_mode)

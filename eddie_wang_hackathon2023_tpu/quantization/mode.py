"""Quantisation recipe bit-flags.

API-compatible with the reference's ``tensorrt_llm/quantization/mode.py:4-137``
(the flag set is backend-neutral: it describes a recipe, not kernels).
Re-implemented for jnp-side consumption; predicates and constructors keep
the reference names so model code and configs port 1:1.
"""
from __future__ import annotations

from enum import IntFlag


class QuantMode(IntFlag):
    INT4_WEIGHTS = 1 << 0
    INT8_WEIGHTS = 1 << 1
    ACTIVATIONS = 1 << 2
    PER_CHANNEL = 1 << 3
    PER_TOKEN = 1 << 4
    INT8_KV_CACHE = 1 << 5
    FP8_KV_CACHE = 1 << 6

    _WEIGHT_OR_ACT = INT4_WEIGHTS | INT8_WEIGHTS | ACTIVATIONS
    _ALL = (1 << 7) - 1

    def _exactly(self, bits: "QuantMode", mask: "QuantMode") -> bool:
        return (self & mask) == bits

    def _any_of(self, bits: "QuantMode") -> bool:
        return bool(self & bits)

    def is_int8_weight_only(self) -> bool:
        return self._exactly(QuantMode.INT8_WEIGHTS, QuantMode._WEIGHT_OR_ACT)

    def is_int4_weight_only(self) -> bool:
        return self._exactly(QuantMode.INT4_WEIGHTS, QuantMode._WEIGHT_OR_ACT)

    def is_weight_only(self) -> bool:
        return self.is_int8_weight_only() or self.is_int4_weight_only()

    def has_act_and_weight_quant(self) -> bool:
        return self._exactly(QuantMode.INT8_WEIGHTS | QuantMode.ACTIVATIONS,
                             QuantMode._WEIGHT_OR_ACT)

    def has_per_token_dynamic_scaling(self) -> bool:
        return self._any_of(QuantMode.PER_TOKEN)

    def has_act_static_scaling(self) -> bool:
        return not self.has_per_token_dynamic_scaling()

    def has_per_channel_scaling(self) -> bool:
        return self._any_of(QuantMode.PER_CHANNEL)

    def has_int8_kv_cache(self) -> bool:
        return self._any_of(QuantMode.INT8_KV_CACHE)

    def has_fp8_kv_cache(self) -> bool:
        return self._any_of(QuantMode.FP8_KV_CACHE)

    def has_any_quant(self) -> bool:
        return self._any_of(QuantMode.INT8_WEIGHTS | QuantMode.INT4_WEIGHTS
                            | QuantMode.ACTIVATIONS | QuantMode.INT8_KV_CACHE
                            | QuantMode.FP8_KV_CACHE)

    def set_int8_kv_cache(self) -> "QuantMode":
        return self | QuantMode.INT8_KV_CACHE

    def set_fp8_kv_cache(self) -> "QuantMode":
        return self | QuantMode.FP8_KV_CACHE

    @staticmethod
    def from_description(quantize_weights: bool = False,
                         quantize_activations: bool = False,
                         per_token: bool = False,
                         per_channel: bool = False,
                         use_int4_weights: bool = False,
                         use_int8_kv_cache: bool = False,
                         use_fp8_kv_cache: bool = False) -> "QuantMode":
        if quantize_activations and not quantize_weights:
            raise ValueError("activation quant requires weight quant")
        if (per_token or per_channel) and not (quantize_weights
                                               and quantize_activations):
            raise ValueError("per_token/per_channel require weight+act quant")
        mode = QuantMode(0)
        if quantize_weights:
            mode |= (QuantMode.INT4_WEIGHTS if use_int4_weights
                     else QuantMode.INT8_WEIGHTS)
        if quantize_activations:
            mode |= QuantMode.ACTIVATIONS
        if per_channel:
            mode |= QuantMode.PER_CHANNEL
        if per_token:
            mode |= QuantMode.PER_TOKEN
        if use_int8_kv_cache:
            mode |= QuantMode.INT8_KV_CACHE
        if use_fp8_kv_cache:
            mode |= QuantMode.FP8_KV_CACHE
        return mode

    @staticmethod
    def use_smooth_quant(per_token: bool = False,
                         per_channel: bool = False) -> "QuantMode":
        return QuantMode.from_description(True, True, per_token, per_channel)

    @staticmethod
    def use_weight_only(use_int4_weights: bool = False) -> "QuantMode":
        return QuantMode.from_description(
            quantize_weights=True, use_int4_weights=use_int4_weights)

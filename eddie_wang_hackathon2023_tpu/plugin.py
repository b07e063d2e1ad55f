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
    # flash-attention (block_q, block_k_major, block_k); None = 512,512,512
    flash_blocks: Optional[Tuple[int, int, int]] = None
    # whisper transcribe as ONE jitted mel->tokens program vs the (faster
    # on v5e, see pipeline.transcribe) staged 3-program pipeline
    fused_transcribe: Optional[bool] = None

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

    def get_flash_blocks(self) -> Tuple[int, int, int]:
        v = os.environ.get("EWT_FLASH_BLOCKS")
        if v is not None:
            return tuple(int(x) for x in v.split(","))  # type: ignore
        if self.flash_blocks is not None:
            return tuple(self.flash_blocks)  # type: ignore
        return (512, 512, 512)

    def use_fused_transcribe(self) -> bool:
        return bool(self.fused_transcribe)

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

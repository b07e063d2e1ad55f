"""Program export / AOT compilation — the "serialized engine" story.

The reference's deployable artifact is a TensorRT engine: an offline-
compiled, serialized program loaded by a thin runtime
(``serialize_engine`` E/whisper/build.py:33-40, ``Session.from_serialized_
engine`` T/runtime/session.py:54).  The TPU-native equivalents:

* :func:`export_program` / :func:`load_program` — portable serialized
  StableHLO (jax.export): survives process restarts and jax upgrades
  within the compatibility window, loadable without the model code;
* :func:`aot_compile` — ahead-of-time compile of a jitted function to a
  device executable in this process (skips trace+lower on first call;
  pairs with the persistent compile cache enabled by
  builder.enable_compile_cache, the timing-cache analogue).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax


def _specs(args):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)


def export_program(fn, example_args, path: Optional[str] = None,
                   platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``jit(fn)`` traced at ``example_args`` shapes to portable
    bytes (ref serialize_engine).  ``platforms`` defaults to the current
    backend; pass e.g. ("cpu", "tpu") for a multi-platform artifact."""
    from jax import export as jexport
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    plats = tuple(platforms) if platforms else (jax.default_backend(),)
    exp = jexport.export(jitted, platforms=plats)(*_specs(example_args))
    blob = exp.serialize()
    if path is not None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    return blob


def load_program(path_or_bytes):
    """Deserialize an exported program to a callable (ref
    Session.from_serialized_engine).  The returned callable re-jits the
    embedded StableHLO, so repeated calls hit the executable cache."""
    from jax import export as jexport
    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    exp = jexport.deserialize(blob)
    return jax.jit(exp.call)


def aot_compile(fn, example_args):
    """Trace + lower + compile now; returns the executable (ref
    build_engine — but seconds, not hours, and cached persistently)."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    return jitted.lower(*example_args).compile()


def dump_hlo(fn, example_args, path: Optional[str] = None,
             optimized: bool = False) -> str:
    """Program text for inspection (ref E/gpt/visualize.py, which dumps
    the TRT engine graph).  ``optimized=True`` returns the post-XLA HLO of
    the compiled executable; otherwise the traced StableHLO module."""
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    lowered = jitted.lower(*example_args)
    if optimized:
        text = lowered.compile().as_text()
    else:
        text = lowered.as_text()
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text

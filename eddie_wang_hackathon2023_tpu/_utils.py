"""Dtype and misc utilities.

TPU-native counterpart of the reference's ``tensorrt_llm/_utils.py``
(`/root/reference/tensorrt_llm_july-release-v1/tensorrt_llm/_utils.py`): the
torch/TRT dtype conversion table becomes a str <-> jnp dtype table, and the
MPI glue (`_utils.py:181-191`) is replaced by jax.distributed process info.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_STR_TO_DTYPE = {
    "float16": jnp.float16,
    "bfloat16": jnp.bfloat16,
    "float32": jnp.float32,
    "int8": jnp.int8,
    "int4": jnp.int4,
    "uint8": jnp.uint8,
    "int32": jnp.int32,
    "int64": jnp.int64,
    "bool": jnp.bool_,
    "fp8": jnp.float8_e4m3fn,
}

_DTYPE_TO_STR = {np.dtype(v): k for k, v in _STR_TO_DTYPE.items() if k != "fp8"}


def runtime_platform() -> str:
    """Platform computations actually run on.  ``jax.default_backend()``
    reports the highest-priority REGISTERED backend even when
    ``jax_default_device`` pins execution elsewhere (e.g. CPU-pinned tests
    with a TPU plugin loaded) — kernel disppatch must look at the pin."""
    dd = jax.config.jax_default_device
    return dd.platform if dd is not None else jax.default_backend()


def on_tpu() -> bool:
    return runtime_platform() == "tpu"


def str_dtype_to_jnp(dtype: str):
    """Map a config-file dtype string to a jnp dtype (ref: str_dtype_to_trt)."""
    if dtype not in _STR_TO_DTYPE:
        raise ValueError(f"unknown dtype string: {dtype!r}")
    return _STR_TO_DTYPE[dtype]


def jnp_dtype_to_str(dtype) -> str:
    """Inverse of :func:`str_dtype_to_jnp`."""
    return _DTYPE_TO_STR[np.dtype(dtype)]


def pad_vocab_size(vocab_size: int, tp_size: int) -> int:
    """Pad vocab so it divides evenly across tensor-parallel ranks
    (ref: ``tensorrt_llm/_utils.py:194``)."""
    return int(np.ceil(vocab_size / tp_size) * tp_size)


def process_index() -> int:
    """This host's process index (ref mpi_rank, ``_utils.py:185``)."""
    return jax.process_index()


def process_count() -> int:
    """Number of participating hosts (ref mpi_world_size, ``_utils.py:189``)."""
    return jax.process_count()


def fp32_array(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def int32_array(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int32)

"""Weight container.

Counterpart of the reference's ``tensorrt_llm/parameter.py:11-59`` where a
Parameter is an np-backed weight lazily materialised as a TRT constant.  Here
a Parameter owns a (numpy or jax) array plus a ``jax.sharding.PartitionSpec``
describing how it is laid out over the device mesh — the TPU-native
replacement for the reference's build-time TP splits (ColumnLinear /
RowLinear shard their weights host-side; we annotate and let pjit/XLA
place the shards over ICI).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec

from ._utils import str_dtype_to_jnp


class Parameter:
    _DEFAULT_DTYPE = jnp.float32

    def __init__(self,
                 value=None,
                 shape: Optional[Tuple[int, ...]] = None,
                 dtype=None,
                 pspec: Optional[PartitionSpec] = None):
        if dtype is None:
            dtype = self._DEFAULT_DTYPE
        if isinstance(dtype, str):
            dtype = str_dtype_to_jnp(dtype)
        self._dtype = dtype
        self._shape = tuple(shape) if shape is not None else None
        self._value = None
        self.pspec = pspec if pspec is not None else PartitionSpec()
        if value is not None:
            self.value = value

    @property
    def shape(self):
        return self._shape if self._value is None else tuple(self._value.shape)

    @property
    def dtype(self):
        return self._dtype

    @property
    def is_inited(self) -> bool:
        return self._value is not None

    @property
    def value(self):
        """The bound array.  Concrete between calls; a tracer inside
        ``Module.apply`` (functional binding)."""
        if self._value is None:
            raise RuntimeError(
                "Parameter used before a weight was loaded or bound; "
                "call load_state_dict()/random_init() or Module.apply(params, ...)")
        return self._value

    @value.setter
    def value(self, v):
        if isinstance(v, np.ndarray):
            v = jnp.asarray(v)
        if hasattr(v, "dtype") and v.dtype != np.dtype(self._dtype) and not _is_tracer(v):
            v = v.astype(self._dtype)
        if self._shape is not None and tuple(v.shape) != self._shape:
            raise ValueError(
                f"Parameter shape mismatch: expected {self._shape}, got {tuple(v.shape)}")
        self._value = v

    def _bind(self, v):
        """Bind without dtype/shape coercion (used by Module.apply with tracers)."""
        self._value = v

    def random_init(self, key, scale: float = 0.02):
        import jax
        if self._shape is None:
            raise RuntimeError("cannot random_init a Parameter without a declared shape")
        if jnp.issubdtype(self._dtype, jnp.integer):
            self._value = jnp.zeros(self._shape, self._dtype)
        else:
            self._value = (scale * jax.random.normal(
                key, self._shape, jnp.float32)).astype(self._dtype)

    def __repr__(self):
        return f"Parameter(shape={self.shape}, dtype={jnp.dtype(self._dtype).name}, pspec={self.pspec})"


def _is_tracer(v) -> bool:
    import jax.core
    return isinstance(v, jax.core.Tracer)

"""Sharding placement helpers.

The reference splits weights host-side per rank (ColumnLinear/RowLinear
``linear.py:51,111``) and runs collectives through NCCL plugins.  Here a
parameter's :class:`PartitionSpec` (declared by the layer that owns it) plus
these helpers place each weight over the mesh once; XLA then emits the
all-gather / reduce-scatter / all-reduce over ICI as demanded by the jitted
program — the whole ncclPlugin layer (1545 LoC C++) dissolves into
annotations.
"""
from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def named_sharding(mesh: Mesh, pspec: PartitionSpec) -> NamedSharding:
    return NamedSharding(mesh, pspec)


def replicate(mesh: Mesh):
    return NamedSharding(mesh, PartitionSpec())


def shard_state(state: Dict, pspecs: Dict, mesh: Mesh) -> Dict:
    """device_put every weight with its declared PartitionSpec.

    ``state`` and ``pspecs`` are the {dotted_name: ...} dicts produced by
    ``Module.state_dict()`` / ``Module.pspecs()``.
    """
    out = {}
    for k, v in state.items():
        spec = pspecs.get(k, PartitionSpec())
        # Drop axis names for dims that don't divide evenly (e.g. a conv
        # channel dim not divisible by tp) — replicate those instead.
        spec = _legalize(spec, v.shape, mesh)
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


def _legalize(spec: PartitionSpec, shape, mesh: Mesh) -> PartitionSpec:
    parts = []
    for i, axis in enumerate(tuple(spec)):
        if axis is None:
            parts.append(None)
            continue
        size = mesh.shape[axis] if not isinstance(axis, tuple) else 1
        if i < len(shape) and shape[i] % max(size, 1) == 0:
            parts.append(axis)
        else:
            # replicating instead of sharding silently costs memory and
            # bandwidth at scale — make the fallback visible
            from ..logger import logger
            logger.warning(
                f"sharding: dim {i} of shape {tuple(shape)} not divisible "
                f"by mesh axis '{axis}' (size {size}); replicating instead")
            parts.append(None)
    return PartitionSpec(*parts)

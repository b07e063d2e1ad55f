"""Device-topology mapping.

Counterpart of the reference's ``tensorrt_llm/mapping.py:5-14``, where
``Mapping(world_size, rank)`` hardcodes tp_size == world_size and the NCCL
group is a static set baked into the engine.  TPU-native version: a Mapping
owns a :class:`jax.sharding.Mesh` with named axes — ``dp`` (data/batch),
``tp`` (tensor) and ``pp`` (pipeline, reserved) — and collectives are emitted
by XLA from sharding annotations over ICI/DCN rather than called explicitly.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DP_AXIS = "dp"
TP_AXIS = "tp"


def pad_vocab_size(vocab_size: int, tp_size: int) -> int:
    """Round the vocab up to a tp-divisible size (ref ``pad_vocab_size``,
    T/_utils.py:194) so the embedding table and lm-head actually shard
    instead of silently replicating (51865 is prime-ish: large-v2 on tp=4
    replicates 132 MB per rank without this).  Pad rows are zero and the
    models slice logits back to the logical vocab."""
    return -(-vocab_size // max(tp_size, 1)) * max(tp_size, 1)
PP_AXIS = "pp"


class Mapping:

    def __init__(self,
                 world_size: Optional[int] = None,
                 rank: int = 0,
                 gpus_per_node: int = 0,  # kept for API parity; unused on TPU
                 tp_size: Optional[int] = None,
                 dp_size: int = 1,
                 pp_size: int = 1,
                 devices: Optional[Sequence] = None):
        if devices is None:
            devices = jax.devices()
        n = len(devices)
        if world_size is None:
            world_size = n
        if world_size > n:
            raise ValueError(f"world_size {world_size} > available devices {n}")
        devices = list(devices)[:world_size]
        if tp_size is None:
            # reference behaviour: everything is TP (mapping.py:12-14)
            tp_size = world_size // (dp_size * pp_size)
        if dp_size * tp_size * pp_size != world_size:
            raise ValueError(
                f"dp({dp_size}) * tp({tp_size}) * pp({pp_size}) != world({world_size})")
        self.world_size = world_size
        self.rank = rank
        self.tp_size = tp_size
        self.dp_size = dp_size
        self.pp_size = pp_size
        self.tp_group = list(range(world_size))  # parity with ref mapping.py:14
        dev_array = np.asarray(devices).reshape(dp_size, tp_size, pp_size)
        self.mesh = Mesh(dev_array, (DP_AXIS, TP_AXIS, PP_AXIS))

    @property
    def is_distributed(self) -> bool:
        return self.world_size > 1

    def __repr__(self):
        return (f"Mapping(world={self.world_size}, dp={self.dp_size}, "
                f"tp={self.tp_size}, pp={self.pp_size})")


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap — replaces the reference's MPI launch
    (mpirun -np N, ref D/gpt_runtime.md).  DCN links the hosts; ICI links the
    chips within a host; both are driven by the same mesh."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)

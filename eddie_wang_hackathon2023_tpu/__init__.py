"""eddie_wang_hackathon2023_tpu — a TPU-native quantized inference framework
with the capabilities of the TensorRT-LLM Whisper hackathon reference
(Eddie-Wang1120/Eddie-Wang-Hackathon2023), rebuilt on JAX/XLA/Pallas/pjit.

Layer map vs the reference (see SURVEY.md):
  graph DSL + TRT builder + engines  ->  jnp ops + jit/pjit + XLA compile cache
  CUDA plugin kernels                ->  Pallas kernels (+ XLA fallbacks)
  NCCL/MPI collectives               ->  mesh sharding annotations over ICI/DCN
  C++ GptSession / batch manager     ->  on-device lax.while_loop generation
                                         + host-side continuous batching runtime
"""

__version__ = "0.1.0"

from . import functional
from . import profiler
from ._utils import str_dtype_to_jnp, jnp_dtype_to_str, pad_vocab_size
from .logger import logger
from .module import Module, ModuleList, stack_params
from .parameter import Parameter
from .parallel.mapping import Mapping
from .quantization import QuantMode
from .plugin import PluginConfig, get_plugin_config, plugin_config, \
    set_plugin_config

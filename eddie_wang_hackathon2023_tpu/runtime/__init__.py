from .generation import GenerationSession, ModelConfig
from .sampling import SamplingConfig
from .kv_cache_manager import (Block, BlocksManager, GenerationSequence,
                               KVCacheManager)

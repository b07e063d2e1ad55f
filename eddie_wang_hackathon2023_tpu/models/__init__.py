"""Model zoo (counterpart of ``tensorrt_llm/models/__init__.py``; whisper is
the flagship workload, registered there at :11)."""
from .whisper import (CrossAttnKV, WhisperConfig, WhisperDecoder,
                      WhisperEncoder, whisper_config)

from .config import WhisperConfig, whisper_config
from .model import (CrossAttnKV, ResidualAttentionBlock, WhisperDecoder,
                    WhisperEncoder)
from .convert import (encoder_state_dict, decoder_state_dict,
                      cross_kv_state_dict, hf_to_openai_state_dict,
                      load_openai_state_dict)

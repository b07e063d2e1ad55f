from .attention import (
    multihead_attention,
    cached_decode_attention,
    append_kv,
    length_mask_bias,
)
from .quant_matmul import weight_only_quant_matmul, quantize_weights_int8, quantize_weights_int4

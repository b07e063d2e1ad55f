"""Op library.

Counterpart of the reference's graph-building DSL
(``tensorrt_llm/functional.py``, 3480 LoC of symbolic ops lowering to TRT
layers).  On TPU there is no symbolic layer: jax *is* the tracing system, so
each op here is a plain jnp/lax function with the same semantics as the
reference op it replaces (file:line cited per function).  Shape/slice/concat
style graph plumbing that the reference had to wrap (because TRT tensors are
not arrays) needs no wrapper here — use jnp directly; the functions kept in
this module are the ones with real numerical contracts.

Fused attention / quantized-matmul ops (the reference's plugin calls,
``functional.py:2738 gpt_attention``, quantization/functional.py) live in
:mod:`..ops` as Pallas kernels with XLA fallbacks.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# activations (ref: functional.py:2044 gelu, :1390 relu, :1403 sigmoid,
#              :1420 tanh, :2098 silu, :2112 swiglu, layers/activation.py Mish)
# ---------------------------------------------------------------------------


def gelu(x):
    """tanh-approximated GELU, matching the reference graph
    (``functional.py:2044-2059``: 0.5x(1+tanh(sqrt(2/pi)(x+0.044715x^3)))
    and OpenAI Whisper's torch F.gelu numerics closely."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    """erf GELU — what torch ``F.gelu`` computes by default; Whisper's
    PyTorch reference uses this.  WER-parity-critical choice is made by the
    model, not here."""
    return jax.nn.gelu(x, approximate=False)


def relu(x):
    return jax.nn.relu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def tanh(x):
    return jnp.tanh(x)


def silu(x):
    return jax.nn.silu(x)


def swiglu(x):
    """ref functional.py:2112 — splits the last dim in half, silu-gates."""
    a, b = jnp.split(x, 2, axis=-1)
    return silu(b) * a


def geglu(x):
    a, b = jnp.split(x, 2, axis=-1)
    return gelu(b) * a


def mish(x):
    """ref layers/activation.py Mish: x * tanh(softplus(x))."""
    return x * jnp.tanh(jax.nn.softplus(x))


def identity(x):
    return x


ACT2FN = {
    "gelu": gelu,
    "gelu_new": gelu,
    "gelu_exact": gelu_exact,
    "relu": relu,
    "silu": silu,
    "swiglu": swiglu,
    "geglu": geglu,
    "mish": mish,
    "tanh": tanh,
    "sigmoid": sigmoid,
    "identity": identity,
}

GATED_ACTIVATIONS = {"swiglu", "geglu"}


def is_gated_activation(act: str) -> bool:
    """ref functional.py is_gated_activation."""
    return act in GATED_ACTIVATIONS


# ---------------------------------------------------------------------------
# linear algebra
# ---------------------------------------------------------------------------


def matmul(a, b, transa: bool = False, transb: bool = False,
           preferred_element_type=None):
    """ref functional.py:728 — batched matmul with optional transposes.
    ``preferred_element_type`` controls MXU accumulation dtype."""
    if transa:
        a = jnp.swapaxes(a, -1, -2)
    if transb:
        b = jnp.swapaxes(b, -1, -2)
    return jnp.matmul(a, b, preferred_element_type=preferred_element_type)


def softmax(x, dim: int = -1):
    """ref functional.py:1557."""
    return jax.nn.softmax(x, axis=dim)


def log_softmax(x, dim: int = -1):
    return jax.nn.log_softmax(x, axis=dim)


def embedding(tokens, weight):
    """ref functional.py:1642 — gather rows of ``weight`` by token id."""
    return jnp.take(weight, tokens, axis=0)


def lookup(tokens, weight):
    """alias matching the reference's TP lookup plugin semantics
    (plugins/lookupPlugin); sharded variants live in layers.Embedding."""
    return embedding(tokens, weight)


# ---------------------------------------------------------------------------
# normalisation (ref functional.py:3142 layer_norm, :3238 rms_norm,
#                layers/normalization.py GroupNorm)
# ---------------------------------------------------------------------------


def layer_norm(x, weight=None, bias=None, eps: float = 1e-5):
    """LayerNorm over the last axis with fp32 statistics regardless of input
    dtype (matches TRT's fp32 LN accumulation and the layernormPlugin)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def rms_norm(x, weight=None, eps: float = 1e-6):
    """ref functional.py:3238 — no mean subtraction, no bias."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(orig_dtype)


def group_norm(x, num_groups: int, weight=None, bias=None, eps: float = 1e-5):
    """ref layers/normalization.py:57 — x is [N, C, ...spatial]."""
    orig_dtype = x.dtype
    n, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    xf = x.astype(jnp.float32).reshape(n, num_groups, c // num_groups, -1)
    mean = jnp.mean(xf, axis=(2, 3), keepdims=True)
    var = jnp.var(xf, axis=(2, 3), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, c, *spatial)
    if weight is not None:
        y = y * weight.astype(jnp.float32).reshape(1, c, *([1] * len(spatial)))
    if bias is not None:
        y = y + bias.astype(jnp.float32).reshape(1, c, *([1] * len(spatial)))
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# convolution (ref functional.py:2114 conv2d, :2202 conv1d — the hackathon's
# conv1d reshapes to a 2-D conv; on TPU we call conv_general_dilated directly
# with a width-1 trailing dim only when it helps XLA; 1-D is native here)
# ---------------------------------------------------------------------------


def conv1d(x, weight, bias=None, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1):
    """x: [B, C_in, L]; weight: [C_out, C_in/groups, K] (torch layout, as the
    reference stores it — ``layers/conv.py:52-94`` keeps [out,in,k,1])."""
    out = jax.lax.conv_general_dilated(
        x, weight,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias[None, :, None].astype(out.dtype)
    return out


def conv2d(x, weight, bias=None, stride=(1, 1), padding=(0, 0),
           dilation=(1, 1), groups: int = 1):
    """x: [B, C_in, H, W]; weight: [C_out, C_in/groups, KH, KW]."""
    out = jax.lax.conv_general_dilated(
        x, weight,
        window_strides=tuple(stride),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        rhs_dilation=tuple(dilation),
        feature_group_count=groups,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias[None, :, None, None].astype(out.dtype)
    return out


def conv_transpose2d(x, weight, bias=None, stride=(1, 1), padding=(0, 0)):
    """ref layers/conv.py ConvTranspose2d; weight [C_in, C_out, KH, KW]
    (torch layout).  transpose_kernel=True treats the kernel as the
    forward conv's [O,I] and flips it; torch's ``padding`` p maps to
    lax padding k-1-p (verified against torch for stride 1..3, p 0..2)."""
    kh, kw = weight.shape[2], weight.shape[3]
    out = jax.lax.conv_transpose(
        x, weight,
        strides=tuple(stride),
        padding=[(kh - 1 - padding[0], kh - 1 - padding[0]),
                 (kw - 1 - padding[1], kw - 1 - padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        transpose_kernel=True,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias[None, :, None, None].astype(out.dtype)
    return out


def avg_pool2d(x, kernel_size, stride=None, padding=(0, 0)):
    """ref functional.py avg_pool / layers AvgPool2d; x [B, C, H, W]."""
    if stride is None:
        stride = kernel_size
    window = (1, 1) + tuple(kernel_size)
    strides = (1, 1) + tuple(stride)
    pads = ((0, 0), (0, 0), (padding[0], padding[0]), (padding[1], padding[1]))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    return summed / float(kernel_size[0] * kernel_size[1])


# ---------------------------------------------------------------------------
# misc ops with numeric contracts
# ---------------------------------------------------------------------------


def clip(x, lo, hi):
    """ref functional.py clip."""
    return jnp.clip(x, lo, hi)


def round_half_away(x):
    """Round half away from zero — TRT/CUDA ``round()`` semantics used by the
    reference's int8 KV quantisation (layers/attention.py:341); differs from
    jnp.round (banker's rounding)."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def where(cond, a, b):
    return jnp.where(cond, a, b)


def masked_fill(x, mask, value):
    return jnp.where(mask, jnp.asarray(value, x.dtype), x)


def generate_alibi_slopes(num_heads: int) -> np.ndarray:
    """ref functional.py:3265 — ALiBi head slopes, [1, num_heads, 1, 1]."""
    closest_power_of_2 = 2 ** int(np.floor(np.log2(num_heads)))
    base = 2 ** (-(2 ** -(np.log2(closest_power_of_2) - 3)))
    powers = np.arange(1, 1 + closest_power_of_2)
    slopes = base ** powers
    if closest_power_of_2 != num_heads:
        extra_base = 2 ** (-(2 ** -(np.log2(2 * closest_power_of_2) - 4)))
        num_remaining = min(closest_power_of_2, num_heads - closest_power_of_2)
        extra_powers = np.arange(1, 1 + 2 * num_remaining, 2)
        slopes = np.concatenate([slopes, extra_base ** extra_powers])
    return slopes.astype(np.float32).reshape(1, num_heads, 1, 1)


def generate_alibi_biases(slopes, key_length: int):
    """ref functional.py generate_alibi_biases: [1, H, 1, key_len]."""
    arange = jnp.arange(key_length, dtype=jnp.float32).reshape(1, 1, 1, -1)
    return slopes * arange


def causal_bias(q_len: int, k_len: int, dtype=jnp.float32):
    """Additive causal mask bias: 0 on/below the (shifted) diagonal, -inf
    above — the reference builds this as a constant and slices
    (layers/attention.py:363-377); query i attends keys <= i + (k_len - q_len)."""
    q = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (q_len, k_len), 1)
    return jnp.where(k <= q + (k_len - q_len), 0.0, -jnp.inf).astype(dtype)


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper encoder positional embedding (ref E/whisper/weight.py:24-30)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(np.float32)


def rope(x, positions, theta: float = 10000.0, rotary_dim: Optional[int] = None,
         neox_style: bool = True):
    """Rotary position embedding (the reference applies RoPE inside the
    GPTAttention plugin, gptAttentionCommon.cpp; semantics per GPT-NeoX /
    GPT-J style toggle).  x: [..., seq, n_heads, head_dim]; positions [..., seq]."""
    head_dim = x.shape[-1]
    rd = rotary_dim or head_dim
    half = rd // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., seq, half]
    cos = jnp.cos(angles)[..., None, :]
    sin = jnp.sin(angles)[..., None, :]
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    xf = x_rot.astype(jnp.float32)
    if neox_style:
        x1, x2 = xf[..., :half], xf[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    else:  # GPT-J interleaved
        x1, x2 = xf[..., 0::2], xf[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.stack([r1, r2], axis=-1).reshape(xf.shape)
    return jnp.concatenate([out.astype(x.dtype), x_pass], axis=-1)


def split(x, size_or_sizes, dim: int = 0):
    """ref functional.py split — torch-style: int means chunk size."""
    total = x.shape[dim]
    if isinstance(size_or_sizes, int):
        sizes = [size_or_sizes] * (total // size_or_sizes)
    else:
        sizes = list(size_or_sizes)
    indices = np.cumsum(sizes)[:-1]
    return jnp.split(x, indices, axis=dim)

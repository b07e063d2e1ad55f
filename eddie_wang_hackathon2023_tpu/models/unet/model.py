"""Stable-Diffusion UNet (2D conditional).

Counterpart of ``T/models/unet/`` (1484 LoC across attention.py,
embeddings.py, resnet.py, unet_2d_blocks.py, unet_2d_condition.py:9-124 —
itself a port of diffusers' SD-1.x UNet2DConditionModel).  Same
architecture: sinusoidal timestep embedding -> conv_in -> 3 CrossAttnDown +
1 Down -> mid (ResNet/CrossAttn/ResNet) -> symmetric up path with skip
concatenation -> GroupNorm/SiLU/conv_out.  NCHW layout; GroupNorm in fp32;
flash/XLA attention over flattened spatial tokens.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...functional import conv2d, gelu, group_norm, silu
from ...layers import Conv2d, GroupNorm, LayerNorm, Linear
from ...module import Module, ModuleList
from ...ops.attention import multihead_attention
from ...parameter import Parameter


@dataclasses.dataclass
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8
    norm_num_groups: int = 32
    dtype: str = "bfloat16"


class Timesteps(Module):
    """Sinusoidal timestep embedding (ref embeddings.py Timesteps; SD flips
    sin/cos and does not scale)."""

    def __init__(self, num_channels: int):
        super().__init__()
        self.num_channels = num_channels

    def forward(self, timesteps):
        half = self.num_channels // 2
        exponent = -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
        emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
        return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


class TimestepEmbedding(Module):
    """ref embeddings.py TimestepEmbedding: linear -> silu -> linear."""

    def __init__(self, channel: int, time_embed_dim: int, dtype=None):
        super().__init__()
        self.linear_1 = Linear(channel, time_embed_dim, dtype=dtype)
        self.linear_2 = Linear(time_embed_dim, time_embed_dim, dtype=dtype)

    def forward(self, sample):
        return self.linear_2(silu(self.linear_1(sample)))


class ResnetBlock2D(Module):
    """ref resnet.py ResnetBlock2D: GN/SiLU/conv + time-emb add + GN/SiLU/
    conv with residual (1x1 shortcut on channel change)."""

    def __init__(self, in_channels: int, out_channels: int, temb_channels: int,
                 groups: int = 32, dtype=None):
        super().__init__()
        self.norm1 = GroupNorm(groups, in_channels, dtype=dtype)
        self.conv1 = Conv2d(in_channels, out_channels, 3, padding=1, dtype=dtype)
        self.time_emb_proj = Linear(temb_channels, out_channels, dtype=dtype)
        self.norm2 = GroupNorm(groups, out_channels, dtype=dtype)
        self.conv2 = Conv2d(out_channels, out_channels, 3, padding=1, dtype=dtype)
        if in_channels != out_channels:
            self.conv_shortcut = Conv2d(in_channels, out_channels, 1, dtype=dtype)
        else:
            object.__setattr__(self, "conv_shortcut", None)

    def forward(self, x, temb):
        h = self.conv1(silu(self.norm1(x)))
        h = h + self.time_emb_proj(silu(temb))[:, :, None, None]
        h = self.conv2(silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return h + sc


class CrossAttention(Module):
    """ref attention.py CrossAttention: q from x, k/v from context."""

    def __init__(self, query_dim: int, context_dim: Optional[int],
                 heads: int, dim_head: int, dtype=None):
        super().__init__()
        inner = heads * dim_head
        ctx = context_dim or query_dim
        self.heads = heads
        self.dim_head = dim_head
        self.to_q = Linear(query_dim, inner, bias=False, dtype=dtype)
        self.to_k = Linear(ctx, inner, bias=False, dtype=dtype)
        self.to_v = Linear(ctx, inner, bias=False, dtype=dtype)
        self.to_out = Linear(inner, query_dim, dtype=dtype)

    def forward(self, x, context=None):
        context = x if context is None else context
        b, l, _ = x.shape
        lk = context.shape[1]

        def heads(t, L):
            return t.reshape(b, L, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q = heads(self.to_q(x), l)
        k = heads(self.to_k(context), lk)
        v = heads(self.to_v(context), lk)
        ctx = multihead_attention(q, k, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, -1)
        return self.to_out(ctx)


class FeedForward(Module):
    """ref attention.py FeedForward: GEGLU."""

    def __init__(self, dim: int, mult: int = 4, dtype=None):
        super().__init__()
        inner = dim * mult
        self.proj_in = Linear(dim, inner * 2, dtype=dtype)
        self.proj_out = Linear(inner, dim, dtype=dtype)

    def forward(self, x):
        a, b = jnp.split(self.proj_in(x), 2, axis=-1)
        return self.proj_out(a * gelu(b))


class BasicTransformerBlock(Module):

    def __init__(self, dim: int, context_dim: int, heads: int, dim_head: int,
                 dtype=None):
        super().__init__()
        self.norm1 = LayerNorm(dim, dtype=dtype)
        self.attn1 = CrossAttention(dim, None, heads, dim_head, dtype=dtype)
        self.norm2 = LayerNorm(dim, dtype=dtype)
        self.attn2 = CrossAttention(dim, context_dim, heads, dim_head,
                                    dtype=dtype)
        self.norm3 = LayerNorm(dim, dtype=dtype)
        self.ff = FeedForward(dim, dtype=dtype)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(Module):
    """ref attention.py Transformer2DModel: GN -> 1x1 in -> blocks over
    flattened spatial -> 1x1 out + residual."""

    def __init__(self, channels: int, context_dim: int, heads: int,
                 depth: int = 1, groups: int = 32, dtype=None):
        super().__init__()
        dim_head = channels // heads
        self.norm = GroupNorm(groups, channels, dtype=dtype)
        self.proj_in = Conv2d(channels, channels, 1, dtype=dtype)
        self.blocks = ModuleList([
            BasicTransformerBlock(channels, context_dim, heads, dim_head,
                                  dtype=dtype) for _ in range(depth)])
        self.proj_out = Conv2d(channels, channels, 1, dtype=dtype)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.proj_in(self.norm(x))
        x = x.reshape(b, c, h * w).transpose(0, 2, 1)
        for blk in self.blocks:
            x = blk(x, context)
        x = x.transpose(0, 2, 1).reshape(b, c, h, w)
        return self.proj_out(x) + residual


class Downsample2D(Module):

    def __init__(self, channels: int, dtype=None):
        super().__init__()
        self.conv = Conv2d(channels, channels, 3, stride=2, padding=1,
                           dtype=dtype)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(Module):
    """Nearest-neighbour 2x + conv (ref resnet.py Upsample2D)."""

    def __init__(self, channels: int, dtype=None):
        super().__init__()
        self.conv = Conv2d(channels, channels, 3, padding=1, dtype=dtype)

    def forward(self, x):
        b, c, h, w = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return self.conv(x)


class UNet2DConditionModel(Module):
    """ref unet_2d_condition.py:9-124."""

    def __init__(self, config: UNetConfig):
        super().__init__()
        c = config
        self.config = c
        ch = c.block_out_channels
        time_dim = ch[0] * 4
        self.time_proj = Timesteps(ch[0])
        self.time_embedding = TimestepEmbedding(ch[0], time_dim, dtype=c.dtype)
        self.conv_in = Conv2d(c.in_channels, ch[0], 3, padding=1, dtype=c.dtype)

        heads = lambda width: max(width // (c.attention_head_dim *
                                            (ch[0] // c.attention_head_dim)), 1) \
            if False else c.attention_head_dim
        # SD1.x: attention_head_dim == number of heads per block (8)

        # simulate the skip stack to derive every resnet's input width
        # (diffusers/ref channel bookkeeping)
        skip_channels = [ch[0]]
        down_blocks = []
        in_ch = ch[0]
        for i, out_ch in enumerate(ch):
            is_last = i == len(ch) - 1
            resnets, attns = [], []
            for j in range(c.layers_per_block):
                resnets.append(ResnetBlock2D(in_ch if j == 0 else out_ch,
                                             out_ch, time_dim,
                                             c.norm_num_groups, c.dtype))
                skip_channels.append(out_ch)
                if not is_last:
                    attns.append(Transformer2DModel(out_ch,
                                                    c.cross_attention_dim,
                                                    c.attention_head_dim,
                                                    groups=c.norm_num_groups,
                                                    dtype=c.dtype))
            block = Module()
            block.resnets = ModuleList(resnets)
            if attns:
                block.attentions = ModuleList(attns)
            if not is_last:
                block.downsampler = Downsample2D(out_ch, dtype=c.dtype)
                skip_channels.append(out_ch)
            down_blocks.append(block)
            in_ch = out_ch
        self.down_blocks = ModuleList(down_blocks)

        mid = Module()
        mid.resnet1 = ResnetBlock2D(ch[-1], ch[-1], time_dim,
                                    c.norm_num_groups, c.dtype)
        mid.attention = Transformer2DModel(ch[-1], c.cross_attention_dim,
                                           c.attention_head_dim,
                                           groups=c.norm_num_groups,
                                           dtype=c.dtype)
        mid.resnet2 = ResnetBlock2D(ch[-1], ch[-1], time_dim,
                                    c.norm_num_groups, c.dtype)
        self.mid_block = mid

        up_blocks = []
        rev = list(reversed(ch))
        prev_ch = ch[-1]
        for i, out_ch in enumerate(rev):
            is_first = i == 0
            resnets, attns = [], []
            for j in range(c.layers_per_block + 1):
                skip_ch = skip_channels.pop()
                resnets.append(ResnetBlock2D(prev_ch + skip_ch, out_ch,
                                             time_dim, c.norm_num_groups,
                                             c.dtype))
                prev_ch = out_ch
                if not is_first:
                    attns.append(Transformer2DModel(out_ch,
                                                    c.cross_attention_dim,
                                                    c.attention_head_dim,
                                                    groups=c.norm_num_groups,
                                                    dtype=c.dtype))
            block = Module()
            block.resnets = ModuleList(resnets)
            if attns:
                block.attentions = ModuleList(attns)
            if i != len(rev) - 1:
                block.upsampler = Upsample2D(out_ch, dtype=c.dtype)
            up_blocks.append(block)
        self.up_blocks = ModuleList(up_blocks)

        self.conv_norm_out = GroupNorm(c.norm_num_groups, ch[0], dtype=c.dtype)
        self.conv_out = Conv2d(ch[0], c.out_channels, 3, padding=1,
                               dtype=c.dtype)

    def forward(self, sample, timesteps, encoder_hidden_states):
        """sample [B, C, H, W]; timesteps [B]; context [B, L, ctx_dim]."""
        temb = self.time_embedding(
            self.time_proj(timesteps).astype(sample.dtype))
        x = self.conv_in(sample)
        skips = [x]
        for block in self.down_blocks:
            attns = getattr(block, "attentions", None)
            for j, res in enumerate(block.resnets):
                x = res(x, temb)
                if attns is not None:
                    x = attns[j](x, encoder_hidden_states)
                skips.append(x)
            if hasattr(block, "downsampler"):
                x = block.downsampler(x)
                skips.append(x)
        x = self.mid_block.resnet1(x, temb)
        x = self.mid_block.attention(x, encoder_hidden_states)
        x = self.mid_block.resnet2(x, temb)
        for block in self.up_blocks:
            attns = getattr(block, "attentions", None)
            for j, res in enumerate(block.resnets):
                skip = skips.pop()
                x = res(jnp.concatenate([x, skip], axis=1), temb)
                if attns is not None:
                    x = attns[j](x, encoder_hidden_states)
            if hasattr(block, "upsampler"):
                x = block.upsampler(x)
        x = self.conv_out(silu(self.conv_norm_out(x)))
        return x

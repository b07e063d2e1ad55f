"""SD UNet tests: component goldens vs torch + full-model shape/consistency
(diffusers is not in this image, so the full-model golden is structural)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from eddie_wang_hackathon2023_tpu.models.unet import (UNet2DConditionModel,
                                                      UNetConfig)
from eddie_wang_hackathon2023_tpu.models.unet.model import (ResnetBlock2D,
                                                            Timesteps)

CFG = UNetConfig(sample_size=16, in_channels=4, out_channels=4,
                 block_out_channels=(8, 16, 24, 24), layers_per_block=2,
                 cross_attention_dim=12, attention_head_dim=2,
                 norm_num_groups=4, dtype="float32")


def test_timesteps_matches_diffusers_formula():
    ts = Timesteps(8)
    t = jnp.asarray([0, 10, 999], jnp.int32)
    out = np.asarray(ts(t))
    half = 4
    exponent = -np.log(10000.0) * np.arange(half) / half
    emb = np.asarray([0, 10, 999], np.float64)[:, None] * np.exp(exponent)
    ref = np.concatenate([np.cos(emb), np.sin(emb)], axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_resnet_block_matches_torch():
    rs = np.random.RandomState(0)
    blk = ResnetBlock2D(8, 16, 32, groups=4, dtype="float32")
    blk.random_init(jax.random.PRNGKey(0), 0.05)
    x = rs.randn(1, 8, 6, 6).astype(np.float32)
    temb = rs.randn(1, 32).astype(np.float32)
    got = np.asarray(blk(jnp.asarray(x), jnp.asarray(temb)))

    import torch.nn.functional as tF
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in blk.state_dict().items()}
    xt = torch.from_numpy(x)
    tt = torch.from_numpy(temb)
    h = tF.group_norm(xt, 4, sd["norm1.weight"], sd["norm1.bias"])
    h = tF.conv2d(tF.silu(h), sd["conv1.weight"], sd["conv1.bias"], padding=1)
    h = h + tF.linear(tF.silu(tt), sd["time_emb_proj.weight"],
                      sd["time_emb_proj.bias"])[:, :, None, None]
    h = tF.group_norm(h, 4, sd["norm2.weight"], sd["norm2.bias"])
    h = tF.conv2d(tF.silu(h), sd["conv2.weight"], sd["conv2.bias"], padding=1)
    sc = tF.conv2d(xt, sd["conv_shortcut.weight"], sd["conv_shortcut.bias"])
    ref = (h + sc).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_unet_forward_shapes_and_determinism():
    model = UNet2DConditionModel(CFG)
    model.random_init(jax.random.PRNGKey(0), 0.02)
    rs = np.random.RandomState(1)
    sample = jnp.asarray(rs.randn(2, 4, 16, 16).astype(np.float32))
    t = jnp.asarray([10, 500], jnp.int32)
    ctx = jnp.asarray(rs.randn(2, 7, 12).astype(np.float32))
    out = model(sample, t, ctx)
    assert out.shape == (2, 4, 16, 16)
    out2 = model(sample, t, ctx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    assert np.isfinite(np.asarray(out)).all()


def test_unet_jit_and_param_count():
    model = UNet2DConditionModel(CFG)
    model.random_init(jax.random.PRNGKey(0), 0.02)
    state = model.state_dict()
    f = jax.jit(lambda p, s, t, c: model.apply(p, s, t, c))
    rs = np.random.RandomState(2)
    out = f(state, jnp.asarray(rs.randn(1, 4, 16, 16).astype(np.float32)),
            jnp.asarray([3], jnp.int32),
            jnp.asarray(rs.randn(1, 5, 12).astype(np.float32)))
    assert out.shape == (1, 4, 16, 16)
    # conditioning matters
    out_b = f(state, jnp.asarray(rs.randn(1, 4, 16, 16).astype(np.float32) * 0
                                 + 1.0),
              jnp.asarray([3], jnp.int32),
              jnp.asarray(np.zeros((1, 5, 12), np.float32)))
    assert not np.allclose(np.asarray(out), np.asarray(out_b))

"""Op-level goldens vs torch/numpy — mirrors the reference's
``tests/functional/`` strategy (each op compared against a PyTorch
reference with assert_allclose, e.g. test_conv2d.py:16-50)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import eddie_wang_hackathon2023_tpu.functional as F


def _np(x):
    return np.asarray(x)


def test_gelu_matches_torch_tanh_approx():
    x = np.random.RandomState(0).randn(64).astype(np.float32)
    ref = tF.gelu(torch.from_numpy(x), approximate="tanh").numpy()
    np.testing.assert_allclose(_np(F.gelu(jnp.asarray(x))), ref, atol=1e-6)


def test_gelu_exact_matches_torch_default():
    x = np.random.RandomState(1).randn(64).astype(np.float32)
    ref = tF.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(_np(F.gelu_exact(jnp.asarray(x))), ref, atol=1e-6)


def test_layer_norm_matches_torch():
    rs = np.random.RandomState(2)
    x = rs.randn(4, 9, 32).astype(np.float32)
    w = rs.randn(32).astype(np.float32)
    b = rs.randn(32).astype(np.float32)
    ref = tF.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(w),
                        torch.from_numpy(b)).numpy()
    got = _np(F.layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_rms_norm_matches_torch_formula():
    rs = np.random.RandomState(3)
    x = rs.randn(2, 5, 16).astype(np.float32)
    w = rs.randn(16).astype(np.float32)
    xt = torch.from_numpy(x)
    ref = (xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6)
           * torch.from_numpy(w)).numpy()
    got = _np(F.rms_norm(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_group_norm_matches_torch():
    rs = np.random.RandomState(4)
    x = rs.randn(2, 8, 4, 4).astype(np.float32)
    w = rs.randn(8).astype(np.float32)
    b = rs.randn(8).astype(np.float32)
    ref = tF.group_norm(torch.from_numpy(x), 4, torch.from_numpy(w),
                        torch.from_numpy(b)).numpy()
    got = _np(F.group_norm(jnp.asarray(x), 4, jnp.asarray(w), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


@pytest.mark.parametrize("stride,padding,dilation", [(1, 0, 1), (2, 1, 1), (1, 2, 2)])
def test_conv1d_matches_torch(stride, padding, dilation):
    rs = np.random.RandomState(5)
    x = rs.randn(2, 6, 20).astype(np.float32)
    w = rs.randn(8, 6, 3).astype(np.float32)
    b = rs.randn(8).astype(np.float32)
    ref = tF.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), stride, padding, dilation).numpy()
    got = _np(F.conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                       stride, padding, dilation))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_conv2d_matches_torch():
    rs = np.random.RandomState(6)
    x = rs.randn(2, 3, 10, 10).astype(np.float32)
    w = rs.randn(5, 3, 3, 3).astype(np.float32)
    b = rs.randn(5).astype(np.float32)
    ref = tF.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), (2, 2), (1, 1)).numpy()
    got = _np(F.conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                       (2, 2), (1, 1)))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_avg_pool2d_matches_torch():
    rs = np.random.RandomState(7)
    x = rs.randn(1, 2, 8, 8).astype(np.float32)
    ref = tF.avg_pool2d(torch.from_numpy(x), (2, 2)).numpy()
    got = _np(F.avg_pool2d(jnp.asarray(x), (2, 2)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_alibi_slopes_power_of_two():
    s = F.generate_alibi_slopes(8).reshape(-1)
    np.testing.assert_allclose(s, [2 ** (-i) for i in range(1, 9)], rtol=1e-6)


def test_alibi_slopes_non_power_of_two():
    s = F.generate_alibi_slopes(12).reshape(-1)
    assert s.shape == (12,)
    assert np.all(s > 0) and np.all(np.diff(s[:8]) < 0)


def test_sinusoids_matches_reference_formula():
    # E/whisper/weight.py:24-30 torch formulation
    length, channels = 10, 8
    got = F.sinusoids(length, channels)
    log_inc = torch.log(torch.tensor(10000.0)) / (channels // 2 - 1)
    inv = torch.exp(-log_inc * torch.arange(channels // 2).float())
    t = torch.arange(length).float()[:, None] * inv[None, :]
    ref = torch.cat([torch.sin(t), torch.cos(t)], dim=1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_causal_bias_shifted():
    b = _np(F.causal_bias(2, 5))
    # queries are the last 2 of 5 positions
    assert np.isneginf(b[0, 4])
    assert b[0, 3] == 0 and b[1, 4] == 0


def test_round_half_away():
    x = jnp.asarray([0.5, -0.5, 1.5, -1.5, 2.4, -2.4])
    np.testing.assert_array_equal(_np(F.round_half_away(x)),
                                  [1.0, -1.0, 2.0, -2.0, 2.0, -2.0])


def test_swiglu_and_geglu_split():
    x = np.random.RandomState(8).randn(2, 6).astype(np.float32)
    a, b = x[:, :3], x[:, 3:]
    ref = tF.silu(torch.from_numpy(b)).numpy() * a
    np.testing.assert_allclose(_np(F.swiglu(jnp.asarray(x))), ref, atol=1e-6)


def test_rope_rotation_preserves_norm():
    rs = np.random.RandomState(9)
    x = rs.randn(1, 4, 2, 8).astype(np.float32)
    pos = jnp.arange(4, dtype=jnp.int32)[None, :]
    out = F.rope(jnp.asarray(x), pos)
    np.testing.assert_allclose(np.linalg.norm(_np(out), axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)
    # position 0 is identity
    np.testing.assert_allclose(_np(out)[0, 0], x[0, 0], atol=1e-6)


def test_rope_matches_hf_llama_style():
    """neox-style rope vs the standard HF rotate_half formulation."""
    rs = np.random.RandomState(10)
    head_dim = 8
    x = rs.randn(1, 5, 1, head_dim).astype(np.float32)
    pos = np.arange(5)
    inv = 1.0 / (10000.0 ** (np.arange(0, head_dim, 2) / head_dim))
    ang = pos[:, None] * inv[None, :]
    cos = np.cos(np.concatenate([ang, ang], axis=-1))
    sin = np.sin(np.concatenate([ang, ang], axis=-1))
    def rotate_half(t):
        return np.concatenate([-t[..., head_dim // 2:], t[..., :head_dim // 2]], -1)
    ref = x[0, :, 0] * cos + rotate_half(x[0, :, 0]) * sin
    got = _np(F.rope(jnp.asarray(x), jnp.asarray(pos)[None, :]))[0, :, 0]
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_conv_transpose2d_matches_torch():
    import torch
    from eddie_wang_hackathon2023_tpu.functional import conv_transpose2d
    rs = np.random.RandomState(11)
    x = rs.randn(1, 3, 8, 8).astype(np.float32)
    w = rs.randn(3, 5, 4, 4).astype(np.float32)   # [in, out, kh, kw]
    b = rs.randn(5).astype(np.float32)
    ref = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, padding=1).numpy()
    got = conv_transpose2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           stride=(2, 2), padding=(1, 1))
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_activations_match_torch():
    import torch
    from eddie_wang_hackathon2023_tpu.functional import (mish, relu, sigmoid,
                                                         silu, tanh)
    x = np.linspace(-4, 4, 41).astype(np.float32)
    xt = torch.from_numpy(x)
    for fn, ref in ((relu, torch.nn.functional.relu),
                    (sigmoid, torch.sigmoid), (tanh, torch.tanh),
                    (silu, torch.nn.functional.silu),
                    (mish, torch.nn.functional.mish)):
        np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))),
                                   ref(xt).numpy(), atol=1e-5,
                                   err_msg=fn.__name__)


def test_softmax_log_softmax_match_torch():
    import torch
    from eddie_wang_hackathon2023_tpu.functional import log_softmax, softmax
    rs = np.random.RandomState(12)
    x = rs.randn(3, 7).astype(np.float32) * 3
    xt = torch.from_numpy(x)
    np.testing.assert_allclose(np.asarray(softmax(jnp.asarray(x), dim=-1)),
                               torch.softmax(xt, -1).numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(log_softmax(jnp.asarray(x), dim=-1)),
        torch.log_softmax(xt, -1).numpy(), atol=1e-5)


def test_matmul_transpose_flags():
    from eddie_wang_hackathon2023_tpu.functional import matmul
    rs = np.random.RandomState(13)
    a = rs.randn(4, 6).astype(np.float32)
    b = rs.randn(6, 5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(matmul(a, b)), a @ b, atol=1e-5)
    np.testing.assert_allclose(np.asarray(matmul(a.T, b, transa=True)),
                               a @ b, atol=1e-5)
    np.testing.assert_allclose(np.asarray(matmul(a, b.T, transb=True)),
                               a @ b, atol=1e-5)


def test_split_torch_style():
    from eddie_wang_hackathon2023_tpu.functional import split
    x = jnp.arange(12).reshape(2, 6)
    parts = split(x, 2, dim=1)             # chunk size 2 -> 3 chunks
    assert len(parts) == 3 and parts[0].shape == (2, 2)
    parts = split(x, [1, 2, 3], dim=1)
    assert [p.shape[1] for p in parts] == [1, 2, 3]


def test_where_masked_fill_clip():
    from eddie_wang_hackathon2023_tpu.functional import (clip, masked_fill,
                                                         where)
    x = jnp.asarray([[1.0, -2.0], [3.0, -4.0]])
    m = jnp.asarray([[True, False], [False, True]])
    np.testing.assert_array_equal(np.asarray(where(m, x, 0.0 * x)),
                                  [[1.0, 0.0], [0.0, -4.0]])
    np.testing.assert_array_equal(np.asarray(masked_fill(x, m, 9.0)),
                                  [[9.0, -2.0], [3.0, 9.0]])
    np.testing.assert_array_equal(np.asarray(clip(x, -2.0, 1.0)),
                                  [[1.0, -2.0], [1.0, -2.0]])


def test_embedding_lookup():
    from eddie_wang_hackathon2023_tpu.functional import embedding, lookup
    w = jnp.arange(20.0).reshape(10, 2)
    toks = jnp.asarray([[1, 3], [0, 9]])
    out = embedding(toks, w)
    np.testing.assert_array_equal(np.asarray(out[1, 1]), [18.0, 19.0])
    np.testing.assert_array_equal(np.asarray(lookup(toks, w)),
                                  np.asarray(out))

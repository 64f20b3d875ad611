"""Fused flash-attention kernel: dispatch, numerics, grads, model path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libxsmm_tpu.dtypes import Datatype
from libxsmm_tpu.ops.attention import dispatch_flash_attention


def _oracle(q, kT, v, scale, causal=False):
    q = np.asarray(q, np.float32)
    kT = np.asarray(kT, np.float32)
    v = np.asarray(v, np.float32)
    s = q.shape[1]
    scores = np.einsum("bqd,bdk->bqk", q, kT) * scale
    if causal:
        mask = np.triu(np.ones((s, s), bool), 1)
        scores = np.where(mask[None], -np.inf, scores)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    return np.einsum("bqk,bkd->bqd", probs, v)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_oracle(causal):
    rng = np.random.default_rng(0)
    bh, s, hd = 3, 256, 64
    q, v = _rand(rng, bh, s, hd), _rand(rng, bh, s, hd)
    kT = _rand(rng, bh, hd, s)
    kern = dispatch_flash_attention(bh, s, hd, Datatype.F32, causal=causal)
    assert not kern.info.is_reference_kernel     # fused envelope
    out = np.asarray(kern(q, kT, v))
    ref = _oracle(q, kT, v, hd ** -0.5, causal)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_flash_bf16():
    rng = np.random.default_rng(1)
    bh, s, hd = 2, 128, 128
    q = _rand(rng, bh, s, hd).astype(jnp.bfloat16)
    v = _rand(rng, bh, s, hd).astype(jnp.bfloat16)
    kT = _rand(rng, bh, hd, s).astype(jnp.bfloat16)
    kern = dispatch_flash_attention(bh, s, hd, Datatype.BF16)
    out = np.asarray(kern(q, kT, v), np.float32)
    ref = _oracle(q.astype(jnp.float32), kT.astype(jnp.float32),
                  v.astype(jnp.float32), hd ** -0.5)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.03


def test_flash_xla_fallback_envelope():
    """Shapes outside the Pallas envelope still dispatch (XLA path,
    is_reference_kernel=True — the reference-fallback JITer contract,
    /root/reference/src/libxsmm_main.c:2198-2216)."""
    rng = np.random.default_rng(2)
    bh, s, hd = 2, 96, 24          # s % 128 != 0
    q, v = _rand(rng, bh, s, hd), _rand(rng, bh, s, hd)
    kT = _rand(rng, bh, hd, s)
    kern = dispatch_flash_attention(bh, s, hd, Datatype.F32)
    assert kern.info.is_reference_kernel
    np.testing.assert_allclose(np.asarray(kern(q, kT, v)),
                               _oracle(q, kT, v, hd ** -0.5),
                               rtol=2e-4, atol=2e-4)


def test_flash_custom_scale_and_nflops():
    rng = np.random.default_rng(3)
    bh, s, hd = 1, 128, 32
    q, v = _rand(rng, bh, s, hd), _rand(rng, bh, s, hd)
    kT = _rand(rng, bh, hd, s)
    kern = dispatch_flash_attention(bh, s, hd, Datatype.F32, scale=0.25)
    np.testing.assert_allclose(np.asarray(kern(q, kT, v)),
                               _oracle(q, kT, v, 0.25), rtol=2e-4, atol=2e-4)
    assert kern.info.nflops == 4 * bh * s * s * hd


def test_flash_gradients_match_naive():
    """custom-VJP backward (recomputed probs) vs jax.grad through the
    naive composition."""
    from libxsmm_tpu.ops.attention import _naive

    rng = np.random.default_rng(4)
    bh, s, hd = 2, 128, 64
    q, v = _rand(rng, bh, s, hd), _rand(rng, bh, s, hd)
    kT = _rand(rng, bh, hd, s)
    kern = dispatch_flash_attention(bh, s, hd, Datatype.F32, causal=True)

    def loss_fused(q, kT, v):
        return jnp.sum(kern(q, kT, v) ** 2)

    def loss_naive(q, kT, v):
        return jnp.sum(_naive(q, kT, v, hd ** -0.5, True) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, kT, v)
    gn = jax.grad(loss_naive, argnums=(0, 1, 2))(q, kT, v)
    for a, b in zip(gf, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_model_flash_path_matches_naive():
    from libxsmm_tpu.models.tpp_attention import (AttentionConfig, forward,
                                                  init_params)
    cfg_n = AttentionConfig(dim=128, heads=2, ffn_mult=2)
    cfg_f = AttentionConfig(dim=128, heads=2, ffn_mult=2, flash=True)
    params = init_params(cfg_n, seed=5)
    rng = np.random.default_rng(5)
    x = _rand(rng, 2, 128, 128)
    np.testing.assert_allclose(np.asarray(forward(params, x, cfg_f)),
                               np.asarray(forward(params, x, cfg_n)),
                               rtol=5e-4, atol=5e-4)


def test_model_flash_train_step():
    from libxsmm_tpu.models.tpp_attention import (AttentionConfig,
                                                  init_params, loss_fn,
                                                  train_step)
    cfg = AttentionConfig(dim=128, heads=2, ffn_mult=2, flash=True,
                          causal=True)
    params = init_params(cfg, seed=6)
    rng = np.random.default_rng(6)
    x = _rand(rng, 2, 128, 128)
    y = _rand(rng, 2, 128, 128) * 0.1
    l0 = float(loss_fn(params, x, y, cfg))
    step = jax.jit(lambda p, x, y: train_step(p, x, y, cfg, lr=1e-2))
    for _ in range(3):
        params, loss = step(params, x, y)
    assert float(loss) < l0


def test_flash_rejects_dropout():
    from libxsmm_tpu.models.tpp_attention import (AttentionConfig, forward,
                                                  init_params)
    cfg = AttentionConfig(dim=128, heads=2, flash=True, dropout_p=0.1)
    params = init_params(cfg, seed=7)
    x = jnp.zeros((1, 128, 128), jnp.float32)
    with pytest.raises(ValueError, match="flash attention"):
        forward(params, x, cfg, seed=3)


def test_flash_bad_args():
    with pytest.raises(ValueError):
        dispatch_flash_attention(0, 128, 64)
    with pytest.raises(ValueError):
        dispatch_flash_attention(1, 128, 64, Datatype.I8)

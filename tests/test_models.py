"""TPP-MLP flagship model tests: forward/train, sharding, splitSGD."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from libxsmm_tpu.models.tpp_mlp import (MlpConfig, combine_f32, forward,
                                        init_params, loss_fn,
                                        make_sharded_train_step,
                                        shard_params, split_f32,
                                        split_params, split_sgd_train_step,
                                        train_step)

CFG = MlpConfig(in_dim=16, hidden=(32,), out_dim=8)


def test_forward_and_train_step():
    params = init_params(CFG)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    out = forward(params, x, CFG)
    assert out.shape == (4, 8)
    l0 = loss_fn(params, x, y, CFG)
    params2, loss = jax.jit(lambda p, x, y: train_step(p, x, y, CFG))(
        params, x, y)
    l1 = loss_fn(params2, x, y, CFG)
    assert float(l1) < float(l0)      # one step reduces the loss


def test_split_f32_roundtrip():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((32, 32)) * 5, jnp.float32)
    hi, lo = split_f32(w)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    err = np.abs(np.asarray(combine_f32(hi, lo)) - np.asarray(w)).max()
    assert err <= float(jnp.abs(w).max()) * 2 ** -15


def test_split_sgd_training_converges():
    params = split_params(init_params(CFG))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((16, 8)) * 0.1, jnp.float32)
    step = jax.jit(lambda p, x, y: split_sgd_train_step(p, x, y, CFG,
                                                        lr=5e-2))
    losses = []
    for _ in range(10):
        params, loss = step(params, x, y)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9


def test_split_sgd_beats_pure_bf16():
    """splitSGD's reason to exist: tiny updates vanish in bf16 weights but
    accumulate in the split representation."""
    w = jnp.full((64, 64), 100.0, jnp.float32)
    g = jnp.full((64, 64), 1.0, jnp.float32)
    lr = 1e-2   # update 0.01: << bf16 ulp of 100 (0.5) so pure-bf16 loses
                # it, but >> the lo-half ulp (~0.002) so the split keeps it
    hi, lo = split_f32(w)
    bf16_w = w.astype(jnp.bfloat16)
    from libxsmm_tpu.models.tpp_mlp import split_sgd_update
    upd = jax.jit(lambda h, l: split_sgd_update(h, l, g, lr))
    for _ in range(50):
        hi, lo = upd(hi, lo)
        bf16_w = (bf16_w.astype(jnp.float32) - lr * g).astype(jnp.bfloat16)
    split_val = float(combine_f32(hi, lo)[0, 0])
    bf16_val = float(bf16_w.astype(jnp.float32)[0, 0])
    assert abs(split_val - 99.5) < 0.02     # 50 * 0.01 accumulated
    assert bf16_val == 100.0                # updates vanished


def test_sharded_train_step_runs():
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    from libxsmm_tpu.parallel.mesh import make_mesh
    mesh = make_mesh([("dp", 2), ("tp", 2)])
    params = shard_params(init_params(CFG), mesh)
    step, xsharding = make_sharded_train_step(CFG, mesh)
    rng = np.random.default_rng(3)
    x = jax.device_put(np.asarray(rng.standard_normal((8, 16)), np.float32),
                       xsharding)
    from jax.sharding import NamedSharding, PartitionSpec as P
    y = jax.device_put(np.asarray(rng.standard_normal((8, 8)), np.float32),
                       NamedSharding(mesh, P("dp", None)))
    params, loss = step(params, x, y)
    assert np.isfinite(float(loss))

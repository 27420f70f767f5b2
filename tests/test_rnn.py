"""Fused LSTM (models/rnn.py) vs flax nn.RNN(OptimizedLSTMCell) parity.

The fused implementation hoists the input projection out of the scan and
must stay a drop-in: identical param tree (checkpoint compat, and the
streaming encoder reads the same blobs) and matching outputs."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from golf_tpu.models.rnn import LSTM, BiLSTM


class _RefBiLSTM(nn.Module):
    """The previous implementation, kept verbatim as the parity oracle."""

    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"fwd_{i}")
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"bwd_{i}", reverse=True, keep_order=True)
            h = jnp.concatenate([fwd(h), bwd(h)], axis=-1)
        return h


class _RefLSTM(nn.Module):
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i in range(self.num_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                       name=f"lstm_{i}")(h)
        return h


@pytest.mark.parametrize("layers", [1, 2])
def test_bilstm_matches_flax_rnn(layers):
    x = jax.random.normal(jax.random.key(1), (3, 17, 5))
    fused = BiLSTM(hidden_size=8, num_layers=layers)
    ref = _RefBiLSTM(hidden_size=8, num_layers=layers)
    vf = fused.init(jax.random.key(0), x)
    vr = ref.init(jax.random.key(0), x)

    # identical param tree (paths + shapes + the same init draws)
    pf = jax.tree_util.tree_leaves_with_path(vf["params"])
    pr = jax.tree_util.tree_leaves_with_path(vr["params"])
    assert [jax.tree_util.keystr(k) for k, _ in pf] == \
        [jax.tree_util.keystr(k) for k, _ in pr]
    for (_, a), (_, b) in zip(pf, pr):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    yf = fused.apply(vf, x)
    yr = ref.apply(vr, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               atol=1e-5, rtol=1e-5)


def test_bilstm_unroll_invariant():
    x = jax.random.normal(jax.random.key(2), (2, 13, 4))
    m1 = BiLSTM(hidden_size=6, unroll=1)
    m8 = BiLSTM(hidden_size=6, unroll=8)
    v = m1.init(jax.random.key(0), x)
    np.testing.assert_allclose(np.asarray(m1.apply(v, x)),
                               np.asarray(m8.apply(v, x)),
                               atol=1e-6, rtol=1e-6)


def test_lstm_matches_flax_rnn():
    x = jax.random.normal(jax.random.key(3), (2, 11, 4))
    fused = LSTM(hidden_size=5, num_layers=2)
    ref = _RefLSTM(hidden_size=5, num_layers=2)
    vf = fused.init(jax.random.key(0), x)
    vr = ref.init(jax.random.key(0), x)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(vf["params"]),
            jax.tree_util.tree_leaves_with_path(vr["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(fused.apply(vf, x)),
                               np.asarray(ref.apply(vr, x)),
                               atol=1e-5, rtol=1e-5)


class _RefBiLSTMBf16(nn.Module):
    """flax oracle for the bf16 compute path (params fp32, dtype=bf16)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):
        fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size,
                                          dtype=jnp.bfloat16), name="fwd_0")
        bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size,
                                          dtype=jnp.bfloat16), name="bwd_0",
                     reverse=True, keep_order=True)
        return jnp.concatenate([fwd(x), bwd(x)], axis=-1)


def test_bilstm_bf16_matches_flax():
    """The production bf16 compute config (unet/mel backbones) must track
    flax's promotion semantics: carry c stays fp32, only h is cast for the
    recurrent matmul. A long sequence amplifies any bf16 carry drift."""
    x = jax.random.normal(jax.random.key(7), (2, 200, 12))
    fused = BiLSTM(hidden_size=16, dtype=jnp.bfloat16)
    ref = _RefBiLSTMBf16(hidden_size=16)
    vf = fused.init(jax.random.key(0), x)
    vr = ref.init(jax.random.key(0), x)
    for (_, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(vf["params"]),
            jax.tree_util.tree_leaves_with_path(vr["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    yf = np.asarray(fused.apply(vf, x), np.float32)
    yr = np.asarray(ref.apply(vr, x), np.float32)
    assert yf.dtype == yr.dtype == np.float32
    # both are bf16 compute paths; small matmul-order differences remain
    np.testing.assert_allclose(yf, yr, atol=5e-3)
    # and the bf16 path must stay close to full fp32 (carry kept fp32)
    y32 = np.asarray(BiLSTM(hidden_size=16).apply(vf, x))
    assert np.abs(yf - y32).max() < 3e-2


def test_bilstm_grads_match_flax():
    """Hand-written BPTT (custom VJP, hoisted dW contractions) must match
    autodiff of the flax reference cell, params shared."""
    x = jax.random.normal(jax.random.key(9), (3, 31, 7))
    fused = BiLSTM(hidden_size=10)
    ref = _RefBiLSTM(hidden_size=10)
    v = fused.init(jax.random.key(0), x)

    def loss(m, p, xx):
        return jnp.sum(jnp.sin(m.apply({"params": p}, xx)) ** 2)

    lf, gf = jax.value_and_grad(lambda p: loss(fused, p, x))(v["params"])
    lr_, gr = jax.value_and_grad(lambda p: loss(ref, p, x))(v["params"])
    np.testing.assert_allclose(float(lf), float(lr_), rtol=1e-6)
    for (kf, a), (kr, b) in zip(
            jax.tree_util.tree_leaves_with_path(gf),
            jax.tree_util.tree_leaves_with_path(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(kf))
    # input gradient too
    gx_f = jax.grad(lambda xx: loss(fused, v["params"], xx))(x)
    gx_r = jax.grad(lambda xx: loss(ref, v["params"], xx))(x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-5, rtol=1e-4)


def test_bilstm_bf16_grads_finite():
    x = jax.random.normal(jax.random.key(10), (2, 40, 6))
    m = BiLSTM(hidden_size=8, dtype=jnp.bfloat16)
    v = m.init(jax.random.key(0), x)
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
        v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l, np.float32)))
               for l in leaves)
    assert max(float(jnp.linalg.norm(l.astype(jnp.float32)))
               for l in leaves) > 0


def test_bilstm_grads_flow():
    x = jax.random.normal(jax.random.key(4), (2, 9, 4))
    m = BiLSTM(hidden_size=6, num_layers=2)
    v = m.init(jax.random.key(0), x)
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
        v["params"])
    norms = [float(jnp.linalg.norm(l))
             for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0

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


def test_bilstm_grads_flow():
    x = jax.random.normal(jax.random.key(4), (2, 9, 4))
    m = BiLSTM(hidden_size=6, num_layers=2)
    v = m.init(jax.random.key(0), x)
    g = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, x) ** 2))(
        v["params"])
    norms = [float(jnp.linalg.norm(l))
             for l in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms)) and max(norms) > 0

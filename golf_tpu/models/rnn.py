"""Recurrent backbone building blocks (BiLSTM) — fused-scan LSTM.

The reference leans on torch's cuDNN (Bi)LSTM everywhere
(``models/mel.py:25-31``, ``models/unet.py:134-140``). cuDNN's core trick
is to hoist the input projection out of the recurrence: x @ W_i for ALL
timesteps is one large MXU matmul, and only the (H x 4H) recurrent matmul
stays inside the sequential scan. The flax ``nn.RNN(OptimizedLSTMCell)``
stack this module previously used re-does the input projection per step
inside ``lax.scan`` — (B, in) x (in, 4H) slivers that underfill the MXU
and serialize HBM traffic. Here the projection is hoisted and the scan is
partially unrolled (``unroll``), which batches the per-step VPU work.

Parameter trees are IDENTICAL to the previous ``nn.RNN(OptimizedLSTMCell)``
layout (children ``OptimizedLSTMCell_{n}`` with ``i{i,f,g,o}`` kernels and
``h{i,f,g,o}`` kernel+bias), so existing checkpoints restore unchanged and
the streaming encoder (``serve/enc_stream.py``) keeps reading the same
blobs. The math reproduces flax's gate order/activation exactly:
gates = (h @ W_h + b) + (x @ W_i), i/f/o sigmoid, g tanh.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Custom-VJP LSTM core (cuDNN-style BPTT): the forward hoists the input
# projection; the backward hoists BOTH weight-gradient contractions
# (dW_h = sum_t h_{t-1}^T dgates_t and the input-side dxw = dgates) out of
# the reverse scan, leaving one (B,4H)x(4H,H) matmul per reverse step.
# Autodiff of the forward scan instead emits several small per-step
# contractions (measured 101 ms encoder backward vs 44 ms forward at the
# training shape before this kernel).
# ---------------------------------------------------------------------------

def _lstm_steps(xw, w_h, b, dt, reverse, unroll):
    """Returns (ys, saved) where saved carries per-step tensors for BPTT:
    gates post-activation (i,f,g,o), cell states c2, and h_prev."""
    t, bsz, four_h = xw.shape
    h_feat = four_h // 4
    c0 = jnp.zeros((bsz, h_feat), jnp.float32)

    def step(carry, xw_t):
        c, h = carry
        hm = h if dt is None else h.astype(dt)
        gates = (hm @ w_h).astype(jnp.float32) + b \
            + xw_t.astype(jnp.float32)
        i_, f_, g_, o_ = jnp.split(gates, 4, axis=-1)
        i_ = jax.nn.sigmoid(i_)
        f_ = jax.nn.sigmoid(f_)
        g_ = jnp.tanh(g_)
        o_ = jax.nn.sigmoid(o_)
        c2 = f_ * c + i_ * g_
        h2 = o_ * jnp.tanh(c2)
        return (c2, h2), (h2, i_, f_, g_, o_, c2, c, h)

    _, outs = jax.lax.scan(step, (c0, c0), xw,
                           reverse=reverse, unroll=unroll)
    ys = outs[0]
    return ys, outs[1:]


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_lstm(xw, w_h, b, dt, reverse, unroll):
    return _lstm_steps(xw, w_h, b, dt, reverse, unroll)[0]


def _fused_lstm_fwd(xw, w_h, b, dt, reverse, unroll):
    ys, saved = _lstm_steps(xw, w_h, b, dt, reverse, unroll)
    return ys, (saved, w_h)


def _fused_lstm_bwd(dt, reverse, unroll, res, dys):
    (i_, f_, g_, o_, c2, c_prev, h_prev), w_h = res
    w_h_t = w_h.T if dt is None else w_h.T.astype(dt)
    tanh_c2 = jnp.tanh(c2)

    def step(carry, inp):
        dc_next, dh_next = carry
        dy_t, i_t, f_t, g_t, o_t, th_t, cp_t = inp
        dh = dy_t + dh_next
        do = dh * th_t
        dc = dh * o_t * (1.0 - th_t * th_t) + dc_next
        di = dc * g_t
        df = dc * cp_t
        dg = dc * i_t
        dgates = jnp.concatenate(
            [di * i_t * (1 - i_t), df * f_t * (1 - f_t),
             dg * (1 - g_t * g_t), do * o_t * (1 - o_t)], axis=-1)
        gm = dgates if dt is None else dgates.astype(dt)
        dh_prev = (gm @ w_h_t).astype(jnp.float32)
        return (dc * f_t, dh_prev), dgates

    bsz = dys.shape[1]
    h_feat = w_h.shape[0]
    zero = jnp.zeros((bsz, h_feat), jnp.float32)
    # BPTT runs opposite to the forward direction
    _, dgates_all = jax.lax.scan(
        step, (zero, zero),
        (dys, i_, f_, g_, o_, tanh_c2, c_prev),
        reverse=not reverse, unroll=unroll)

    # hoisted weight/bias gradients: single big contractions on the MXU
    hp = h_prev if dt is None else h_prev.astype(dt)
    ga = dgates_all if dt is None else dgates_all.astype(dt)
    dw_h = jnp.einsum("tbh,tbg->hg", hp, ga).astype(w_h.dtype)
    db = jnp.sum(dgates_all, axis=(0, 1))
    # input-projection grad flows through the xw matmul outside;
    # dtype must match the primal xw (bf16 under a compute dtype)
    dxw = dgates_all if dt is None else dgates_all.astype(dt)
    return dxw, dw_h, db


_fused_lstm.defvjp(_fused_lstm_fwd, _fused_lstm_bwd)


class _GateParams(nn.Module):
    """One gate's parameters, named/shaped like flax's DenseParams so the
    param tree matches ``OptimizedLSTMCell`` exactly."""

    shape: Tuple[int, int]
    use_bias: bool
    kernel_init: Any

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.shape)
        b = (self.param("bias", nn.initializers.zeros_init(),
                        (self.shape[1],))
             if self.use_bias else None)
        return k, b


class FusedLSTMDir(nn.Module):
    """One LSTM direction over a (B, T, C) sequence with hoisted input
    projection and an unrolled ``lax.scan`` recurrence."""

    features: int
    reverse: bool = False
    unroll: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h_feat = self.features
        in_feat = x.shape[-1]
        wi, wh, bias = [], [], []
        for comp in ("i", "f", "g", "o"):
            k, _ = _GateParams((in_feat, h_feat), False,
                               nn.initializers.lecun_normal(),
                               name=f"i{comp}")()
            wi.append(k)
            k, b = _GateParams((h_feat, h_feat), True,
                               nn.initializers.orthogonal(),
                               name=f"h{comp}")()
            wh.append(k)
            bias.append(b)
        w_i = jnp.concatenate(wi, axis=-1)          # (in, 4H)
        w_h = jnp.concatenate(wh, axis=-1)          # (H, 4H)
        b = jnp.concatenate(bias, axis=-1)          # (4H,)
        dt = self.dtype
        if dt is not None:
            x, w_i, w_h = (a.astype(dt) for a in (x, w_i, w_h))

        xw = jnp.einsum("btc,cg->btg", x, w_i)      # hoisted: one matmul
        xw = jnp.swapaxes(xw, 0, 1)                 # (T, B, 4H)
        # The carry stays fp32 even under a bf16 compute dtype: flax's
        # OptimizedLSTMCell keeps c in fp32 (bf16 gates * fp32 c promotes),
        # and c accumulates sub-ulp increments over T that bf16 drops. Only
        # the h fed to the recurrent matmul is cast down; gate arithmetic
        # happens in fp32 (b is fp32, xw_t promotes). h2 stays fp32 (flax
        # returns o*tanh(new_c) promoted too); the next layer casts back
        # down at its own input projection. Recurrence + hand-written BPTT
        # live in _fused_lstm (custom VJP).
        ys = _fused_lstm(xw, w_h, b, dt, self.reverse, self.unroll)
        return jnp.swapaxes(ys, 0, 1)               # (B, T, H)


class BiLSTM(nn.Module):
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    # computation dtype (params stay fp32); bf16 feeds the MXU at 2x
    dtype: Optional[jnp.dtype] = None
    unroll: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x if self.dtype is None else x.astype(self.dtype)
        for i in range(self.num_layers):
            fwd = FusedLSTMDir(self.hidden_size, dtype=self.dtype,
                               unroll=self.unroll,
                               name=f"OptimizedLSTMCell_{2 * i}")
            bwd = FusedLSTMDir(self.hidden_size, dtype=self.dtype,
                               unroll=self.unroll, reverse=True,
                               name=f"OptimizedLSTMCell_{2 * i + 1}")
            h = jnp.concatenate([fwd(h), bwd(h)], axis=-1)
            if self.dropout > 0 and i < self.num_layers - 1:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class LSTM(nn.Module):
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    unroll: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        for i in range(self.num_layers):
            h = FusedLSTMDir(self.hidden_size, unroll=self.unroll,
                             name=f"OptimizedLSTMCell_{i}")(h)
            if self.dropout > 0 and i < self.num_layers - 1:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h

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

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


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
        bsz = x.shape[0]
        # The carry stays fp32 even under a bf16 compute dtype: flax's
        # OptimizedLSTMCell keeps c in fp32 (bf16 gates * fp32 c promotes),
        # and c accumulates sub-ulp increments over T that bf16 drops. Only
        # the h fed to the recurrent matmul is cast down; gate arithmetic
        # happens in fp32 (b is fp32, xw_t promotes).
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
            return (c2, h2), h2

        # h2 stays fp32 (flax returns o*tanh(new_c) promoted to fp32 too);
        # the next layer casts back down at its own input projection.
        _, ys = jax.lax.scan(step, (c0, c0), xw,
                             reverse=self.reverse, unroll=self.unroll)
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

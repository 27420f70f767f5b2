"""Recurrent backbone building blocks (BiLSTM) on lax.scan.

The reference leans on torch's cuDNN (Bi)LSTM everywhere
(``models/mel.py:25-31``, ``models/unet.py:134-140``). Here each direction
is an ``nn.RNN(OptimizedLSTMCell)`` — a ``lax.scan`` whose per-step matmuls
XLA batches onto the MXU; multi-layer stacks apply inter-layer dropout like
torch's ``num_layers``/``dropout`` semantics.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class BiLSTM(nn.Module):
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0
    # computation dtype (params stay fp32); bf16 feeds the MXU at 2x
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x if self.dtype is None else x.astype(self.dtype)
        for i in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size,
                                              dtype=self.dtype),
                         name=f"fwd_{i}")
            bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size,
                                              dtype=self.dtype),
                         name=f"bwd_{i}", reverse=True,
                         keep_order=True)
            h = jnp.concatenate([fwd(h), bwd(h)], axis=-1)
            if self.dropout > 0 and i < self.num_layers - 1:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h


class LSTM(nn.Module):
    hidden_size: int
    num_layers: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = x
        for i in range(self.num_layers):
            h = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                       name=f"lstm_{i}")(h)
            if self.dropout > 0 and i < self.num_layers - 1:
                h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return h

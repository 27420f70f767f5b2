"""Set-prediction utilities (reference ``models/tspn.py``): TopNGenerator
cosine-similarity embedding lookup and the TTSPN transformer+BiLSTM hybrid
encoder layer."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.sig import Sig
from .rnn import BiLSTM


class TopNGenerator(nn.Module):
    """Pick the top-n stored embeddings by cosine similarity to a pooled
    feature vector."""

    num_embeddings: int = 256
    embed_size: int = 128
    top_n: int = 10

    @nn.compact
    def __call__(self, feature: jax.Array) -> jax.Array:
        emb = self.param("embeddings", nn.initializers.normal(1.0),
                         (self.num_embeddings, self.embed_size))
        pooled = feature.mean(axis=1)           # (B, D)
        q = nn.Dense(self.embed_size)(pooled)
        sim = (q @ emb.T) / (
            jnp.linalg.norm(q, axis=-1, keepdims=True)
            * jnp.linalg.norm(emb, axis=-1)[None] + 1e-8)
        _, idx = jax.lax.top_k(sim, self.top_n)
        return emb[idx]                          # (B, top_n, embed)


class TTSPNEncoderLayer(nn.Module):
    d_model: int = 128
    nhead: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array, memory: jax.Array,
                 train: bool = False) -> jax.Array:
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not train)(x, memory)
        x = nn.LayerNorm()(x + attn)
        ff = nn.Dense(self.d_model * 4)(x)
        ff = nn.relu(ff)
        ff = nn.Dense(self.d_model)(ff)
        x = nn.LayerNorm()(x + ff)
        return x


class TTSPNEncoder(nn.Module):
    """Transformer-layer + cross-frame BiLSTM hybrid (reference
    ``models/tspn.py:24-72``)."""

    d_model: int = 128
    nhead: int = 4
    num_layers: int = 2
    dropout: float = 0.1
    out_channels: int = 2

    @nn.compact
    def __call__(self, tokens: jax.Array, memory: jax.Array,
                 train: bool = False) -> jax.Array:
        # tokens: (B, N, D) set elements; memory: (B, T, D) frames
        x = tokens
        for _ in range(self.num_layers):
            x = TTSPNEncoderLayer(self.d_model, self.nhead,
                                  self.dropout)(x, memory, train)
        x = BiLSTM(self.d_model // 2)(x, train)
        return nn.Dense(self.out_channels)(x)

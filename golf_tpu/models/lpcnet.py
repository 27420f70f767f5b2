"""LPCNet sample-rate network (reference ``models/lpcnet.py``).

Continuous mu-law codec, interpolated embeddings, and the dual-GRU sample
net with dual-FC output. Teacher-forced training runs the GRUs as
``lax.scan`` over the whole sequence (parallel over batch); autoregressive
generation uses the same cells inside a sampling scan
(``golf_tpu.tasks.lpcnet``).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def mu_law_encode_continuous(x: jax.Array,
                             quantization_channels: int = 256) -> jax.Array:
    """Continuous mu-law -> [0, mu] (reference :9-15)."""
    mu = quantization_channels - 1.0
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / math.log1p(mu)
    return (x_mu + 1) / 2 * mu


def mu_law_decode_continuous(x_mu: jax.Array,
                             quantization_channels: int = 256) -> jax.Array:
    mu = quantization_channels - 1.0
    x = (x_mu / mu) * 2 - 1
    return jnp.sign(x) * (jnp.exp(jnp.abs(x) * math.log1p(mu)) - 1) / mu


class InterpolatedEmbedding(nn.Module):
    """Linear interpolation between adjacent embedding rows for continuous
    indices (reference :27-41)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num_embeddings, self.features))
        lower = jnp.clip(jnp.floor(x).astype(jnp.int32), 0,
                         self.num_embeddings - 2)
        p = (x - lower)[..., None]
        return table[lower] * (1 - p) + table[lower + 1] * p


class GRUCellNoBias(nn.Module):
    """torch-style GRU cell without biases (reference uses bias=False)."""

    hidden: int

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array):
        wi = self.param("wi", nn.initializers.lecun_normal(),
                        (x.shape[-1], 3 * self.hidden))
        wh = self.param("wh", nn.initializers.orthogonal(),
                        (self.hidden, 3 * self.hidden))
        xi = x @ wi
        hi = h @ wh
        x_r, x_z, x_n = jnp.split(xi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(hi, 3, axis=-1)
        r = jax.nn.sigmoid(x_r + h_r)
        z = jax.nn.sigmoid(x_z + h_z)
        n = jnp.tanh(x_n + r * h_n)
        new_h = (1 - z) * n + z * h
        return new_h, new_h


class SampleNet(nn.Module):
    """Dual-GRU sample-rate net (reference :44-98)."""

    quantization_channels: int = 256
    condition_channels: int = 128
    a_channels: int = 192
    b_channels: int = 32

    def setup(self):
        q = self.quantization_channels
        self.embeddings = InterpolatedEmbedding(q, q)
        self.gru_a = GRUCellNoBias(self.a_channels)
        self.gru_b = GRUCellNoBias(self.b_channels)
        self.a = self.param("a", nn.initializers.normal(1.0), (2 * q,))
        self.fc = nn.Dense(2 * q)

    def _head(self, h_b: jax.Array) -> jax.Array:
        q = self.quantization_channels
        h = jnp.tanh(self.fc(h_b)) * self.a
        return h.reshape(*h.shape[:-1], q, 2).sum(axis=-1)

    def __call__(self, f: jax.Array, p: jax.Array, s_prev: jax.Array,
                 e_prev: jax.Array) -> jax.Array:
        """Teacher-forced: f (B,T,C), p/s_prev/e_prev (B,T) continuous
        mu-law indices -> logits (B,T,Q)."""
        pe = self.embeddings(p)
        se = self.embeddings(s_prev)
        ee = self.embeddings(e_prev)
        x = jnp.concatenate([f, pe, se, ee], axis=-1)

        b = x.shape[0]
        h_a0 = jnp.zeros((b, self.a_channels), x.dtype)

        def step_a(h, x_t):
            return self.gru_a(h, x_t)
        _, ha = nn.scan(
            lambda mdl, carry, x_t: mdl.gru_a(carry, x_t),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)(self, h_a0, x)

        xb = jnp.concatenate([ha, f], axis=-1)
        h_b0 = jnp.zeros((b, self.b_channels), x.dtype)
        _, hb = nn.scan(
            lambda mdl, carry, x_t: mdl.gru_b(carry, x_t),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1)(self, h_b0, xb)
        return self._head(hb)

    def sample_forward(self, f: jax.Array, p: jax.Array, s_prev: jax.Array,
                       e_prev: jax.Array,
                       states: Optional[Tuple[jax.Array, jax.Array]] = None):
        """One autoregressive step: all inputs (B,) / f (B,C)."""
        b = f.shape[0]
        if states is None:
            states = (jnp.zeros((b, self.a_channels), f.dtype),
                      jnp.zeros((b, self.b_channels), f.dtype))
        state_a, state_b = states
        pe = self.embeddings(p)
        se = self.embeddings(s_prev)
        ee = self.embeddings(e_prev)
        x = jnp.concatenate([f, pe, se, ee], axis=-1)
        state_a, _ = self.gru_a(state_a, x)
        xb = jnp.concatenate([state_a, f], axis=-1)
        state_b, _ = self.gru_b(state_b, xb)
        return self._head(state_b), (state_a, state_b)

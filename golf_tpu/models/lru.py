"""Linear Recurrent Unit — diagonal complex SSM via associative scan.

TPU-native replacement for the reference's ``models/lru`` submodule
(yoyololicon/torchlru, used by ``models/unet.py:54-56``): the recurrence
h_t = lambda * h_{t-1} + gamma * (B x_t) runs as a
``jax.lax.associative_scan`` (log-depth), which is the idiomatic TPU
formulation of a diagonal linear recurrence.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _lru_scan(lam: jax.Array, bu: jax.Array,
              zi: Optional[jax.Array]) -> jax.Array:
    """h_t = lam * h_{t-1} + bu_t along axis 1. bu: (B, T, H) complex."""
    lam_seq = jnp.broadcast_to(lam, bu.shape)
    if zi is not None:
        bu = bu.at[:, 0].add(lam * zi)

    def combine(a, b):
        la, xa = a
        lb, xb = b
        return la * lb, xa * lb + xb

    _, h = jax.lax.associative_scan(combine, (lam_seq, bu), axis=1)
    return h


class LRU(nn.Module):
    """in_features -> hidden diagonal complex state -> out_features (real)."""

    in_features: int
    out_features: int
    state_features: Optional[int] = None
    r_min: float = 0.0
    r_max: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array,
                 zi: Optional[jax.Array] = None
                 ) -> Tuple[jax.Array, jax.Array]:
        h = self.state_features or self.out_features

        def nu_init(key, shape):
            u = jax.random.uniform(key, shape)
            return jnp.log(-0.5 * jnp.log(
                u * (self.r_max ** 2 - self.r_min ** 2) + self.r_min ** 2))

        def theta_init(key, shape):
            return jnp.log(jax.random.uniform(key, shape) * 2 * math.pi)

        nu_log = self.param("nu_log", nu_init, (h,))
        theta_log = self.param("theta_log", theta_init, (h,))
        lam = jnp.exp(-jnp.exp(nu_log) + 1j * jnp.exp(theta_log))
        gamma = jnp.sqrt(1 - jnp.abs(lam) ** 2)

        scale_in = 1.0 / math.sqrt(2 * self.in_features)
        b_re = self.param("B_re", nn.initializers.normal(scale_in),
                          (self.in_features, h))
        b_im = self.param("B_im", nn.initializers.normal(scale_in),
                          (self.in_features, h))
        scale_out = 1.0 / math.sqrt(h)
        c_re = self.param("C_re", nn.initializers.normal(scale_out),
                          (h, self.out_features))
        c_im = self.param("C_im", nn.initializers.normal(scale_out),
                          (h, self.out_features))
        d = self.param("D", nn.initializers.normal(1.0),
                       (self.in_features,)) if \
            self.in_features == self.out_features else None

        bu = (x.astype(jnp.complex64) @ (b_re + 1j * b_im)) * gamma
        hseq = _lru_scan(lam, bu, zi)
        y = (hseq @ (c_re + 1j * c_im)).real
        if d is not None:
            y = y + x * d
        return y, hseq[:, -1]

"""Sig: an array-with-hop-length pytree — the TPU-native AudioTensor.

The reference framework threads a ``hop_length`` attribute through every
tensor so that frame-rate controls (LPC coefficients, gains, FIR magnitudes)
and sample-rate signals can be mixed freely: arithmetic between two signals
first linearly upsamples the coarser one to the finer hop, truncates both to
the shorter length, then applies the op (reference semantics:
``models/utils.py:211-268`` and the ``models/audiotensor`` submodule).

Here the hop is **static pytree metadata** so everything stays jit-stable:
a ``Sig`` traces as a single array leaf and the hop algebra happens at trace
time with Python ints.

Layout convention (same as the reference): dim 0 is batch, dim 1 is time
(frames or samples), trailing dims are channels/features.  A 1-D array has an
"infinite" hop (it never needs upsampling; reference
``models/utils.py:49``).
"""

from __future__ import annotations

import dataclasses
import operator
from typing import Any, Callable, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

# Sentinel hop for time-less tensors (reference uses sys.maxsize).
INF_HOP = 1 << 62

ArrayLike = Union[jax.Array, float, int]


def linear_upsample(x: jax.Array, factor: int, axis: int = -1) -> jax.Array:
    """Linear interpolation to ``(n-1)*factor + 1`` points (align_corners).

    Matches ``F.interpolate(..., mode='linear', align_corners=True)`` with
    output size ``(n-1)*hop+1`` (reference ``models/utils.py:538-544``): the
    output grid point ``i`` lands exactly on input coordinate ``i/factor``.
    """
    if factor == 1:
        return x
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    # Segment endpoints: (..., n-1, 2) -> lerp each segment into `factor`
    # points, then append the final sample.
    left = x[..., :-1]
    right = x[..., 1:]
    w = jnp.arange(factor, dtype=x.dtype) / factor  # (factor,)
    seg = left[..., None] * (1 - w) + right[..., None] * w  # (..., n-1, factor)
    out = seg.reshape(*x.shape[:-1], (n - 1) * factor)
    out = jnp.concatenate([out, x[..., -1:]], axis=-1)
    return jnp.moveaxis(out, -1, axis)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Sig:
    """Array + static hop_length. Time axis is dim 1 (when ndim >= 2)."""

    data: jax.Array
    hop: int = 1

    def __post_init__(self):
        arr = jnp.asarray(self.data)
        object.__setattr__(self, "data", arr)
        if arr.ndim < 2:
            object.__setattr__(self, "hop", INF_HOP)

    # ---- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.data,), (self.hop,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        object.__setattr__(obj, "data", children[0])
        object.__setattr__(obj, "hop", aux[0])
        return obj

    # ---- basic properties ------------------------------------------------
    @property
    def shape(self) -> Tuple[int, ...]:
        return self.data.shape

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def ndim(self) -> int:
        return self.data.ndim

    @property
    def steps(self) -> int:
        """Number of time steps (frames) — reference ``steps`` property."""
        if self.data.ndim < 2:
            return 1
        return self.data.shape[1]

    def __len__(self) -> int:
        return self.data.shape[0]

    def as_array(self) -> jax.Array:
        return self.data

    def new(self, data: ArrayLike) -> "Sig":
        """Wrap ``data`` with this Sig's hop (reference ``new_tensor``)."""
        return Sig(jnp.asarray(data), self.hop)

    # ---- hop algebra -----------------------------------------------------
    def reduce_hop_length(self, factor: int | None = None) -> "Sig":
        """Linear-upsample the time axis by ``factor`` (default: to hop 1)."""
        if factor is None:
            factor = self.hop
        else:
            assert self.hop % factor == 0 and factor <= self.hop
        if factor == 1 or self.ndim < 2:
            return self
        return Sig(linear_upsample(self.data, factor, axis=1), self.hop // factor)

    def increase_hop_length(self, factor: int) -> "Sig":
        assert factor > 0
        if factor == 1 or self.ndim < 2:
            return self
        idx = (slice(None), slice(None, None, factor))
        return Sig(self.data[idx], self.hop * factor)

    def set_hop_length(self, hop: int) -> "Sig":
        assert hop > 0
        if hop > self.hop:
            assert hop % self.hop == 0
            return self.increase_hop_length(hop // self.hop)
        if hop < self.hop:
            assert self.hop % hop == 0
            return self.reduce_hop_length(self.hop // hop)
        return self

    def truncate(self, steps: int) -> "Sig":
        if self.ndim < 2 or steps >= self.steps:
            return self
        return Sig(jax.lax.slice_in_dim(self.data, 0, steps, axis=1), self.hop)

    def unfold(self, size: int, step: int) -> "Sig":
        """Frame the time axis: (B, T) -> (B, F, size); hop *= step.

        Matches ``Tensor.unfold(1, size, step)`` (reference
        ``models/utils.py:57-61``).
        """
        assert self.ndim == 2
        b, t = self.data.shape
        n_frames = (t - size) // step + 1
        starts = jnp.arange(n_frames) * step
        idx = starts[:, None] + jnp.arange(size)[None, :]
        return Sig(self.data[:, idx], self.hop * step)

    def pad(self, pad_width: Tuple[int, int], mode: str = "constant", value=0.0) -> "Sig":
        """Pad the last axis (time for 2-D signals)."""
        cfg = [(0, 0)] * (self.ndim - 1) + [list(pad_width)]
        if mode == "constant":
            d = jnp.pad(self.data, cfg, constant_values=value)
        else:
            d = jnp.pad(self.data, cfg, mode=mode)
        return Sig(d, self.hop)

    # ---- broadcasting ----------------------------------------------------
    @staticmethod
    def broadcast(*sigs: "Sig") -> Tuple["Sig", ...]:
        """Reference hop-broadcasting: all to min hop, truncate to min steps,
        pad trailing dims to the max ndim (``models/utils.py:270-296``)."""
        hops = [s.hop for s in sigs]
        finite = [h for h in hops if h != INF_HOP]
        if finite:
            min_hop = min(finite)
            assert all(h % min_hop == 0 for h in hops if h != INF_HOP), (
                f"hop lengths must divide each other, got {hops}")
            sigs = tuple(
                s.reduce_hop_length(s.hop // min_hop)
                if s.hop != INF_HOP and s.hop > min_hop else s
                for s in sigs)
        steps = [s.steps for s in sigs if s.ndim >= 2]
        if steps:
            min_steps = min(steps)
            sigs = tuple(s.truncate(min_steps) for s in sigs)
        max_ndim = max(s.ndim for s in sigs)
        out = []
        for s in sigs:
            if s.ndim < max_ndim:
                d = s.data.reshape(s.shape + (1,) * (max_ndim - s.ndim))
                out.append(Sig(d, s.hop))
            else:
                out.append(s)
        return tuple(out)

    def _binop(self, other: Any, op: Callable, reverse: bool = False) -> "Sig":
        if isinstance(other, Sig):
            a, b = Sig.broadcast(self, other)
            hop = min(a.hop, b.hop)
            x, y = a.data, b.data
        else:
            hop = self.hop
            x, y = self.data, other
        if reverse:
            x, y = y, x
        return Sig(op(x, y), hop)

    def __add__(self, o): return self._binop(o, operator.add)
    def __radd__(self, o): return self._binop(o, operator.add, True)
    def __sub__(self, o): return self._binop(o, operator.sub)
    def __rsub__(self, o): return self._binop(o, operator.sub, True)
    def __mul__(self, o): return self._binop(o, operator.mul)
    def __rmul__(self, o): return self._binop(o, operator.mul, True)
    def __truediv__(self, o): return self._binop(o, operator.truediv)
    def __rtruediv__(self, o): return self._binop(o, operator.truediv, True)
    def __mod__(self, o): return self._binop(o, operator.mod)
    def __pow__(self, o): return self._binop(o, operator.pow)
    def __matmul__(self, o): return self._binop(o, operator.matmul)
    def __rmatmul__(self, o): return self._binop(o, operator.matmul, True)
    def __neg__(self): return Sig(-self.data, self.hop)

    def __gt__(self, o): return self._binop(o, operator.gt)
    def __ge__(self, o): return self._binop(o, operator.ge)
    def __lt__(self, o): return self._binop(o, operator.lt)
    def __le__(self, o): return self._binop(o, operator.le)

    def __getitem__(self, idx) -> "Sig":
        return Sig(self.data[idx], self.hop)

    # ---- jnp-style helpers ----------------------------------------------
    def sum(self, axis=None, keepdims=False) -> "Sig":
        return Sig(jnp.sum(self.data, axis=axis, keepdims=keepdims), self.hop)

    def astype(self, dtype) -> "Sig":
        return Sig(self.data.astype(dtype), self.hop)

    def float(self) -> "Sig":
        return self.astype(jnp.float32)

    def __repr__(self):
        return f"Sig(hop={self.hop}, {self.data!r})"


def sig_where(cond: Union[Sig, jax.Array], a: Union[Sig, ArrayLike],
              b: Union[Sig, ArrayLike]) -> Sig:
    """torch.where with hop broadcasting."""
    parts = [p for p in (cond, a, b) if isinstance(p, Sig)]
    if not parts:
        return jnp.where(cond, a, b)
    bc = Sig.broadcast(*parts)
    hop = min(s.hop for s in bc)
    it = iter(bc)
    vals = [next(it).data if isinstance(p, Sig) else p for p in (cond, a, b)]
    return Sig(jnp.where(*vals), hop)


def as_sig(x: Union[Sig, jax.Array], hop: int = 1) -> Sig:
    if isinstance(x, Sig):
        return x
    return Sig(jnp.asarray(x), hop)

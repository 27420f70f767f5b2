"""The ctrl protocol: declarative parameter routing.

Load-bearing idea from the reference (``models/ctrl.py``): every DSP module
declares how many encoder channels it needs (``split_sizes``) and how to map
raw logits to constrained DSP parameters (``ctrl``). A composite synth folds
these declarations over its controllable children in registration order; the
encoder is then built with one linear head of width ``sum(sizes)`` sliced
into named groups. Swapping a YAML decoder subtree automatically resizes and
re-routes the encoder.

Differences from the torch version, by design:

* The fold is a plain ordered traversal (no CPS closures) — the layout is
  static metadata, resolved at module-construction time so a single jit
  trace covers each config.
* Transforms that own parameters (e.g. the glottal-table downsampler) are
  module *methods* applied inside the owning module's scope
  (``Synth.apply_ctrl``), not closures smuggled into the encoder.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..core.sig import Sig


class Controllable(nn.Module):
    """Base for modules that consume encoder parameter groups."""

    @property
    def split_sizes(self) -> Tuple[int, ...]:
        """Channel widths of the raw logit groups this module needs."""
        return ()

    def ctrl(self, *logits: Sig) -> Tuple[Sig, ...]:
        """Map raw logit groups -> constrained DSP parameters."""
        return ()


class PassThrough(Controllable):
    """Identity stage (reference ``models/ctrl.py:54-56``)."""

    @nn.compact
    def __call__(self, x: Sig, *args, **kwargs) -> Sig:
        return x


class Synth(nn.Module):
    """Composite synthesizer base.

    Subclasses set ``ctrl_names``: the ordered attribute names of
    controllable children (registration order in the reference).
    """

    @property
    def ctrl_names(self) -> Tuple[str, ...]:
        raise NotImplementedError

    def _ctrl_children(self) -> List[Tuple[str, Controllable]]:
        out = []
        for name in self.ctrl_names:
            child = getattr(self, name)
            if isinstance(child, Controllable):
                out.append((name, child))
        return out

    @property
    def param_layout(self) -> Tuple[Tuple[Tuple[int, ...], ...],
                                    Tuple[str, ...]]:
        """(split_sizes, args_keys) — mirrors the reference's
        ``Synth.split_sizes_and_trsfms`` minus the closures."""
        sizes = tuple(c.split_sizes for _, c in self._ctrl_children())
        keys = tuple(n + "_params" for n, _ in self._ctrl_children())
        return sizes, keys

    def apply_ctrl(self, raw: Dict[str, Tuple[Sig, ...]]
                   ) -> Dict[str, Tuple[Sig, ...]]:
        """Apply each child's ctrl transform to its raw logit group."""
        out = dict(raw)
        for name, child in self._ctrl_children():
            key = name + "_params"
            groups = raw.get(key, ())
            out[key] = child.ctrl(*groups)
        return out


def split_heads(h: Sig, layout: Sequence[Sequence[int]],
                keys: Sequence[str]) -> Dict[str, Tuple[Sig, ...]]:
    """Slice a (B, T, sum(sizes)) head output into named raw groups.

    Width-1 groups are squeezed to (B, T) exactly like the reference
    (``models/enc.py:78-81``).
    """
    flat_sizes = [s for group in layout for s in group]
    assert h.shape[-1] == sum(flat_sizes), (h.shape, flat_sizes)
    pieces = []
    ofs = 0
    for s in flat_sizes:
        piece = h.data[..., ofs:ofs + s]
        if s == 1:
            piece = piece[..., 0]
        pieces.append(Sig(piece, h.hop))
        ofs += s
    out: Dict[str, Tuple[Sig, ...]] = {}
    i = 0
    for key, group in zip(keys, layout):
        out[key] = tuple(pieces[i:i + len(group)])
        i += len(group)
    return out

#!/usr/bin/env python
"""Checkpoint migration: re-order the encoder head's parameter blocks.

Reference subsystem (``convert2v2.py`` + ``models/utils.py:12-38`` +
``test_rtf.py:35-132``): when the decoder's parameter-group order changes
between framework versions, the encoder's single ``out_linear`` head must
have its output-channel blocks permuted to match. This tool applies such a
permutation to an orbax checkpoint.

Usage:
    python tools/convert_ckpt.py --in ckpt/last --out ckpt/converted \
        --old-sizes 22 1 22 1 64 --new-order 4 1 0 3 2
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def permute_out_linear(tree, old_sizes, new_order):
    """Permute the trailing sum(old_sizes) output channels of every
    out_linear kernel/bias (reference ``ismir2interspeech_ckpt``)."""
    total = sum(old_sizes)
    offsets = np.cumsum([0] + list(old_sizes))

    def visit(path, leaf):
        name = "/".join(str(p) for p in path)
        if "out_linear" not in name:
            return leaf
        arr = np.asarray(leaf)
        axis = arr.ndim - 1  # output channels last (Dense kernel: (in, out))
        assert arr.shape[axis] >= total, (name, arr.shape)
        head = arr.shape[axis] - total
        blocks = [np.take(arr, np.arange(head), axis=axis)] if head else []
        for idx in new_order:
            sel = np.arange(head + offsets[idx], head + offsets[idx + 1])
            blocks.append(np.take(arr, sel, axis=axis))
        return np.concatenate(blocks, axis=axis)

    import jax
    return jax.tree_util.tree_map_with_path(visit, tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--old-sizes", type=int, nargs="+", required=True)
    ap.add_argument("--new-order", type=int, nargs="+", required=True)
    args = ap.parse_args()

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(args.inp))
    state["params"] = permute_out_linear(
        state["params"], args.old_sizes, args.new_order)
    ckptr.save(os.path.abspath(args.out), state)
    ckptr.wait_until_finished()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

"""Checkpointing (orbax-backed).

Reference semantics (``cfg/ae/vctk.yaml:12-18``): top-k by val_loss +
save_last, filename pattern ``step-val_loss``. Non-parameter state (running
feature-normalization min/max buffers, batch stats, optimizer state, step)
is part of the checkpoint — the reference persists these as torch buffers
(``ltng/vocoder.py:25-26``).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, top_k: int = 3):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.top_k = top_k
        self.ckptr = ocp.StandardCheckpointer()
        self._index_path = os.path.join(self.dir, "index.json")
        self._index: List[Tuple[float, str]] = []
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = [tuple(x) for x in json.load(f)]

    def _state_dict(self, state) -> Dict[str, Any]:
        return {"params": state.params, "opt_state": state.opt_state,
                "stats": state.stats, "batch_stats": state.batch_stats,
                "step": state.step}

    def save(self, state, val_loss: Optional[float] = None):
        self.save_last(state)
        if val_loss is None:
            return
        name = f"step={state.step}-val_loss={val_loss:.3f}"
        path = os.path.join(self.dir, name)
        if os.path.exists(path):
            shutil.rmtree(path)
        self.ckptr.save(path, self._state_dict(state))
        self.ckptr.wait_until_finished()
        self._index.append((float(val_loss), name))
        self._index.sort(key=lambda t: t[0])
        while len(self._index) > self.top_k:
            _, worst = self._index.pop()
            worst_path = os.path.join(self.dir, worst)
            if os.path.exists(worst_path):
                shutil.rmtree(worst_path)
        with open(self._index_path, "w") as f:
            json.dump(self._index, f)

    def save_last(self, state):
        path = os.path.join(self.dir, "last")
        if os.path.exists(path):
            shutil.rmtree(path)
        self.ckptr.save(path, self._state_dict(state))
        self.ckptr.wait_until_finished()

    def best_path(self) -> Optional[str]:
        if not self._index:
            return None
        return os.path.join(self.dir, self._index[0][1])

    def restore_params_into(self, path: str, state):
        """Model-variables-only restore (fresh optimizer state and step
        counter) — the frame-wise->sample-wise finetune path: restore a
        GOLF-ff checkpoint's params into the converted ss model
        (reference README.md:92-94 convert2samplewise flow).

        Template-FREE restore, then subset: a params-only restore must
        not depend on the checkpoint's optimizer layout (an Adam-trained
        ckpt restored into an SGD finetune has a mismatched opt_state
        template and orbax refuses the strict restore)."""
        restored = self.ckptr.restore(os.path.abspath(path))
        for key, cur in (("params", state.params), ("stats", state.stats),
                         ("batch_stats", state.batch_stats)):
            got = restored.get(key)
            if got is None:
                continue
            cur_leaves = jax.tree_util.tree_leaves(cur)
            got_leaves = jax.tree_util.tree_leaves(got)
            assert len(cur_leaves) == len(got_leaves), (
                key, len(cur_leaves), len(got_leaves))
            setattr(state, key, jax.tree_util.tree_map(
                lambda c, g: jnp.asarray(g, c.dtype), cur, got))
        return state

    def restore_into(self, path: str, state):
        """Non-strict restore (reference ``ltng/ae.py:209-210``): template
        comes from the freshly-initialized state."""
        target = self._state_dict(state)
        restored = self.ckptr.restore(os.path.abspath(path), target)
        state.params = restored["params"]
        state.opt_state = restored["opt_state"]
        state.stats = restored["stats"]
        state.batch_stats = restored["batch_stats"]
        state.step = int(restored["step"])
        return state


def load_checkpoint_variables(path: str, template: Dict) -> Dict:
    """Restore just model variables (params/stats/batch_stats) for
    inference/eval tooling."""
    ckptr = ocp.StandardCheckpointer()
    # template-free restore (the checkpoint also carries opt_state/step,
    # which eval tooling has no template for), then subset
    full = ckptr.restore(os.path.abspath(path))
    return {k: full[k] for k in ("params", "stats", "batch_stats")
            if k in full and k in template}

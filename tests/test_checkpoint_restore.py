"""Checkpoint restore across optimizer changes (round-4 fix): a
params-only restore must not depend on the checkpoint's optimizer
layout — the ff->ss finetune restores an Adam-trained checkpoint into a
fresh state whose optimizer may be SGD (tools/round4_ss2.sh)."""

import jax.numpy as jnp
import numpy as np
import optax

from golf_tpu.train.checkpoint import CheckpointManager
from golf_tpu.train.loop import TrainState, make_optimizer


def _params(seed):
    rng = np.random.default_rng(seed)
    return {"dense": {"kernel": jnp.asarray(
        rng.standard_normal((3, 4)).astype(np.float32)),
        "bias": jnp.zeros((4,), jnp.float32)}}


def test_restore_params_only_across_optimizers(tmp_path):
    p = _params(0)
    adam = make_optimizer(1e-4, optimizer="adam")
    state = TrainState(params=p, opt_state=adam.init(p),
                       stats={"m": jnp.asarray(1.5)},
                       batch_stats={}, step=7)
    ck = CheckpointManager(str(tmp_path / "ckpt"))
    ck.save_last(state)

    sgd = make_optimizer(1e-5, optimizer="sgd")
    p2 = _params(1)
    fresh = TrainState(params=p2, opt_state=sgd.init(p2),
                       stats={"m": jnp.asarray(0.0)},
                       batch_stats={}, step=0)
    out = ck.restore_params_into(str(tmp_path / "ckpt" / "last"), fresh)
    np.testing.assert_array_equal(out.params["dense"]["kernel"],
                                  p["dense"]["kernel"])
    assert float(out.stats["m"]) == 1.5
    assert out.step == 0  # fresh step/optimizer preserved
    # the SGD opt_state is untouched (fresh)
    leaves = optax.tree_utils.tree_get(out.opt_state, "count") \
        if hasattr(optax, "tree_utils") else None
    del leaves

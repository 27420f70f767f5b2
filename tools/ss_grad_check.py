#!/usr/bin/env python
"""Sample-wise-training diagnosis: is the ss gradient a descent
direction at the GOLF-ff anchor? (round-4 finding: YES — the finetune
drift is NOT a gradient bug.)

Finite-difference check of the full ss training loss along the computed
gradient at runs/r4/golf_ff/ckpt/last, plus a random-direction control.
Measured (CPU, B=1/T=24000, fixed rngs):

    loss0=3.2276  grad_norm=67.13
    -grad  eps=1e-05: delta=-6.67e-04  (linear pred -6.71e-04)
    -grad  eps=1e-04: delta=-6.57e-03  (pred -6.71e-03)
    -grad  eps=1e-03: delta=-4.95e-02  (descent; curvature visible)
    -grad  eps=1e-02: delta=+5.07e-01  (past the curvature scale)
    random eps<=1e-02: |delta| <= 2e-04 (landscape smooth)

Together with the lr=0 control (runs/r4/ss_lr0: val flat at 3.228 for
1000 steps -> the mutated stats are innocent), this pins the round-3
finetune regression on the OPTIMIZER: Adam's per-coordinate
normalization turns heavy-tailed gradient noise into full-lr steps with
a systematic uphill bias; plain SGD (tools/round4_ss2.sh variant C1)
is the counter-test.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import os
os.chdir("/root/repo")
from golf_tpu.config.registry import load_config
from golf_tpu.tasks.cli import build_from_config
from golf_tpu.core.sig import Sig
from golf_tpu.train.checkpoint import load_checkpoint_variables

cfg = load_config("cfg/ae/synthetic-mid.yaml")
mdl = load_config("cfg/ae/decoder/golf-precise-stable.yaml")
cfg["model"]["init_args"]["decoder"] = mdl["decoder"]
task, _, _ = build_from_config(cfg)

from golf_tpu.tasks.data import SyntheticVoiceDataset
ds = SyntheticVoiceDataset(4, 1.0, 24000, seed=2434)
x = np.stack([ds[i][0] for i in range(1)]); f0 = np.stack([ds[i][1] for i in range(1)])
x, f0 = jnp.asarray(x), jnp.asarray(f0)

variables = jax.jit(lambda xs, f0s: task.init(
    {"params": jax.random.key(0), "noise": jax.random.key(1),
     "dropout": jax.random.key(2)},
    Sig(xs, 1), Sig(f0s, 1), train=True,
    method=lambda m, *a, **k: m.training_step(*a, **k)))(x, f0)
restored = load_checkpoint_variables("runs/r4/golf_ff/ckpt/last", dict(variables))
variables = {**variables, **restored}
print("restored:", list(restored.keys()))

def loss_fn(p):
    out, _ = task.apply({**variables, "params": p}, Sig(x, 1), Sig(f0, 1),
                        train=True, rngs={"noise": jax.random.key(7),
                                          "dropout": jax.random.key(7)},
                        mutable=["stats", "batch_stats"],
                        method=lambda m, *a, **k: m.training_step(*a, **k))
    return out[0]

vgf = jax.jit(jax.value_and_grad(loss_fn))
l0, g = vgf(variables["params"])
gn = float(jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(g))))
print(f"loss0={float(l0):.6f} grad_norm={gn:.4f}")

jl = jax.jit(loss_fn)
def along(d, dn, eps_list, label):
    for eps in eps_list:
        p2 = jax.tree_util.tree_map(lambda w, dd: w - eps / dn * dd, variables["params"], d)
        l1 = float(jl(p2))
        print(f"  {label} eps={eps:g}: delta={l1 - float(l0):+.6e} (pred {-eps*gn if label=='-grad' else 0:+.3e})")

along(g, gn, [1e-5, 1e-4, 1e-3, 1e-2], "-grad")
rng = np.random.default_rng(0)
rd = jax.tree_util.tree_map(lambda w: jnp.asarray(rng.standard_normal(w.shape).astype(np.float32)), variables["params"])
rdn = float(jnp.sqrt(sum(jnp.sum(jnp.square(l)) for l in jax.tree_util.tree_leaves(rd))))
along(rd, rdn, [1e-4, 1e-3, 1e-2], "random")

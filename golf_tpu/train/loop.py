"""Trainer: jit-compiled SPMD training loop.

Covers the reference's Lightning surface (``cfg/ae/vctk.yaml`` trainer
block): max_steps budget, grad-clip 0.5, periodic validation, top-k
checkpoints by val_loss + save_last, EarlyStopping with check_finite (abort
on NaN), metric logging. One jitted train step over the device mesh; batch
sharded along the ``data`` axis, parameters replicated.
"""

from __future__ import annotations

import json
import math
import os
import queue as queue_mod
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core.sig import Sig
from ..parallel.mesh import make_mesh
from .checkpoint import CheckpointManager


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    stats: Any
    batch_stats: Any
    step: int


def make_optimizer(lr: float = 1e-4, grad_clip: float = 0.5,
                   optimizer: str = "adam",
                   lr_decay: Optional[float] = None,
                   **kwargs) -> optax.GradientTransformation:
    """Adam (+amsgrad for LPCNet recipes via optimizer='amsgrad') with the
    reference's decay option lr/(1 + decay*step)
    (``ltng/lpcnet.py:141-153``)."""
    if lr_decay:
        schedule = lambda step: lr / (1.0 + lr_decay * step)
    else:
        schedule = lr
    opt = {
        "adam": optax.adam,
        "adamw": optax.adamw,
        "sgd": optax.sgd,
        "amsgrad": optax.amsgrad,
    }[optimizer](schedule, **kwargs)
    if grad_clip and grad_clip > 0:
        opt = optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    # The sample-wise IIR occasionally emits an inf-norm gradient when a
    # learned filter momentarily rings; clip_by_global_norm(inf) = NaN,
    # which would poison Adam state permanently. Skip such updates
    # (recoverable spike) instead of dying at the first one; check_finite
    # still aborts if the LOSS itself goes non-finite for many steps.
    return optax.apply_if_finite(opt, max_consecutive_errors=100)


def _prefetch(it, stage, depth: int = 2):
    """Stage batches (host gen + async device_put) in a background thread
    so host data work and the host->device transfer overlap with the
    running step — through a remote-relay device the synchronous transfer
    otherwise serializes ~10 MB per step into the step time."""
    q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
    stop = object()

    def worker():
        try:
            for item in it:
                q.put(stage(item))
        except BaseException as e:  # surface loader errors in the consumer
            q.put(e)
        q.put(stop)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is stop:
            break
        if isinstance(item, BaseException):
            raise item
        yield item


class MetricsLogger:
    """JSONL metrics log + stdout; mirrors to W&B when the package and an
    API key are available (reference uses WandbLogger,
    cfg/ae/vctk.yaml:26-30)."""

    def __init__(self, run_dir: str, project: Optional[str] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._wandb = None
        if project and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb
                self._wandb = wandb
                wandb.init(project=project, dir=run_dir)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        rec.update({(prefix + k): float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in rec.items()
                             if k != "time"}, step=max(step, 0))

    def close(self):
        self._f.close()


class Trainer:
    def __init__(self, task, run_dir: str = "runs/default",
                 max_steps: int = 1_000_000, lr: float = 1e-4,
                 grad_clip: float = 0.5, val_every_steps: int = 5000,
                 log_every_steps: int = 50, seed: int = 2434,
                 save_top_k: int = 3, mesh=None, optimizer: str = "adam",
                 check_finite: bool = True,
                 early_stop_patience: Optional[int] = None,
                 lr_decay: Optional[float] = None,
                 wandb_project: Optional[str] = None,
                 restore_params_only: bool = False):
        self.task = task
        self.run_dir = run_dir
        self.max_steps = max_steps
        self.val_every_steps = val_every_steps
        self.log_every_steps = log_every_steps
        self.seed = seed
        self.check_finite = check_finite
        self.restore_params_only = restore_params_only
        # EarlyStopping(monitor=train_loss, patience, check_finite) analog
        # (reference cfg/ae/vctk.yaml:19-25); patience counts logged steps.
        self.early_stop_patience = early_stop_patience
        self._best_train_loss = float("inf")
        self._steps_since_best = 0
        self.tx = make_optimizer(lr, grad_clip, optimizer,
                                 lr_decay=lr_decay)
        self.mesh = mesh  # resolved lazily once the batch size is known
        self.logger = MetricsLogger(run_dir, project=wandb_project)
        self.ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"),
                                      top_k=save_top_k)
        self._compiled = None

    def _resolve_mesh(self, batch_size: int):
        if self.mesh is None:
            import jax
            n = len(jax.devices())
            # largest device count that divides the global batch
            data = next(d for d in range(min(n, batch_size), 0, -1)
                        if batch_size % d == 0)
            self.mesh = make_mesh(data=data, time=1,
                                  devices=jax.devices()[:data])
        return self.mesh

    # -- state ------------------------------------------------------------
    def init_state(self, sample_batch) -> TrainState:
        x, f0 = sample_batch[:2]
        self._resolve_mesh(x.shape[0])
        xs = Sig(jnp.asarray(x), 1)
        f0s = Sig(jnp.asarray(f0), 1)
        key = jax.random.key(self.seed)
        k1, k2, k3 = jax.random.split(key, 3)
        # jitted init: eager init would compile each primitive separately
        # (painful through a remote-compile TPU relay)
        variables = jax.jit(lambda xs, f0s: self.task.init(
            {"params": k1, "noise": k2, "dropout": k3}, xs, f0s, train=True,
            method=lambda m, *a, **kw: m.training_step(*a, **kw)))(xs, f0s)
        params = variables.get("params", {})
        stats = variables.get("stats", {})
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        return TrainState(params, opt_state, stats, batch_stats, 0)

    # -- steps ------------------------------------------------------------
    def _train_step(self, params, opt_state, stats, batch_stats, x, f0,
                    rng):
        k_noise, k_drop = jax.random.split(rng)

        def loss_fn(p):
            out, mutated = self.task.apply(
                {"params": p, "stats": stats, "batch_stats": batch_stats},
                Sig(x, 1), Sig(f0, 1), train=True,
                rngs={"noise": k_noise, "dropout": k_drop},
                mutable=["stats", "batch_stats"],
                method=lambda m, *a, **kw: m.training_step(*a, **kw))
            loss, metrics = out
            return loss, (metrics, mutated)

        (loss, (metrics, mutated)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics)
        metrics["grad_norm"] = gnorm
        return (new_params, new_opt, mutated.get("stats", stats),
                mutated.get("batch_stats", batch_stats), metrics)

    def _compile(self):
        if self._compiled is None:
            repl = NamedSharding(self.mesh, P())
            data = NamedSharding(self.mesh, P("data"))
            self._compiled = jax.jit(
                self._train_step,
                in_shardings=(repl, repl, repl, repl, data, data, repl),
                donate_argnums=(0, 1))
            def val_fn(params, stats, bstats, x, f0, rng):
                return self.task.apply(
                    {"params": params, "stats": stats,
                     "batch_stats": bstats},
                    Sig(x, 1), Sig(f0, 1),
                    rngs={"noise": rng, "dropout": rng},
                    method=lambda m, *a, **kw: m.validation_step(*a, **kw))
            self._val_step = jax.jit(
                val_fn, in_shardings=(repl, repl, repl, data, data, repl))
            # replicated variant for the straggler remainder chunk
            self._val_step_repl = jax.jit(
                val_fn, in_shardings=(repl,) * 6)
        return self._compiled

    def _split_for_mesh(self, x, f0):
        """Sharded eval needs batch % data-axis == 0. Instead of dropping
        stragglers (which biases small test sets; reference weights all N,
        ``ltng/ae.py:258-274``) split the batch into a sharded multiple-of-
        mesh chunk plus a replicated remainder chunk — every sample is
        scored, each chunk weighted by its own size."""
        d = self.mesh.shape["data"]
        keep = (x.shape[0] // d) * d
        chunks = []
        if keep:
            chunks.append((x[:keep], f0[:keep], True))
        if keep < x.shape[0]:
            chunks.append((x[keep:], f0[keep:], False))
        return chunks

    # -- loops ------------------------------------------------------------
    def validate(self, state: TrainState, loader, max_batches=None) -> Dict:
        self._compile()
        totals: Dict[str, float] = {}
        weight = 0.0
        rng = jax.random.key(self.seed + 999)
        for i, batch in enumerate(loader):
            if max_batches is not None and i >= max_batches:
                break
            for x, f0, sharded in self._split_for_mesh(*batch[:2]):
                step = self._val_step if sharded else self._val_step_repl
                out = step(state.params, state.stats, state.batch_stats,
                           jnp.asarray(x), jnp.asarray(f0), rng)
                w = x.shape[0]
                for k, v in out.items():
                    totals[k] = totals.get(k, 0.0) + float(v) * w
                weight += w
        return {("val_" + k): v / max(weight, 1)
                for k, v in totals.items()}

    def fit(self, datamodule, state: Optional[TrainState] = None,
            ckpt_path: Optional[str] = None) -> TrainState:
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        val_loader = datamodule.val_dataloader()

        it = iter(train_loader)
        first = next(it)
        if state is None:
            state = self.init_state(first)
            if ckpt_path:
                if self.restore_params_only:
                    state = self.ckpt.restore_params_into(ckpt_path, state)
                else:
                    state = self.ckpt.restore_into(ckpt_path, state)
        step_fn = self._compile()

        data_sh = NamedSharding(self.mesh, P("data"))

        def batches():
            while True:
                for b in train_loader:
                    yield b

        def stage(b):
            x, f0 = b[:2]
            return (jax.device_put(np.ascontiguousarray(x), data_sh),
                    jax.device_put(np.ascontiguousarray(f0), data_sh))

        staged = _prefetch(batches(), stage, depth=2)

        rng = jax.random.key(self.seed + 1)
        t0 = time.time()
        samples = 0
        while state.step < self.max_steps:
            x, f0 = next(staged)
            rng, sub = jax.random.split(rng)
            (state.params, state.opt_state, state.stats, state.batch_stats,
             metrics) = step_fn(state.params, state.opt_state, state.stats,
                                state.batch_stats, x, f0, sub)
            state.step += 1
            samples += x.shape[0] * x.shape[1]

            if state.step % self.log_every_steps == 0:
                m = {k: float(v) for k, v in metrics.items()}
                dt = time.time() - t0
                m["samples_per_sec"] = samples / dt
                t0, samples = time.time(), 0
                self.logger.log(state.step, m, "train_")
                print(f"step {state.step}: " + ", ".join(
                    f"{k}={v:.4g}" for k, v in m.items()), flush=True)
                if self.check_finite and not math.isfinite(m["loss"]):
                    raise FloatingPointError(
                        f"non-finite loss at step {state.step}")
                if self.early_stop_patience:
                    if m["loss"] < self._best_train_loss:
                        self._best_train_loss = m["loss"]
                        self._steps_since_best = 0
                    else:
                        self._steps_since_best += 1
                        if self._steps_since_best >= \
                                self.early_stop_patience:
                            print(f"early stop: train_loss plateaued for "
                                  f"{self.early_stop_patience} logged "
                                  f"steps", flush=True)
                            break

            if state.step % self.val_every_steps == 0 or \
                    state.step >= self.max_steps:
                val_metrics = self.validate(state, val_loader)
                self.logger.log(state.step, val_metrics)
                print(f"[val @ {state.step}] " + ", ".join(
                    f"{k}={v:.4g}" for k, v in val_metrics.items()),
                    flush=True)
                self.ckpt.save(state, val_metrics.get("val_loss"))

        self.ckpt.save_last(state)
        return state

    def test(self, datamodule, state: TrainState) -> Dict:
        datamodule.setup("test")
        loader = datamodule.test_dataloader()
        if self.mesh is None:
            self._resolve_mesh(getattr(datamodule, "batch_size", 1))
        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        def test_fn(params, stats, bstats, x, f0, rng):
            return self.task.apply(
                {"params": params, "stats": stats, "batch_stats": bstats},
                Sig(x, 1), Sig(f0, 1),
                rngs={"noise": rng, "dropout": rng},
                method=lambda m, *a, **kw: m.test_step(*a, **kw))
        test_step = jax.jit(
            test_fn, in_shardings=(repl, repl, repl, data, data, repl))
        test_step_repl = jax.jit(test_fn, in_shardings=(repl,) * 6)
        totals: Dict[str, float] = {}
        weights = 0.0
        rng = jax.random.key(self.seed + 12345)
        for batch in loader:
            for x, f0, sharded in self._split_for_mesh(*batch[:2]):
                step = test_step if sharded else test_step_repl
                out = step(state.params, state.stats, state.batch_stats,
                           jnp.asarray(x), jnp.asarray(f0), rng)
                n = float(out.pop("N", x.shape[0]))
                for k, v in out.items():
                    totals[k] = totals.get(k, 0.0) + float(v) * n
                weights += n
        result = {("avg_" + k): v / max(weights, 1)
                  for k, v in totals.items()}
        result["avg_mss_loss"] = result.pop("avg_loss", float("nan"))
        print(json.dumps(result))
        self.logger.log(-1, result)
        return result

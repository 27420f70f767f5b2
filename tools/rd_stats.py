#!/usr/bin/env python
"""Rd statistics of a trained GOLF model over a corpus (port of the
TISMIR ablation notebook's ``calculate_Rd_stats`` + transformed-LF flow
cells, reference ``notebooks/tismir/ablation.ipynb``).

Runs the encoder over the run's validation split, maps the wavetable
select weight w in [0, 1] onto the log-spaced Rd grid
(``ops/lf.py::build_glottal_table``: Rd = exp(lerp(log min, log max, w))),
masks by voicing (f0 > 50 Hz), and reports voiced-frame Rd mean/std/
min/max plus a decile histogram. With --flows-out, also dumps the mean
and +/-1 std transformed-LF derivative waveforms for plotting.

Usage:
    python tools/rd_stats.py --config runs/<run>/config.yaml \
        --ckpt runs/<run>/ckpt/last [--items 16] [--flows-out rd_flows.npz]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--items", type=int, default=16)
    ap.add_argument("--flows-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from golf_tpu.config.registry import load_config
    from golf_tpu.core.sig import Sig
    from golf_tpu.tasks.cli import build_from_config

    cfg = load_config(args.config)
    task, datamodule, _ = build_from_config(cfg)

    osc_cfg = cfg["model"]["init_args"]["decoder"]["init_args"][
        "harm_oscillator"]["init_args"]
    min_rd = float(osc_cfg.get("min_R_d", 0.3))
    max_rd = float(osc_cfg.get("max_R_d", 2.7))

    datamodule.setup("validate")
    batches = datamodule.val_dataloader()

    def body(mdl, x, f0):
        raw = mdl.encoder(x, f0=f0)
        raw.pop("voicing_logits", None)
        raw.pop("f0", None)
        params = mdl.decoder.apply_ctrl(raw)
        (w,) = params["harm_oscillator_params"]
        return w.data, w.hop

    variables = None
    weights, masks = [], []
    seen = 0
    for batch in batches:
        x, f0 = batch[0], batch[1]
        xs = Sig(jnp.asarray(x), 1)
        fs = Sig(jnp.asarray(f0), 1)
        if variables is None:
            variables = jax.jit(lambda a, b: task.init(
                {"params": jax.random.key(0), "noise": jax.random.key(1),
                 "dropout": jax.random.key(2)},
                a, b, train=True,
                method=lambda m, *ar, **k: m.training_step(*ar, **k)))(
                    xs, fs)
            if args.ckpt:
                from golf_tpu.train.checkpoint import \
                    load_checkpoint_variables
                variables = {**variables,
                             **load_checkpoint_variables(
                                 args.ckpt, dict(variables))}
        w, hop = task.apply(variables, xs, fs,
                            rngs={"noise": jax.random.key(3),
                                  "dropout": jax.random.key(4)},
                            method=body)
        w = np.asarray(w)                       # (B, frames)
        f0_np = np.asarray(f0)
        frames = w.shape[1]
        # frame-rate voicing mask from the conditioning f0
        idx = np.minimum(np.arange(frames) * hop, f0_np.shape[1] - 1)
        voiced = f0_np[:, idx] > 50.0
        weights.append(w)
        masks.append(voiced)
        seen += w.shape[0]
        if seen >= args.items:
            break

    w = np.concatenate([a.reshape(-1) for a in weights])
    m = np.concatenate([a.reshape(-1) for a in masks])
    wv = w[m]
    log_rd = np.log(min_rd) + wv * (math.log(max_rd) - math.log(min_rd))
    rd = np.exp(log_rd)
    qs = np.quantile(rd, np.linspace(0, 1, 11)) if rd.size else []
    stats = {
        "n_voiced_frames": int(rd.size),
        "n_frames": int(w.size),
        "rd_mean": float(rd.mean()) if rd.size else None,
        "rd_std": float(rd.std()) if rd.size else None,
        "rd_min": float(rd.min()) if rd.size else None,
        "rd_max": float(rd.max()) if rd.size else None,
        "rd_deciles": [float(q) for q in qs],
        "min_R_d": min_rd, "max_R_d": max_rd,
    }
    if args.flows_out and rd.size:
        from golf_tpu.ops.lf import transformed_lf_v2
        mean_rd = float(rd.mean())
        lo = max(min_rd, float(np.exp(log_rd.mean() - log_rd.std())))
        hi = min(max_rd, float(np.exp(log_rd.mean() + log_rd.std())))
        flows = transformed_lf_v2(np.array([lo, mean_rd, hi]), points=1024)
        np.savez(args.flows_out, rds=np.array([lo, mean_rd, hi]),
                 flows=flows)
        stats["flows_out"] = args.flows_out
    print(json.dumps(stats))


if __name__ == "__main__":
    main()

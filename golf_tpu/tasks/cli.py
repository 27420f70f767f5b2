"""CLI runner: fit / validate / test / predict subcommands.

Equivalent of the reference's LightningCLI entry points
(``autoencode.py``, ``main.py``) + ``ltng/cli.py``'s prediction writer and
config-snapshot callback:

    python autoencode.py fit --config cfg/ae/vctk.yaml \
        --model cfg/ae/decoder/golf.yaml [key.dotted.path=value ...]

``--model FILE`` merges the decoder subtree into ``model.init_args`` the
way jsonargparse does; dotted overrides apply last; the resolved config is
snapshotted into the run dir (rank-0 only on multihost).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np
import yaml

from ..config.registry import (apply_overrides, deep_update, instantiate,
                               load_config, resolve_interpolations,
                               save_config)
from ..core.sig import Sig


def _parse_args(argv: List[str]):
    p = argparse.ArgumentParser(description="golf_tpu CLI")
    p.add_argument("subcommand",
                   choices=["fit", "validate", "test", "predict"])
    p.add_argument("--config", action="append", default=[],
                   help="YAML config file(s), merged in order")
    p.add_argument("--model", default=None,
                   help="YAML file merged into model.init_args "
                        "(decoder subtree)")
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--run_dir", default=None)
    p.add_argument("overrides", nargs="*",
                   help="dotted key=value overrides")
    return p.parse_args(argv)


def build_from_config(cfg: Dict):
    """Instantiate (task, datamodule, trainer_kwargs) from a resolved
    config tree."""
    from .ae import build_voice_autoencoder
    from .vocoder import build_ddsp_vocoder
    from .world_ae import WORLDAutoEncoder
    from .lpcnet import build_lpcnet_vocoder

    model_node = cfg["model"]
    class_path = model_node.get("class_path", "ltng.ae.VoiceAutoEncoder")
    init_args = model_node.get("init_args", model_node)
    if class_path.endswith("VoiceAutoEncoder"):
        task = build_voice_autoencoder(init_args)
    elif class_path.endswith("DDSPVocoder"):
        task = build_ddsp_vocoder(init_args)
    elif class_path.endswith("WORLDAutoEncoder"):
        task = WORLDAutoEncoder(
            sample_rate=init_args.get("sample_rate", 24000),
            hop_length=init_args.get("hop_length", 240),
            criterion=instantiate(init_args["criterion"]))
    elif class_path.endswith("LPCNetVocoder"):
        task = build_lpcnet_vocoder(init_args)
    else:
        raise ValueError(f"Unknown task class: {class_path}")

    datamodule = instantiate(cfg["data"], tuples=False)

    trainer_cfg = cfg.get("trainer", {})
    opt_cfg = cfg.get("optimizer", {})
    opt_init = opt_cfg.get("init_args", {})
    opt_name = opt_cfg.get("class_path", "torch.optim.Adam")
    opt_name = opt_name.rsplit(".", 1)[-1].lower()
    # EarlyStopping callback config (reference cfg/ae/vctk.yaml:19-25)
    patience = None
    check_finite = True
    for cb in trainer_cfg.get("callbacks", []) or []:
        if str(cb.get("class_path", "")).endswith("EarlyStopping"):
            ia = cb.get("init_args", {})
            patience = ia.get("patience")
            check_finite = ia.get("check_finite", True)

    trainer_kwargs = dict(
        max_steps=trainer_cfg.get("max_steps", 1_000_000),
        val_every_steps=trainer_cfg.get("check_val_every_n_steps", 5000),
        restore_params_only=bool(cfg.get("ckpt_params_only", False)),
        lr=opt_init.get("lr", 1e-4),
        grad_clip=trainer_cfg.get("gradient_clip_val", 0.5),
        optimizer=opt_name if opt_name in ("adam", "adamw", "sgd")
        else "adam",
        seed=cfg.get("seed_everything", 2434) or 2434,
        early_stop_patience=patience,
        check_finite=check_finite,
        lr_decay=cfg.get("lr_scheduler", {}).get("decay")
        if isinstance(cfg.get("lr_scheduler"), dict) else None,
        wandb_project=(trainer_cfg.get("logger", {}) or {})
        .get("init_args", {}).get("project"),
    )
    if opt_init.get("amsgrad"):
        trainer_kwargs["optimizer"] = "amsgrad"
    return task, datamodule, trainer_kwargs


class PredictionWriter:
    """Write per-utterance wavs preserving relative paths (reference
    ``MyPredictionWriter``, ``ltng/cli.py:15-40``)."""

    def __init__(self, output_dir: str, sample_rate: int):
        self.output_dir = output_dir
        self.sample_rate = sample_rate

    def write(self, rel_path: str, audio: np.ndarray):
        from ..utils.wav import write_wav
        out = os.path.join(self.output_dir, rel_path)
        write_wav(out, np.asarray(audio).reshape(-1), self.sample_rate)


def run(argv: List[str], default_config: Optional[str] = None):
    args = _parse_args(argv)

    cfg: Dict = {}
    configs = list(args.config)
    if not configs and default_config:
        configs = [default_config]
    for path in configs:
        with open(path) as f:
            cfg = deep_update(cfg, yaml.safe_load(f))
    if args.model:
        with open(args.model) as f:
            # resolve ${...} against the model file's own root first
            # (reference: the --model file is parsed in its own
            # omegaconf namespace, cfg/ae/decoder/golf.yaml window)
            model_extra = resolve_interpolations(yaml.safe_load(f))
        cfg.setdefault("model", {}).setdefault("init_args", {})
        cfg["model"]["init_args"] = deep_update(
            cfg["model"]["init_args"], model_extra)
    if args.overrides:
        cfg = apply_overrides(cfg, args.overrides)
    cfg = resolve_interpolations(cfg)

    run_dir = args.run_dir or cfg.get("run_dir") or os.path.join(
        "runs", time.strftime("%Y%m%d-%H%M%S"))
    os.makedirs(run_dir, exist_ok=True)

    import jax
    if jax.process_index() == 0:
        save_config(cfg, os.path.join(run_dir, "config.yaml"))

    task, datamodule, trainer_kwargs = build_from_config(cfg)

    from ..train.loop import Trainer
    trainer = Trainer(task, run_dir=run_dir, **trainer_kwargs)

    ckpt_path = args.ckpt_path or cfg.get("ckpt_path")

    if args.subcommand == "fit":
        trainer.fit(datamodule, ckpt_path=ckpt_path)
    elif args.subcommand == "validate":
        datamodule.setup("fit")
        state = _restore_state(trainer, datamodule, ckpt_path)
        print(json.dumps(trainer.validate(
            state, datamodule.val_dataloader())))
    elif args.subcommand == "test":
        from .lpcnet import LPCNetVocoder, run_lpcnet_test
        from .vocoder import DDSPVocoder, run_vocoder_test
        from .world_ae import WORLDAutoEncoder as WAE
        if isinstance(task, WAE):
            print(json.dumps(task.run_test(datamodule)))
            return 0
        datamodule.setup("fit")
        state = _restore_state(trainer, datamodule, ckpt_path)
        if isinstance(task, DDSPVocoder):
            variables = {"params": state.params, "stats": state.stats,
                         "batch_stats": state.batch_stats}
            mi = cfg["model"].get("init_args", {})
            print(json.dumps(run_vocoder_test(
                task, variables, datamodule,
                mi.get("sample_rate", 24000), mi.get("hop_length", 120),
                task.criterion)))
        elif isinstance(task, LPCNetVocoder):
            variables = {"params": state.params, "stats": state.stats,
                         "batch_stats": state.batch_stats}
            print(json.dumps(run_lpcnet_test(
                task, variables, datamodule,
                ar_dump_dir=cfg.get("ar_dump_dir"))))
        else:
            trainer.test(datamodule, state)
    elif args.subcommand == "predict":
        from .world_ae import WORLDAutoEncoder as WAE
        if isinstance(task, WAE):
            _predict_world(task, datamodule, run_dir, cfg)
            return 0
        datamodule.setup("fit")
        state = _restore_state(trainer, datamodule, ckpt_path)
        datamodule.setup("predict")
        _predict(trainer, task, state, datamodule, run_dir, cfg)
    return 0


def _predict_world(task, datamodule, run_dir, cfg):
    sr = cfg["model"].get("init_args", {}).get("sample_rate", 24000)
    writer = PredictionWriter(os.path.join(run_dir, "predictions"), sr)
    datamodule.setup("predict")
    for batch in datamodule.predict_dataloader():
        x, f0, rel = batch[0], batch[1], batch[2]
        y, _ = task.predict_step(np.asarray(x), np.asarray(f0))
        writer.write(rel[0] if isinstance(rel, (list, tuple)) else rel,
                     y[0])
    print(f"predictions written to {writer.output_dir}")


def _restore_state(trainer, datamodule, ckpt_path):
    loader = datamodule.train_dataloader() if datamodule.train_dataset \
        else datamodule.val_dataloader()
    batch = next(iter(loader))
    state = trainer.init_state(batch)
    if ckpt_path:
        # eval never uses optimizer state: restore model variables only,
        # so checkpoints saved under a DIFFERENT optimizer (e.g. the SGD
        # sample-wise finetune) restore cleanly into test/validate/predict
        state = trainer.ckpt.restore_params_into(ckpt_path, state)
    return state


def _predict(trainer, task, state, datamodule, run_dir, cfg):
    import jax
    import jax.numpy as jnp
    from .vocoder import DDSPVocoder, chunked_ola_predict
    sr = cfg.get("model", {}).get("init_args", {}).get("sample_rate", 24000)
    writer = PredictionWriter(os.path.join(run_dir, "predictions"), sr)
    variables = {"params": state.params, "stats": state.stats,
                 "batch_stats": state.batch_stats}
    rngs = {"noise": jax.random.key(0), "dropout": jax.random.key(0)}
    loader = datamodule.predict_dataloader()
    is_vocoder = isinstance(task, DDSPVocoder)

    if is_vocoder:
        # variables as jit argument (constant-wavetable XLA pathology;
        # see models/synth.py GlottalFlowTable)
        @jax.jit
        def resynth(vs, frames):
            out, _ = task.apply(
                vs, Sig(frames, 1), rngs=rngs,
                method=lambda m, *a, **kw: m.predict_step(*a, **kw))
            return out.data

    for batch in loader:
        x, f0, rel = batch[0], batch[1], batch[2]
        if is_vocoder:
            # 6 s / 0.3 s-overlap chunked OLA (reference
            # ltng/vocoder.py:350-383)
            audio = chunked_ola_predict(
                lambda fr: resynth(variables, jnp.asarray(fr)),
                np.asarray(x), sr)
            writer.write(rel[0] if isinstance(rel, (list, tuple)) else rel,
                         audio)
            continue
        out, _ = task.apply(
            variables,
            Sig(jnp.asarray(x), 1), Sig(jnp.asarray(f0), 1),
            rngs=rngs,
            method=lambda m, *a, **kw: m.predict_step(*a, **kw))
        audio = np.asarray(out.data if isinstance(out, Sig) else out)
        writer.write(rel[0] if isinstance(rel, (list, tuple)) else rel,
                     audio[0])
    print(f"predictions written to {writer.output_dir}")

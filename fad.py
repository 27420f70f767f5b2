#!/usr/bin/env python
"""Fréchet Audio Distance over per-speaker directory trees (reference
``fad.py``).

The reference uses fadtk + descript-audio-codec / VGGish embeddings. Those
models aren't baked into this image, so the default embedding is a
log-mel-statistics embedder (per-window log-mel mean+cov features) — the
Fréchet machinery (mu/Sigma + trace term) is identical and any embedding
module exposing ``embed(wav, sr) -> (n, d)`` can be plugged in.
"""

from __future__ import annotations

import argparse
import pathlib
from typing import Dict, List

import numpy as np

from golf_tpu.utils.wav import read_wav


class LogMelEmbedding:
    """5 s windows, 50 % hop (reference DAC24kModel windowing,
    ``fad.py:30-69``), log-mel frame stats per window."""

    def __init__(self, sr: int = 24000, n_mels: int = 64,
                 window_secs: float = 5.0):
        self.sr = sr
        self.n_mels = n_mels
        self.window = int(window_secs * sr)

    def _logmel(self, x: np.ndarray) -> np.ndarray:
        from golf_tpu.ops.stft import melspectrogram
        import jax.numpy as jnp
        mel = melspectrogram(jnp.asarray(x[None]), self.sr, 1024, 256,
                             self.n_mels, power=2.0)
        return np.log(np.asarray(mel[0]) + 1e-8)

    def embed(self, wav: np.ndarray, sr: int) -> np.ndarray:
        assert sr == self.sr, (sr, self.sr)
        wav = wav.reshape(-1)
        hop = self.window // 2
        if len(wav) < self.window:
            wav = np.pad(wav, (0, self.window - len(wav)))
        outs = []
        for start in range(0, max(1, len(wav) - self.window + 1), hop):
            seg = wav[start:start + self.window]
            lm = self._logmel(seg)
            outs.append(np.concatenate([lm.mean(1), lm.std(1)]))
        return np.stack(outs)


def make_vggish_embedder(weights_path):
    """Real VGGish (AudioSet) embedder — the reference's FAD embedding
    (``ltng/lpcnet.py:274-283`` via frechet_audio_distance / fadtk).

    The architecture + preprocessing live in ``golf_tpu.models.vggish``
    (flax, runs on TPU); this loads the standard torchvggish checkpoint
    (``vggish-*.pth`` state dict) from a LOCAL path. Pretrained weights
    are NOT bundled in this image and cannot be downloaded from it (zero
    egress): pass ``--weights random`` for an architecture-only
    random-init smoke run (scores then NOT comparable)."""
    from golf_tpu.models.vggish import (VGGishEmbedder,
                                        params_from_torch_state_dict,
                                        random_params)
    if weights_path == "random":
        return VGGishEmbedder(random_params()), False
    import torch
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    return VGGishEmbedder(params_from_torch_state_dict(sd)), True


def make_dac_embedder(weights_path):
    """DAC-24kHz encoder embedder — the reference's DEFAULT FAD embedding
    (``fad.py:30-69``: descript-audio-codec encoder, 1024-d, 5 s / 50 %
    windows, -16 LUFS loudness normalization).

    Architecture + preprocessing live in ``golf_tpu.models.dac`` (flax);
    this loads a descript-audio-codec ``weights.pth`` state dict from a
    LOCAL path (zero egress: not bundled). ``--weights random`` gives an
    architecture-only smoke run (scores then NOT comparable)."""
    from golf_tpu.models.dac import (DACEmbedder,
                                     params_from_torch_state_dict,
                                     random_params)
    if weights_path == "random":
        return DACEmbedder(random_params()), False
    import torch
    sd = torch.load(weights_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return DACEmbedder(params_from_torch_state_dict(sd)), True


def frechet_distance(mu1, s1, mu2, s2) -> float:
    from scipy import linalg
    diff = mu1 - mu2
    covmean = linalg.sqrtm(s1 @ s2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(s1) + np.trace(s2)
                 - 2 * np.trace(covmean))


def stats(embs: np.ndarray):
    return embs.mean(0), np.cov(embs, rowvar=False)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref_dir")
    ap.add_argument("eval_dir")
    ap.add_argument("--suffix", default=".wav")
    ap.add_argument("--sr", type=int, default=24000)
    ap.add_argument("--csv", default=None)
    ap.add_argument("--embedder", choices=["logmel", "vggish", "dac"],
                    default="logmel")
    ap.add_argument("--weights", default=None,
                    help="local path to a torchvggish / descript-audio-"
                         "codec state dict, or 'random' for an "
                         "architecture-only smoke run (required for "
                         "--embedder vggish|dac)")
    args = ap.parse_args()

    if args.embedder == "dac":
        if not args.weights:
            raise SystemExit(
                "--embedder dac needs --weights /path/to/dac_24khz.pth "
                "(or --weights random for a smoke run): descript-audio-"
                "codec weights are not bundled in this image and cannot "
                "be downloaded from it")
        emb, real = make_dac_embedder(args.weights)
        if real:
            print("# embedder: DAC-24kHz (the reference default; scores "
                  "comparable to published DAC-FAD)")
        else:
            print("# embedder: DAC-24kHz RANDOM-INIT — architecture "
                  "smoke run only; scores NOT comparable to published "
                  "FAD")
    elif args.embedder == "vggish":
        if not args.weights:
            raise SystemExit(
                "--embedder vggish needs --weights /path/to/vggish.pth "
                "(or --weights random for a smoke run): pretrained "
                "VGGish weights are not bundled in this image and "
                "cannot be downloaded from it")
        emb, real = make_vggish_embedder(args.weights)
        if real:
            print("# embedder: VGGish (scores comparable to published "
                  "VGGish-FAD)")
        else:
            print("# embedder: VGGish RANDOM-INIT — architecture smoke "
                  "run only; scores NOT comparable to published FAD")
    else:
        emb = LogMelEmbedding(sr=args.sr)
        print("# embedder: log-mel statistics — NOT comparable to "
              "published VGGish/DAC FAD numbers (no pretrained weights "
              "in this image; pass --embedder vggish --weights PATH for "
              "the real embedding)")
    ref_dir = pathlib.Path(args.ref_dir)
    eval_dir = pathlib.Path(args.eval_dir)

    # per-speaker = per first-level subdirectory (reference fad.py:90-131)
    speakers = sorted({p.parent.relative_to(eval_dir)
                       for p in eval_dir.glob("**/*" + args.suffix)})
    scores: Dict[str, float] = {}
    for spk in speakers:
        ref_embs, eval_embs = [], []
        for p in sorted((eval_dir / spk).glob("*" + args.suffix)):
            wav, sr = read_wav(str(p))
            eval_embs.append(emb.embed(wav, sr))
            rp = ref_dir / spk / p.name
            if rp.exists():
                wav, sr = read_wav(str(rp))
                ref_embs.append(emb.embed(wav, sr))
        if not ref_embs:
            continue
        mu_r, s_r = stats(np.concatenate(ref_embs))
        mu_e, s_e = stats(np.concatenate(eval_embs))
        scores[str(spk)] = frechet_distance(mu_r, s_r, mu_e, s_e)

    vals = np.asarray(list(scores.values()))
    for spk, v in scores.items():
        print(f"{spk}: {v:.4f}")
    print(f"mean {vals.mean():.4f}  std {vals.std():.4f}  "
          f"min {vals.min():.4f}  max {vals.max():.4f}")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("speaker,fad\n")
            for spk, v in scores.items():
                f.write(f"{spk},{v}\n")


if __name__ == "__main__":
    main()

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


class VGGishEmbedding:
    """Real VGGish (AudioSet) embedder — the reference's FAD embedding
    (``ltng/lpcnet.py:274-283`` via frechet_audio_distance).

    The architecture is implemented here in torch and loads the standard
    ``torchvggish`` checkpoint (``vggish-*.pth`` state dict) from a LOCAL
    path — pretrained weights are NOT bundled in this image and cannot be
    downloaded from it (zero egress), so ``--embedder vggish`` requires
    ``--weights /path/to/vggish.pth``. Scores with these weights are
    comparable to published VGGish-FAD numbers; without them use the
    clearly-labeled log-mel embedder instead.
    """

    SR = 16000

    def __init__(self, weights_path: str):
        import torch
        import torch.nn as nn

        class VGGish(nn.Module):
            def __init__(self):
                super().__init__()
                def block(cin, cout):
                    return [nn.Conv2d(cin, cout, 3, padding=1),
                            nn.ReLU(True)]
                self.features = nn.Sequential(
                    *block(1, 64), nn.MaxPool2d(2, 2),
                    *block(64, 128), nn.MaxPool2d(2, 2),
                    *block(128, 256), *block(256, 256),
                    nn.MaxPool2d(2, 2),
                    *block(256, 512), *block(512, 512),
                    nn.MaxPool2d(2, 2))
                self.embeddings = nn.Sequential(
                    nn.Linear(512 * 4 * 6, 4096), nn.ReLU(True),
                    nn.Linear(4096, 4096), nn.ReLU(True),
                    nn.Linear(4096, 128), nn.ReLU(True))

            def forward(self, x):
                x = self.features(x)
                # (N, 512, 6, 4) -> (N, 4, 6, 512) -> flat, matching the
                # torchvggish layout
                x = x.permute(0, 3, 2, 1).contiguous()
                return self.embeddings(x.view(x.shape[0], -1))

        self.torch = torch
        self.model = VGGish()
        sd = torch.load(weights_path, map_location="cpu",
                        weights_only=True)
        self.model.load_state_dict(sd)
        self.model.eval()

    def _log_mel_patches(self, wav: np.ndarray) -> np.ndarray:
        """0.96 s patches of 96 x 64 log-mel frames (25 ms window, 10 ms
        hop, 64 mel bands 125-7500 Hz, log(mel + 0.01))."""
        from golf_tpu.ops.stft import melscale_fbanks
        n_fft, win, hop = 512, 400, 160
        n = (len(wav) - win) // hop + 1
        if n < 96:
            wav = np.pad(wav, (0, (96 - n) * hop + win))
            n = 96
        idx = np.arange(n)[:, None] * hop + np.arange(win)[None, :]
        frames = wav[idx] * np.hanning(win)
        spec = np.abs(np.fft.rfft(frames, n_fft)) ** 2
        fb = melscale_fbanks(n_fft // 2 + 1, 125.0, 7500.0, 64, self.SR)
        mel = np.log(spec @ fb + 0.01)
        patches = []
        for s in range(0, n - 95, 96):
            patches.append(mel[s:s + 96])
        return np.stack(patches).astype(np.float32)

    def embed(self, wav: np.ndarray, sr: int) -> np.ndarray:
        wav = np.asarray(wav, np.float64).reshape(-1)
        if sr != self.SR:
            from math import gcd
            from scipy.signal import resample_poly
            g = gcd(sr, self.SR)
            wav = resample_poly(wav, self.SR // g, sr // g)
        patches = self._log_mel_patches(wav)
        with self.torch.no_grad():
            x = self.torch.from_numpy(patches)[:, None]
            return self.model(x).numpy()


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
    ap.add_argument("--embedder", choices=["logmel", "vggish"],
                    default="logmel")
    ap.add_argument("--weights", default=None,
                    help="local path to a torchvggish state dict "
                         "(required for --embedder vggish)")
    args = ap.parse_args()

    if args.embedder == "vggish":
        if not args.weights:
            raise SystemExit(
                "--embedder vggish needs --weights /path/to/vggish.pth: "
                "pretrained VGGish weights are not bundled in this image "
                "and cannot be downloaded from it")
        emb = VGGishEmbedding(args.weights)
        print("# embedder: VGGish (scores comparable to published "
              "VGGish-FAD)")
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

#!/usr/bin/env python
"""Batch f0 extraction -> .pv text files (reference scripts/wav2f0.py).

Methods: 'dio' (default; WORLD-lite, 5 ms hop), 'native' (C++ worldlite
if built), 'swipe' (SWIPE' sawtooth-inspired estimator, the
pysptk.swipe equivalent), 'penn' (neural; the in-image-trained golf_tpu PitchNet,
periodicity-gated at 0.065 like the reference's penn path).
5 ms hop, floor/ceil flags.
"""
import argparse
import pathlib
import sys
from multiprocessing import Pool

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from golf_tpu.utils.wav import read_wav  # noqa: E402


def process(task):
    path, out_path, floor, ceil, method = task
    x, sr = read_wav(str(path))
    if x.ndim > 1:
        x = x.mean(-1)
    if method == "swipe":
        from golf_tpu.utils.swipe import swipe
        f0 = swipe(x.astype(np.float64), sr,
                   hopsize=int(sr * 5 / 1000), min=floor, max=ceil,
                   otype="f0")
    elif method == "penn":
        # neural pitch (reference: penn/FCNF0++ with pretrained weights;
        # here: the in-image-trained golf_tpu PitchNet — same hop,
        # same periodicity>0.065 unvoiced gating)
        from golf_tpu.utils.pitchnet import predict
        f0, _ = predict(x, sr, hop_ms=5.0)
        f0 = np.where((f0 >= floor) & (f0 <= ceil), f0, 0.0)
    else:
        from golf_tpu.utils import native
        # 'dio' = full multi-band algorithm; 'native' = fast C++ YIN
        f0, _ = native.dio(x.astype(np.float64), sr, f0_floor=floor,
                           f0_ceil=ceil, frame_period=5.0,
                           method="yin" if method == "native" else "dio")
    np.savetxt(out_path, f0, fmt="%.3f")
    return str(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav_dir")
    ap.add_argument("--suffix", default=".wav")
    ap.add_argument("--f0-floor", type=float, default=65.0)
    ap.add_argument("--f0-ceil", type=float, default=1047.0)
    ap.add_argument("--method", default="dio",
                    choices=["dio", "native", "swipe", "penn"])
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    wav_dir = pathlib.Path(args.wav_dir)
    tasks = []
    for f in sorted(wav_dir.glob("**/*" + args.suffix)):
        tasks.append((f, f.with_suffix(".pv"), args.f0_floor,
                      args.f0_ceil, args.method))
    with Pool(args.workers) as pool:
        for name in pool.imap_unordered(process, tasks):
            print(name)


if __name__ == "__main__":
    main()

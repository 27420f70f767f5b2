#!/usr/bin/env python
"""Parallel resample of a directory tree (reference scripts/resample_dir.py).

Polyphase resampling via scipy (the image has no libsoxr); writes a
mirrored tree at the target rate (default 24 kHz).
"""
import argparse
import pathlib
import sys
from math import gcd
from multiprocessing import Pool

import numpy as np
from scipy.signal import resample_poly

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from golf_tpu.utils.wav import read_wav, write_wav  # noqa: E402


def process(task):
    src, dst, target_sr = task
    x, sr = read_wav(str(src))
    if x.ndim > 1:
        x = x.mean(-1)
    if sr != target_sr:
        g = gcd(sr, target_sr)
        x = resample_poly(x, target_sr // g, sr // g)
    write_wav(str(dst), x.astype(np.float32), target_sr)
    return str(dst)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src_dir")
    ap.add_argument("dst_dir")
    ap.add_argument("--sr", type=int, default=24000)
    ap.add_argument("--suffix", default=".wav")
    ap.add_argument("--workers", type=int, default=4)
    args = ap.parse_args()

    src_dir = pathlib.Path(args.src_dir)
    dst_dir = pathlib.Path(args.dst_dir)
    tasks = []
    for f in sorted(src_dir.glob("**/*" + args.suffix)):
        rel = f.relative_to(src_dir)
        tasks.append((f, dst_dir / rel, args.sr))
    with Pool(args.workers) as pool:
        for name in pool.imap_unordered(process, tasks):
            print(name)


if __name__ == "__main__":
    main()

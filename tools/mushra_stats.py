#!/usr/bin/env python
"""MUSHRA listening-test analysis (reference ``notebooks/*/mushra.ipynb``).

Computes per-system mean opinion scores with bootstrap confidence
intervals and pairwise Wilcoxon signed-rank tests from a CSV of ratings
(columns: listener, system, item, score). Post-screening per the MUSHRA
spec: drop listeners who rate the hidden reference below a threshold on
more than a fraction of items.
"""

from __future__ import annotations

import argparse
import itertools

import numpy as np
import pandas as pd


def post_screen(df: pd.DataFrame, reference: str = "ref",
                threshold: float = 90.0, max_frac: float = 0.15
                ) -> pd.DataFrame:
    bad = []
    for listener, grp in df[df.system == reference].groupby("listener"):
        frac = (grp.score < threshold).mean()
        if frac > max_frac:
            bad.append(listener)
    return df[~df.listener.isin(bad)], bad


def bootstrap_ci(x: np.ndarray, n_boot: int = 10000, alpha: float = 0.05,
                 seed: int = 0):
    rng = np.random.default_rng(seed)
    means = rng.choice(x, size=(n_boot, len(x)), replace=True).mean(axis=1)
    return (np.quantile(means, alpha / 2),
            np.quantile(means, 1 - alpha / 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csv", help="columns: listener,system,item,score")
    ap.add_argument("--reference", default="ref")
    ap.add_argument("--screen-threshold", type=float, default=90.0)
    args = ap.parse_args()

    df = pd.read_csv(args.csv)
    df, dropped = post_screen(df, args.reference, args.screen_threshold)
    if dropped:
        print(f"post-screening dropped listeners: {dropped}")
    print(f"{df.listener.nunique()} valid listeners\n")

    print(f"{'system':<12} {'mean':>7} {'95% CI':>18}")
    for system, grp in df.groupby("system"):
        per_listener = grp.groupby("listener").score.mean().values
        lo, hi = bootstrap_ci(per_listener)
        print(f"{system:<12} {per_listener.mean():7.2f} "
              f"[{lo:7.2f}, {hi:7.2f}]")

    try:
        from scipy.stats import wilcoxon
        print("\npairwise Wilcoxon signed-rank p-values:")
        systems = sorted(df.system.unique())
        for a, b in itertools.combinations(systems, 2):
            pa = df[df.system == a].groupby("listener").score.mean()
            pb = df[df.system == b].groupby("listener").score.mean()
            common = pa.index.intersection(pb.index)
            if len(common) >= 5:
                stat = wilcoxon(pa[common], pb[common])
                print(f"  {a} vs {b}: p={stat.pvalue:.4f}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()

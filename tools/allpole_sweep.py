#!/usr/bin/env python
"""All-pole backend sweep: measure pallas vs blocked across (B, T, p)
shapes on the real chip and record the winner table that
``ops/allpole._use_pallas`` consults (round-1 VERDICT weak #7: the
dispatch heuristic was measured at one shape).

Writes golf_tpu/ops/allpole_dispatch.json:
  {"device": "...", "entries": [{"kernel": "tv"|"const",
    "b": B, "t": T, "p": p, "pallas_ms": x, "blocked_ms": y,
    "winner": "pallas"|"blocked"}, ...]}

Usage: python tools/allpole_sweep.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-bench")


_FETCH_FLOOR_S = None


def _fetch_floor(n: int = 9) -> float:
    """Median dispatch+fetch round-trip of a trivial cached executable,
    measured with the SAME protocol as ``timed`` (host fetch of the
    result). Subtracted from every measurement below."""
    global _FETCH_FLOOR_S
    if _FETCH_FLOOR_S is not None:
        return _FETCH_FLOOR_S
    import jax
    import jax.numpy as jnp
    tiny = jax.jit(lambda a: a * 1.0000001 + 1.0)
    float(tiny(jnp.float32(0.0)))
    ts = []
    for i in range(n):
        t0 = time.perf_counter()
        float(tiny(jnp.float32(i)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    _FETCH_FLOOR_S = ts[len(ts) // 2]
    return _FETCH_FLOOR_S


def timed(fn, *args, n=5, k_amort=None):
    """Median per-call time of ``fn(*leaf)``, relay-honest:

    * the K calls run inside ONE dispatched executable, as a ``lax.scan``
      over K DIFFERENT stacked inputs (a pure call on loop-invariant
      operands is hoisted out of the scan by XLA CSE and times nothing);
    * each timed repeat FETCHES the scalar results to the host — through
      the dev relay ``block_until_ready`` can acknowledge at enqueue, so
      only a host read of data that depends on the full computation
      bounds the device time from above (the first recorded table had
      0.11 ms entries for calls with 1.7 GB of HBM traffic — 15 TB/s on
      an ~0.8 TB/s part — because nothing was fetched);
    * a per-repeat jitter operand defeats any executable/result caching;
    * the trivial dispatch+fetch floor is subtracted.

    K adapts to the operand footprint (stacked inputs must fit HBM;
    large shapes don't need amortization anyway).
    """
    import jax
    import jax.numpy as jnp

    if k_amort is None:
        in_bytes = sum(int(np.prod(a.shape)) * 4 for a in args)
        k_amort = max(1, min(8, int(2e9 // max(in_bytes, 1))))

    stacked = jax.tree_util.tree_map(
        lambda a: jnp.stack([a * (1.0 + 0.01 * i) for i in range(k_amort)]),
        list(args))

    def k_fn(xs, jitter):
        def step(c, leaf):
            # full-sum consumption: forces every output element on both
            # backends (a partial slice would let XLA dead-code-eliminate
            # work from the non-opaque path) while keeping the per-
            # iteration carried output to a scalar
            return c, jnp.sum(fn(leaf[0] + jitter, *leaf[1:]))
        _, ys = jax.lax.scan(step, 0, xs)
        return ys

    jf = jax.jit(k_fn)
    np.asarray(jf(stacked, jnp.float32(0.0)))
    floor = _fetch_floor()
    ts = []
    for i in range(1, n + 1):
        t0 = time.perf_counter()
        np.asarray(jf(stacked, jnp.float32(i * 1e-7)))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    mid = ts[len(ts) // 2]
    return max(mid - floor, 1e-7) / k_amort


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--grid", choices=("quick", "mid", "full"),
                    default=None,
                    help="mid = all batches but order-22 only (order 10 "
                         "sampled at the serving shape) — half the "
                         "compile budget of full")
    ap.add_argument("--const-only", action="store_true",
                    help="re-measure only the const kernel grid; keep "
                         "the existing tv entries (round-5: the blocked "
                         "const kernel changed the non-pallas arm)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "golf_tpu", "ops", "allpole_dispatch.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    from golf_tpu.ops.allpole import _allpole_blocked, _choose_block
    from golf_tpu.ops.allpole_pallas import (
        allpole_pallas, allpole_const_pallas)

    rng = np.random.default_rng(0)
    dev = str(jax.devices()[0])
    entries = []
    if args.const_only:
        try:
            with open(os.path.abspath(args.out)) as f:
                entries = [e for e in json.load(f)["entries"]
                           if e["kernel"] == "tv"]
        except Exception:
            entries = []

    grid = args.grid or ("quick" if args.quick else "full")

    # time-varying kernel: serving/training shapes
    if grid == "quick":
        tv_grid = [(1, 144000, 22), (8, 144000, 22),
                   (32, 48000, 22), (64, 48000, 22)]
    elif grid == "mid":
        tv_grid = [(b, t, 22)
                   for b in (1, 4, 16, 32, 64, 128)
                   for t in (12000, 48000, 144000)] + [(1, 144000, 10)]
    else:
        tv_grid = [(b, t, p)
                   for b in (1, 4, 16, 32, 64, 128)
                   for t in (12000, 48000, 144000)
                   for p in (10, 22)]

    def flush_table():
        # write INCREMENTALLY: a crash on a late shape must not lose the
        # measured entries (the first mid-grid run died at B=128/T=144k
        # with the table only written at the end)
        out = os.path.abspath(args.out)
        with open(out, "w") as f:
            json.dump({"device": dev,
                       "fetch_floor_ms": round(_fetch_floor() * 1e3, 4),
                       "entries": entries}, f, indent=1)

    if args.const_only:
        tv_grid = []
    for b, t, p in tv_grid:
        if (b * t * (p + 2) * 4) * 2 > 3.0e9:
            print(f"# skip {(b, t, p)}: operand footprint over budget",
                  flush=True)
            continue
        try:
            x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
            a = jnp.asarray(
                (rng.standard_normal((b, t, p)) * 0.02).astype(np.float32))
            zi = jnp.zeros((b, p), jnp.float32)
            bs = _choose_block(t)
            f_blk = jax.jit(lambda x, a, zi: _allpole_blocked(x, a, zi, bs))
            f_pal = jax.jit(allpole_pallas)
            try:
                t_pal = timed(f_pal, x, a) * 1e3
            except Exception as e:
                print(f"# pallas failed at {(b, t, p)}: {e}",
                      file=sys.stderr)
                t_pal = float("inf")
            t_blk = timed(f_blk, x, a, zi) * 1e3
        except Exception as e:
            print(f"# shape {(b, t, p)} failed: {e}", file=sys.stderr)
            continue
        win = "pallas" if t_pal < t_blk else "blocked"
        entries.append({"kernel": "tv", "b": b, "t": t, "p": p,
                        "pallas_ms": round(t_pal, 4),
                        "blocked_ms": round(t_blk, 4), "winner": win})
        print(f"tv  B={b:4d} T={t:6d} p={p:2d}  pallas {t_pal:9.3f} ms  "
              f"blocked {t_blk:9.3f} ms  -> {win}", flush=True)
        flush_table()

    # constant-coefficient kernel: frame-path shapes (N = B*frames)
    if grid == "quick":
        const_grid = [(64, 960, 22), (1024, 960, 22)]
    elif grid == "mid":
        const_grid = [(n, w, 22)
                      for n in (64, 256, 1024, 4096)
                      for w in (240, 960)]
    else:
        const_grid = [(n, w, p)
                      for n in (64, 256, 1024, 4096)
                      for w in (240, 960)
                      for p in (10, 22)]
    # the two real frame-path shapes: B=1 serving (601 frames x 960) and
    # B=32 training (6432 x 960)
    const_grid += [(601, 960, 22), (6432, 960, 22)]

    from golf_tpu.ops.allpole import _allpole_const_blocked

    def const_scan(x, a):
        # the non-pallas arm is now the blocked const kernel (round-5)
        return _allpole_const_blocked(x, a, _choose_block(x.shape[1]))

    for n, w, p in const_grid:
        x = jnp.asarray(rng.standard_normal((n, w)).astype(np.float32))
        a = jnp.asarray(
            (rng.standard_normal((n, p)) * 0.02).astype(np.float32))
        try:
            t_pal = timed(jax.jit(allpole_const_pallas), x, a) * 1e3
        except Exception as e:
            print(f"# const pallas failed at {(n, w, p)}: {e}",
                  file=sys.stderr)
            t_pal = float("inf")
        t_blk = timed(jax.jit(const_scan), x, a) * 1e3
        win = "pallas" if t_pal < t_blk else "blocked"
        entries.append({"kernel": "const", "b": n, "t": w, "p": p,
                        "pallas_ms": round(t_pal, 4),
                        "blocked_ms": round(t_blk, 4), "winner": win})
        print(f"cst N={n:4d} W={w:6d} p={p:2d}  pallas {t_pal:9.3f} ms  "
              f"scan    {t_blk:9.3f} ms  -> {win}", flush=True)
        flush_table()

    flush_table()
    print(f"# fetch floor {_fetch_floor()*1e3:.3f} ms", flush=True)
    print(f"# wrote {os.path.abspath(args.out)} "
          f"({len(entries)} entries)", flush=True)


if __name__ == "__main__":
    main()

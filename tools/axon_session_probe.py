#!/usr/bin/env python
"""Probe the axon relay's per-dispatch floor across session ids.

The dev relay's dispatch floor is session-bimodal (docs/TPU_NOTES.md:
identical cached executables measure ~0.09 ms in one session and ~25 ms
in another). This tool registers under each candidate session id (one
re-exec per id), measures the floor with a trivial cached executable,
and reports per-session numbers so bench runs can pin the fast one.

Usage: python tools/axon_session_probe.py [id1 id2 ...]
Writes results to runs/axon_floor.json (appending one record per id).
"""
import json
import os
import subprocess
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root

CANDIDATES = ["golf-tpu-bench", "golf-tpu-bench-b", "golf-tpu-bench-c"]


def measure():
    from golf_tpu.utils.axon_boot import ensure_fixed_session
    sid = os.environ["_GOLF_PROBE_SID"]
    ensure_fixed_session(sid)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    import jax.numpy as jnp
    tiny = jax.jit(lambda a: a + 1.0)
    x = jnp.float32(1.0)
    jax.block_until_ready(tiny(x))
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(tiny(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    rec = {"session": sid, "floor_ms_median": round(med * 1e3, 3),
           "floor_ms_min": round(ts[0] * 1e3, 3),
           "floor_ms_p90": round(ts[int(len(ts) * 0.9)] * 1e3, 3),
           "device": str(jax.devices()[0]), "ts": time.time()}
    print(json.dumps(rec))
    os.makedirs("runs", exist_ok=True)
    with open("runs/axon_floor.json", "a") as f:
        f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    if os.environ.get("_GOLF_PROBE_SID"):
        measure()
        sys.exit(0)
    ids = sys.argv[1:] or CANDIDATES
    for sid in ids:
        env = dict(os.environ)
        env["_GOLF_PROBE_SID"] = sid
        subprocess.run([sys.executable, __file__], env=env, check=False,
                       timeout=1200)

#!/usr/bin/env python
"""allpole_pallas vs allpole_pallas_ring on-chip (VERDICT r3 #10: the
ring variant must win somewhere or be deleted). Relay-honest timing via
golf_tpu.utils.timing."""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from golf_tpu.utils.axon_boot import ensure_fixed_session  # noqa: E402

ensure_fixed_session("golf-tpu-bench")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    from golf_tpu.utils.axon_boot import ensure_fast_connection
    if jax.default_backend() not in ("cpu",):
        ensure_fast_connection()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from golf_tpu.ops.allpole_pallas import allpole_pallas, \
        allpole_pallas_ring
    from golf_tpu.utils.timing import amortized_ms, fetch_floor_ms

    rng = np.random.default_rng(0)
    res = {"floor_ms": round(fetch_floor_ms(), 4), "cases": []}
    for b, t, p in [(64, 48000, 22), (128, 48000, 22), (64, 12000, 10),
                    (128, 12000, 22)]:
        x = jnp.asarray(rng.standard_normal((b, t)).astype(np.float32))
        a = jnp.asarray(
            (rng.standard_normal((b, t, p)) * 0.02).astype(np.float32))
        k = max(1, min(8, int(2e9 // (x.nbytes + a.nbytes))))
        case = {"b": b, "t": t, "p": p}
        try:
            case["pallas_ms"] = round(amortized_ms(
                lambda x_, a_: allpole_pallas(x_, a_), x, a, k=k), 3)
        except Exception as e:
            case["pallas_ms"] = f"fail: {e}"
        try:
            case["ring_ms"] = round(amortized_ms(
                lambda x_, a_: allpole_pallas_ring(x_, a_), x, a, k=k), 3)
        except Exception as e:
            case["ring_ms"] = f"fail: {e}"
        res["cases"].append(case)
        print(case, flush=True)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""On-chip probe: XLA's native rfft at the reference MSS prime sizes
(509/1021/2053) vs the chirp-z realization with measured-fast conv sizes
(ops/stft.py::_rfft_bluestein). Decides the GOLF_TPU_BLUESTEIN default.
Relay-honest timing (golf_tpu.utils.timing)."""
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
    from golf_tpu.ops.stft import _rfft_bluestein
    from golf_tpu.utils.timing import amortized_ms, fetch_floor_ms

    rng = np.random.default_rng(0)
    res = {"floor_ms": round(fetch_floor_ms(), 4), "cases": []}
    # MSS loss shapes at the training recipe: B=32, 2 s @ 24 kHz,
    # 75% overlap -> rows = B * n_frames
    for n in (509, 1021, 2053):
        hop = n // 4
        rows = 32 * (48000 // hop + 1)
        x = jnp.asarray(
            rng.standard_normal((rows, n)).astype(np.float32))
        case = {"n_fft": n, "rows": rows}
        case["xla_ms"] = round(amortized_ms(
            lambda x_: jnp.abs(jnp.fft.rfft(x_)).sum(), x, k=4), 3)
        case["bluestein_ms"] = round(amortized_ms(
            lambda x_: jnp.abs(_rfft_bluestein(x_, n)).sum(), x, k=4), 3)
        res["cases"].append(case)
        print(case, flush=True)
    res["device"] = str(jax.devices()[0])
    print(json.dumps(res))


if __name__ == "__main__":
    main()

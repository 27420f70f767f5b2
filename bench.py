#!/usr/bin/env python
"""Headline benchmark: GOLF-ss sample-wise synthesis throughput.

Primary metric: steady-state serving throughput of the full GOLF-ss
synthesis chain (glottal wavetable source -> zero-phase FIR noise shaping
-> sample-wise order-22 LPC filter -> acoustic room filter) on one chip,
expressed as x-real-time per stream: K=8 independent 6 s clips are
synthesized per dispatch (a lax.scan pipeline), amortizing the dev-relay's
per-dispatch floor; each clip is computed sequentially (no batching).
Single-dispatch latency (the reference test_rtf protocol) is reported on
stderr. North-star target (BASELINE.json): >100x real-time per chip.

Fault tolerance: the TPU relay occasionally ABORTs mid-session (round 3's
driver capture died on the very first device fetch). Any backend fault
re-execs this process with a fresh registration (exponential backoff,
fresh session id after repeated faults), switching to a reduced protocol
(no floor probe, fewer repeats) after FULL_TRIES failures. The script
ALWAYS prints one JSON line and exits 0 — a dead environment yields
value 0.0 with an "error" field rather than a crash.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

FULL_TRIES = 3      # full-protocol attempts before degrading
MAX_TRIES = 7       # total attempts before giving up (still rc=0)

_TRY = int(os.environ.get("_GOLF_BENCH_TRY", "0"))
_REDUCED = _TRY >= FULL_TRIES
# Keep the cache-keyed session id while the session may just be flaky;
# switch to a fresh id (forfeiting the persistent compile cache) once the
# session itself looks poisoned.
_SESSION = ("golf-tpu-bench" if _TRY < FULL_TRIES
            else f"golf-tpu-bench-r{_TRY}")

from golf_tpu.utils.axon_boot import ensure_fixed_session  # noqa: E402

ensure_fixed_session(_SESSION)

_FAULT_MARKS = ("ABORTED", "UNAVAILABLE", "INTERNAL", "DEADLINE",
                "DATA_LOSS", "TPU backend", "Socket closed", "RPC",
                "FAILED_PRECONDITION", "connection", "Connection",
                "watchdog")


def _is_backend_fault(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(m in s for m in _FAULT_MARKS)


def _arm_watchdog(seconds: int) -> None:
    """The relay can HANG a dispatch indefinitely (compute service down
    while the metadata service still answers — observed 2026-08-20, and
    the round-3 driver capture died on the same fault class). A hung
    bench is as empty a record as a crashed one, so every attempt is
    bounded: on expiry the alarm raises, the fault handler re-execs with
    a fresh registration, and the final fallback still prints JSON."""
    import signal

    def on_alarm(signum, frame):
        raise TimeoutError(
            f"watchdog: no progress within {seconds}s (hung relay?)")

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def _retry_exec(reason: str) -> None:
    """Re-exec this process with a fresh axon registration."""
    nxt = _TRY + 1
    back = min(2.0 ** nxt, 30.0)
    print(f"[bench] backend fault (attempt {_TRY}): {reason!r} — "
          f"re-exec in {back:.0f}s ({nxt}/{MAX_TRIES})", file=sys.stderr)
    time.sleep(back)
    env = dict(os.environ)
    env["_GOLF_BENCH_TRY"] = str(nxt)
    env.pop("_GOLF_CONN_TRY", None)  # let the floor probe re-run
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _give_up(reason: str) -> None:
    print(json.dumps({
        "metric": "golf_ss_synthesis_xrt",
        "value": 0.0,
        "unit": "x_realtime",
        "vs_baseline": 0.0,
        "error": f"TPU backend unrecoverable after {MAX_TRIES} attempts: "
                 f"{reason[:300]}",
    }))
    sys.exit(0)


def main():
    # generous first-attempt budget (cold remote compiles take minutes);
    # tighter once we're retrying a flaky backend
    _arm_watchdog(900 if _TRY == 0 else 600)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from golf_tpu.utils.axon_boot import ensure_fast_connection
    if jax.default_backend() not in ("cpu",):
        ensure_fast_connection()
    import jax.numpy as jnp
    from golf_tpu.core.sig import Sig
    from golf_tpu.config.registry import instantiate, load_config
    from golf_tpu.utils.timing import dispatch_floor, timed_fetch

    sr = 24000
    seconds = 6.0
    t = int(sr * seconds)
    n_runs = 3 if _REDUCED else 7
    k_clips = 8
    hop = 240
    frames = t // hop + 1
    b = 1

    decoder_cfg = load_config("cfg/ae/decoder/golf-precise.yaml")["decoder"]
    decoder = instantiate(decoder_cfg)

    def mkraw(seed):
        r = np.random.default_rng(seed)
        return {
            "harm_oscillator_params": (
                Sig(jnp.asarray(r.standard_normal(
                    (b, frames, 64)).astype(np.float32) * 0.1), hop),),
            "noise_generator_params": (),
            "noise_filter_params": (
                Sig(jnp.asarray(r.standard_normal(
                    (b, frames, 256)).astype(np.float32) * 0.1 - 3.0),
                    hop),),
            "end_filter_params": (
                Sig(jnp.asarray(r.standard_normal(
                    (b, frames)).astype(np.float32) * 0.1), hop),
                Sig(jnp.asarray(r.standard_normal(
                    (b, frames, 22)).astype(np.float32) * 0.3), hop)),
            "room_filter_params": (),
        }

    raw1 = mkraw(0)
    raws = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[mkraw(i) for i in range(k_clips)])
    phase = Sig(jnp.full((b, t), 180.0 / sr), 1)

    def body(mdl, phase, raw):
        return mdl(phase, **mdl.apply_ctrl(raw))

    var_shapes = jax.eval_shape(
        lambda ph, rw: decoder.init(
            {"params": jax.random.key(0), "noise": jax.random.key(1)},
            ph, rw, method=body), phase, raw1)
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), var_shapes)

    # ``variables`` is an explicit argument (NOT a closure): closed-over
    # arrays become embedded constants under jit, and a constant glottal
    # wavetable triggers a pathological XLA lowering of the bilinear
    # lookup (~47 ms vs ~0.1 ms; see models/synth.py GlottalFlowTable).
    #
    # Timing is RELAY-HONEST (golf_tpu/utils/timing.py): every timed
    # repeat FETCHES a scalar that data-depends on the full computation,
    # jittered per repeat against caching.
    def synth_one(vs, ph, raw, jitter):
        y = decoder.apply(vs, Sig(ph.data + jitter, ph.hop), raw,
                          rngs={"noise": jax.random.key(2)},
                          method=body).data
        return jnp.sum(y, dtype=jnp.float32)

    def synth_k(vs, ph, raws, jitter):
        def step(carry, raw):
            return carry, synth_one(vs, ph, raw, jitter)
        _, ys = jax.lax.scan(step, 0, raws)
        return ys

    jit_one = jax.jit(synth_one)
    jit_k = jax.jit(synth_k)

    # relay dispatch+fetch floor: a trivial cached executable, same fetch
    # protocol. The dev relay's floor is connection-bimodal
    # (docs/TPU_NOTES.md) — subtract it where amortization can't.
    t_floor = 0.0 if _REDUCED else dispatch_floor(n=9)

    m_chain = 2 if _REDUCED else 4
    t_k = max(timed_fetch(jit_k, variables, phase, raws,
                          n=n_runs, m_chain=m_chain)
              - t_floor, 1e-7) / (m_chain * k_clips)
    if _REDUCED:
        t_one = t_device = float("nan")
    else:
        t_one = timed_fetch(jit_one, variables, phase, raw1, n=n_runs)
        t_device = max(t_one - t_floor, 1e-6)

    import signal
    signal.alarm(0)  # measurements done; never interrupt the JSON print

    xrt = seconds / t_k
    rec = {
        "metric": "golf_ss_synthesis_xrt",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 100.0, 3),
    }
    if _REDUCED:
        rec["protocol"] = f"reduced(attempt={_TRY})"
    print(json.dumps(rec))
    print(f"# device={jax.devices()[0]}; steady-state {t_k*1000:.3f} ms "
          f"per 6 s clip ({t/t_k/1e6:.2f} Msamples/s), fetch-forced over "
          f"{m_chain * k_clips} clips; single-dispatch latency "
          f"{t_one*1000:.2f} ms ({seconds/t_one:.1f}x RT) "
          f"[relay dispatch+fetch floor {t_floor*1000:.2f} ms -> "
          f"floor-corrected {t_device*1000:.3f} ms = "
          f"{seconds/t_device:.0f}x RT]",
          file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — never crash the capture
        if not _is_backend_fault(e):
            raise
        if _TRY + 1 >= MAX_TRIES:
            _give_up(f"{type(e).__name__}: {e}")
        _retry_exec(f"{type(e).__name__}: {str(e)[:200]}")

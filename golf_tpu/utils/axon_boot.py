"""Deterministic remote-TPU registration for benchmarking/serving.

The environment's sitecustomize registers the axon PJRT backend with a
random per-process session UUID; that UUID lands in the client options and
therefore in the XLA persistent-cache key, so identical graphs recompile in
every process (compiles through the remote relay cost minutes). For
benchmark/serving entry points we re-exec once with the auto-registration
disabled and register manually with a fixed session id — making the
persistent compilation cache actually persistent.

Call ``ensure_fixed_session("name")`` at the very top of a script, before
importing jax-heavy modules.
"""

from __future__ import annotations

import os
import sys


def ensure_fixed_session(session_id: str = "golf-tpu-bench") -> None:
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return
    if os.environ.get("_GOLF_AXON_CHILD") == "1":
        _manual_register(session_id)
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no axon environment; nothing to do
    env = dict(os.environ)
    env["_GOLF_AXON_CHILD"] = "1"
    env["_GOLF_AXON_POOL_IPS"] = env["PALLAS_AXON_POOL_IPS"]
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips registration
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def _manual_register(session_id: str) -> None:
    os.environ["PALLAS_AXON_POOL_IPS"] = os.environ.get(
        "_GOLF_AXON_POOL_IPS", "127.0.0.1")
    os.environ["AXON_POOL_SVC_OVERRIDE"] = "127.0.0.1"
    os.environ["AXON_LOOPBACK_RELAY"] = "1"
    os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    rc = os.environ.get("PALLAS_AXON_REMOTE_COMPILE", "1") == "1"
    try:
        from axon.register import register
        register(None, f"{gen}:1x1x1", so_path="/opt/axon/libaxon_pjrt.so",
                 session_id=session_id, remote_compile=rc)
    except Exception as e:  # pragma: no cover - environment-specific
        print(f"[axon_boot] manual register failed: {e}", file=sys.stderr)

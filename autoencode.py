#!/usr/bin/env python
"""CLI entry for VoiceAutoEncoder experiments (reference autoencode.py).

Usage:
    python autoencode.py fit --config cfg/ae/vctk.yaml \
        --model cfg/ae/decoder/golf.yaml
"""
import sys

from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-train")

from golf_tpu.tasks.cli import run

if __name__ == "__main__":
    sys.exit(run(sys.argv[1:]))

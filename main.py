#!/usr/bin/env python
"""CLI entry for DDSPVocoder (mel-vocoder) experiments (reference main.py).

Usage:
    python main.py fit --config cfg/vocoder.yaml \
        --model cfg/ae/decoder/ddsp.yaml
"""
import sys

from golf_tpu.utils.axon_boot import ensure_fixed_session

ensure_fixed_session("golf-tpu-train")

from golf_tpu.tasks.cli import run

if __name__ == "__main__":
    sys.exit(run(sys.argv[1:], default_config="cfg/vocoder.yaml"))

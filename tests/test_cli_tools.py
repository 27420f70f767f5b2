"""End-to-end smoke of the offline tooling CLIs on generated data."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

from golf_tpu.utils.wav import read_wav, write_wav

REPO = pathlib.Path(__file__).resolve().parent.parent


def _make_wavs(root: pathlib.Path, n=2, sr=24000, seconds=1.0):
    rng = np.random.default_rng(0)
    t = np.arange(int(sr * seconds)) / sr
    for spk in ("p1", "p2")[:n]:
        d = root / spk
        d.mkdir(parents=True, exist_ok=True)
        for i in range(2):
            f0 = 150 + 50 * i
            x = np.sin(2 * np.pi * f0 * t) * 0.3
            x += rng.standard_normal(len(t)) * 0.01
            write_wav(str(d / f"utt{i}.wav"), x.astype(np.float32), sr)


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 24000)).astype(np.float32) * 0.5
    write_wav(str(tmp_path / "a.wav"), x, 24000)
    y, sr = read_wav(str(tmp_path / "a.wav"))
    assert sr == 24000
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_wav2f0_script(tmp_path):
    _make_wavs(tmp_path / "wavs", n=1)
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "wav2f0.py"),
         str(tmp_path / "wavs"), "--workers", "1"],
        capture_output=True, text=True, env=_env(), timeout=180)
    assert out.returncode == 0, out.stderr
    pvs = list((tmp_path / "wavs").glob("**/*.pv"))
    assert len(pvs) == 2
    f0 = np.loadtxt(pvs[0])
    voiced = f0[(f0 > 0)]
    assert len(voiced) > 10
    assert abs(np.median(voiced) - 150) < 10 or \
        abs(np.median(voiced) - 200) < 10


def test_resample_dir_script(tmp_path):
    _make_wavs(tmp_path / "src", n=1)
    out = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "resample_dir.py"),
         str(tmp_path / "src"), str(tmp_path / "dst"), "--sr", "16000",
         "--workers", "1"],
        capture_output=True, text=True, env=_env(), timeout=120)
    assert out.returncode == 0, out.stderr
    y, sr = read_wav(str(next((tmp_path / "dst").glob("**/*.wav"))))
    assert sr == 16000
    assert len(y) == 16000


def test_eval_pesq_cli(tmp_path):
    _make_wavs(tmp_path / "ref")
    _make_wavs(tmp_path / "deg")
    out = subprocess.run(
        [sys.executable, str(REPO / "eval_pesq.py"), str(tmp_path / "ref"),
         str(tmp_path / "deg"), "--workers", "1"],
        capture_output=True, text=True, env=_env(), timeout=120)
    assert out.returncode == 0, out.stderr
    assert "PESQ" in out.stdout


def test_fad_cli(tmp_path):
    _make_wavs(tmp_path / "ref")
    _make_wavs(tmp_path / "eval")
    out = subprocess.run(
        [sys.executable, str(REPO / "fad.py"), str(tmp_path / "ref"),
         str(tmp_path / "eval"), "--csv", str(tmp_path / "fad.csv")],
        capture_output=True, text=True, env=_env(), timeout=300)
    assert out.returncode == 0, out.stderr
    assert "mean" in out.stdout
    assert (tmp_path / "fad.csv").exists()


def test_mushra_stats(tmp_path):
    import csv
    rng = np.random.default_rng(0)
    rows = [("listener", "system", "item", "score")]
    for l in range(6):
        for s, base in [("ref", 95), ("golf", 60), ("anchor", 10)]:
            for i in range(4):
                rows.append((f"l{l}", s, f"i{i}",
                             np.clip(base + rng.normal(0, 5), 0, 100)))
    p = tmp_path / "mushra.csv"
    with open(p, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    out = subprocess.run(
        [sys.executable, str(REPO / "tools" / "mushra_stats.py"), str(p)],
        capture_output=True, text=True, env=_env(), timeout=120)
    assert out.returncode == 0, out.stderr
    assert "golf" in out.stdout and "95% CI" in out.stdout


def test_convert_ckpt_tool(tmp_path):
    import jax.numpy as jnp
    sys.path.insert(0, str(REPO / "tools"))
    from convert_ckpt import permute_out_linear
    kernel = np.arange(2 * 10, dtype=np.float32).reshape(2, 10)
    tree = {"encoder": {"out_linear": {"kernel": kernel,
                                       "bias": np.arange(10.0)}}}
    # head=2 extra channels, then blocks of sizes [3, 5] swapped
    out = permute_out_linear(tree, [3, 5], [1, 0])
    k2 = out["encoder"]["out_linear"]["kernel"]
    np.testing.assert_array_equal(
        k2[0], [0, 1, 5, 6, 7, 8, 9, 2, 3, 4])

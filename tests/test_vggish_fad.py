"""VGGish embedder (flax) + Fréchet distance math (VERDICT r3 #9).

The reference scores FAD with VGGish/DAC embeddings via fadtk
(reference ``fad.py:30-69``, ``ltng/lpcnet.py:274-283``). Weights cannot
enter this image, so the tests pin everything EXCEPT the weight values:
the architecture (torch-vs-flax parity on a random state dict), the
state-dict converter, the preprocessing shapes, and the Fréchet formula
against closed forms.
"""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_frechet_distance_closed_forms():
    sys.path.insert(0, str(REPO))
    from fad import frechet_distance, stats

    rng = np.random.default_rng(0)
    d = 6
    # identical distributions -> 0
    mu = rng.standard_normal(d)
    a = rng.standard_normal((d, d))
    s = a @ a.T + np.eye(d)
    assert frechet_distance(mu, s, mu, s) == pytest.approx(0.0, abs=1e-8)

    # diagonal covariances: closed form
    # |mu1-mu2|^2 + sum(s1 + s2 - 2 sqrt(s1 s2))
    mu1, mu2 = rng.standard_normal(d), rng.standard_normal(d)
    d1, d2 = rng.uniform(0.5, 2.0, d), rng.uniform(0.5, 2.0, d)
    want = (np.sum((mu1 - mu2) ** 2)
            + np.sum(d1 + d2 - 2 * np.sqrt(d1 * d2)))
    got = frechet_distance(mu1, np.diag(d1), mu2, np.diag(d2))
    assert got == pytest.approx(want, rel=1e-9)

    # fadtk/frechet_audio_distance formula on full PSD matrices:
    # diff.diff + tr(s1) + tr(s2) - 2 tr((s1 s2)^(1/2))
    b = rng.standard_normal((d, d))
    s2 = b @ b.T + np.eye(d)
    from scipy import linalg
    covmean = linalg.sqrtm(s @ s2)
    want = (np.sum((mu1 - mu2) ** 2) + np.trace(s) + np.trace(s2)
            - 2 * np.trace(covmean.real))
    got = frechet_distance(mu1, s, mu2, s2)
    assert got == pytest.approx(want, rel=1e-9)

    # sample statistics: mu/Sigma from embeddings (rowvar=False, ddof=1)
    e = rng.standard_normal((50, d))
    mu_s, s_s = stats(e)
    np.testing.assert_allclose(mu_s, e.mean(0))
    np.testing.assert_allclose(s_s, np.cov(e, rowvar=False))


def test_vggish_flax_matches_torch_architecture():
    """The flax VGGish + state-dict converter reproduce the torchvggish
    forward exactly (random weights in the torchvggish layout)."""
    import torch
    import torch.nn as tnn

    from golf_tpu.models.vggish import (VGGish, VGGishEmbedder,
                                        params_from_torch_state_dict)

    class TorchVGGish(tnn.Module):
        # torchvggish layout: conv indices 0,3,6,8,11,13; fc 0,2,4
        def __init__(self):
            super().__init__()

            def block(cin, cout):
                return [tnn.Conv2d(cin, cout, 3, padding=1),
                        tnn.ReLU(True)]
            self.features = tnn.Sequential(
                *block(1, 64), tnn.MaxPool2d(2, 2),
                *block(64, 128), tnn.MaxPool2d(2, 2),
                *block(128, 256), *block(256, 256), tnn.MaxPool2d(2, 2),
                *block(256, 512), *block(512, 512), tnn.MaxPool2d(2, 2))
            self.embeddings = tnn.Sequential(
                tnn.Linear(512 * 4 * 6, 4096), tnn.ReLU(True),
                tnn.Linear(4096, 4096), tnn.ReLU(True),
                tnn.Linear(4096, 128), tnn.ReLU(True))

        def forward(self, x):
            x = self.features(x)
            x = x.permute(0, 3, 2, 1).contiguous()
            return self.embeddings(x.view(x.shape[0], -1))

    torch.manual_seed(0)
    tm = TorchVGGish().eval()
    rng = np.random.default_rng(1)
    patches = rng.standard_normal((3, 96, 64)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(patches)[:, None]).numpy()

    variables = params_from_torch_state_dict(tm.state_dict())
    model = VGGish()
    got = np.asarray(model.apply(variables, patches[..., None]))
    assert got.shape == ref.shape == (3, 128)
    np.testing.assert_allclose(got, ref, atol=2e-4)

    # embedder interface end-to-end (resample 24k->16k + patching)
    emb = VGGishEmbedder(variables)
    wav = rng.standard_normal(24000 * 2).astype(np.float32) * 0.1
    e = emb.embed(wav, 24000)
    assert e.shape[1] == 128 and e.shape[0] >= 2
    assert np.all(np.isfinite(e))


def test_log_mel_patches_shapes():
    from golf_tpu.models.vggish import log_mel_patches

    rng = np.random.default_rng(2)
    # short input: padded to one full patch
    p = log_mel_patches(rng.standard_normal(4000), 16000)
    assert p.shape == (1, 96, 64)
    # 2 s at 16 kHz: (2*16000 - 400) // 160 + 1 = 198 frames -> 2 patches
    p = log_mel_patches(rng.standard_normal(32000), 16000)
    assert p.shape == (2, 96, 64)


def test_fad_cli_vggish_random_smoke(tmp_path):
    """fad.py --embedder vggish --weights random runs end-to-end and
    labels the output non-comparable."""
    from golf_tpu.utils.wav import write_wav

    rng = np.random.default_rng(3)
    for role in ("ref", "eval"):
        d = tmp_path / role / "spk0"
        d.mkdir(parents=True)
        for i in range(3):
            write_wav(str(d / f"u{i}.wav"),
                      rng.standard_normal(24000 * 2).astype(
                          np.float32) * 0.1, 24000)
    r = subprocess.run(
        [sys.executable, str(REPO / "fad.py"), str(tmp_path / "ref"),
         str(tmp_path / "eval"), "--embedder", "vggish",
         "--weights", "random"],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert "RANDOM-INIT" in r.stdout
    assert "mean" in r.stdout

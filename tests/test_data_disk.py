"""File-based data layer exercised on miniature on-disk corpora
(VERDICT r3 #6). Mirrors reference semantics:

- cumulative-boundaries + digitize segment indexing
  (reference ``ltng/data.py:186-209``),
- speaker-/file-prefix train/valid/test splits (``:212-247``),
- sample-level f0 interpolation with unvoiced masking (``:196-203``),
- full-utterance inference datasets (``:250-293``).

Each test writes a tiny wav + ``.pv`` tree into tmp_path and checks
split membership, segment counts, segment content, and f0 semantics.
"""

import numpy as np
import pytest

from golf_tpu.tasks.data import (VCTK, InferenceDataset, LJSpeechDataset,
                                 M4SingerDataset, MIR1KDataset,
                                 MPop600Dataset, VCTKDataset)
from golf_tpu.utils.wav import write_wav

SR = 8000
F0_HOP = 0.005 * SR  # 5 ms .pv frame hop


def _tone(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _write_utt(path, n_samples, seed, f0_track=None):
    """Write a wav of n_samples and a matching .pv (5 ms hop)."""
    x = _tone(n_samples, seed)
    write_wav(str(path), x, SR)
    n_frames = int(n_samples / F0_HOP) + 1
    if f0_track is None:
        f0_track = np.full(n_frames, 200.0)
    np.savetxt(str(path.with_suffix(".pv")), f0_track)
    return x


def _expected_segments(n_samples, duration, overlap):
    seg = int(duration * SR)
    hop = int((duration - overlap) * SR)
    return max(0, n_samples - seg) // hop + 1


def test_vctk_disk_tree_splits_and_segments(tmp_path):
    # p225 -> valid, p360 -> test, p300 -> train (speaker-prefix splits)
    lengths = {}
    for spk, n1, n2 in (("p225", 9000, 5000), ("p360", 7000, 4500),
                        ("p300", 10000, 6000)):
        d = tmp_path / spk
        d.mkdir()
        _write_utt(d / f"{spk}_001_mic1.wav", n1, seed=hash(spk) % 100)
        _write_utt(d / f"{spk}_002_mic1.wav", n2, seed=hash(spk) % 100 + 1)
        # a non-matching suffix file must be ignored (file_suffix=mic1.wav)
        write_wav(str(d / f"{spk}_001_mic2.wav"), _tone(3000, 7), SR)
        lengths[spk] = (n1, n2)

    duration, overlap = 0.5, 0.25
    for split, spk in (("train", "p300"), ("valid", "p225"),
                       ("test", "p360")):
        ds = VCTKDataset(str(tmp_path), split, duration, overlap)
        assert [f.parent.name for f in ds.files] == [spk, spk]
        want = sum(_expected_segments(n, duration, overlap)
                   for n in lengths[spk])
        assert len(ds) == want
        # boundaries are the cumulative per-file segment counts
        np.testing.assert_array_equal(
            ds.boundaries,
            np.cumsum([0] + [_expected_segments(n, duration, overlap)
                             for n in lengths[spk]]))


def test_segment_indexing_across_file_boundary(tmp_path):
    d = tmp_path / "p300"
    d.mkdir()
    n1, n2 = 9000, 6200
    x1 = _write_utt(d / "p300_001_mic1.wav", n1, seed=0)
    x2 = _write_utt(d / "p300_002_mic1.wav", n2, seed=1)
    duration, overlap = 0.5, 0.25
    seg = int(duration * SR)
    hop = int((duration - overlap) * SR)
    ds = VCTKDataset(str(tmp_path), "train", duration, overlap)
    c1 = _expected_segments(n1, duration, overlap)

    # last segment of file 1: offset (c1-1)*hop, zero-padded to seg
    x, f0 = ds[c1 - 1]
    ref = x1[(c1 - 1) * hop:(c1 - 1) * hop + seg]
    ref = np.pad(ref, (0, seg - len(ref)))
    np.testing.assert_allclose(x, ref, atol=2 / 32768)
    assert x.shape == f0.shape == (seg,)

    # first segment of file 2 (digitize rolls into the next file)
    x, _ = ds[c1]
    np.testing.assert_allclose(x, x2[:seg], atol=2 / 32768)


def test_f0_interpolation_and_unvoiced_masking(tmp_path):
    d = tmp_path / "p300"
    d.mkdir()
    n = 8000
    n_frames = int(n / F0_HOP) + 1
    f0_track = np.full(n_frames, 220.0)
    f0_track[4:8] = 0.0      # an unvoiced hole
    f0_track[10] = 30.0      # below f0_floor=60 -> treated as unvoiced
    _write_utt(d / "p300_001_mic1.wav", n, seed=0, f0_track=f0_track)
    ds = VCTKDataset(str(tmp_path), "train", duration=0.5, overlap=0.25)
    _, f0 = ds[0]

    hop = int(F0_HOP)
    # voiced region: exact frame values at frame centres
    assert f0[0] == pytest.approx(220.0)
    assert f0[2 * hop] == pytest.approx(220.0)
    # every sample whose interpolated unvoiced indicator > 0 is masked:
    # frames 4..7 are a hole, and the mask bleeds into the neighbouring
    # interpolation intervals (3,4) and (7,8) — i.e. samples in (3h, 8h)
    assert np.all(f0[3 * hop + 1:8 * hop] == 0.0)
    assert f0[8 * hop] == pytest.approx(220.0)
    # sub-floor frame masked likewise
    assert np.all(f0[9 * hop + 1:11 * hop] == 0.0)
    # between two voiced frames: linear interpolation, no masking
    assert np.all(f0[:3 * hop] == pytest.approx(220.0))


def test_m4singer_folder_prefix_splits(tmp_path):
    # folder names carry a "#song" suffix; the prefix decides the split
    for folder, split in (("Alto-1#song1", "test"), ("Alto-2#song2",
                          "valid"), ("Bass-2#song3", "train")):
        d = tmp_path / folder
        d.mkdir()
        _write_utt(d / "0001.wav", 6000, seed=hash(folder) % 50)
    for split, folder in (("test", "Alto-1#song1"),
                          ("valid", "Alto-2#song2"),
                          ("train", "Bass-2#song3")):
        ds = M4SingerDataset(str(tmp_path), split, 0.5, 0.25)
        assert [f.parent.name for f in ds.files] == [folder]
        assert len(ds) == _expected_segments(6000, 0.5, 0.25)


def test_mpop600_postfix_splits_and_floor(tmp_path):
    # flat tree: <singer>_<postfix>.wav; postfix decides the split
    _write_utt(tmp_path / "f1_001.wav", 6000, seed=0)   # test
    _write_utt(tmp_path / "f1_004.wav", 6000, seed=1)   # valid
    _write_utt(tmp_path / "f1_100.wav", 9000, seed=2)   # train
    _write_utt(tmp_path / "m2_101.wav", 6000, seed=3)   # train
    tr = MPop600Dataset(str(tmp_path), "train", 0.5, 0.25)
    assert sorted(f.name for f in tr.files) == ["f1_100.wav", "m2_101.wav"]
    assert len(tr) == (_expected_segments(9000, 0.5, 0.25)
                       + _expected_segments(6000, 0.5, 0.25))
    assert [f.name for f in MPop600Dataset(
        str(tmp_path), "test", 0.5, 0.25).files] == ["f1_001.wav"]
    assert [f.name for f in MPop600Dataset(
        str(tmp_path), "valid", 0.5, 0.25).files] == ["f1_004.wav"]
    # f0_floor is 80 for MPop600: a 70 Hz frame is masked
    n = 6000
    trk = np.full(int(n / F0_HOP) + 1, 70.0)
    _write_utt(tmp_path / "f1_102.wav", n, seed=4, f0_track=trk)
    tr2 = MPop600Dataset(str(tmp_path), "train", 0.5, 0.25)
    idx = [i for i, f in enumerate(tr2.files) if f.name == "f1_102.wav"][0]
    _, f0 = tr2[int(tr2.boundaries[idx])]
    assert np.all(f0 == 0.0)


def test_ljspeech_name_splits(tmp_path):
    _write_utt(tmp_path / "LJ001-0001.wav", 6000, seed=0)   # test
    _write_utt(tmp_path / "LJ001-0050.wav", 6000, seed=1)   # valid
    _write_utt(tmp_path / "LJ002-0001.wav", 7000, seed=2)   # train
    assert [f.name for f in LJSpeechDataset(
        str(tmp_path), "test", 0.5, 0.25).files] == ["LJ001-0001.wav"]
    assert [f.name for f in LJSpeechDataset(
        str(tmp_path), "valid", 0.5, 0.25).files] == ["LJ001-0050.wav"]
    tr = LJSpeechDataset(str(tmp_path), "train", 0.5, 0.25)
    assert [f.name for f in tr.files] == ["LJ002-0001.wav"]
    assert len(tr) == _expected_segments(7000, 0.5, 0.25)


def test_mir1k_vocal_channel_and_missing_pv(tmp_path):
    n = 5000
    rng = np.random.default_rng(0)
    music = (rng.standard_normal(n) * 0.1).astype(np.float32)
    vocal = (rng.standard_normal(n) * 0.1).astype(np.float32)
    write_wav(str(tmp_path / "abc_1_01.wav"), np.stack([music, vocal], -1),
              SR)  # stereo: ch0 accompaniment, ch1 vocal
    np.savetxt(str(tmp_path / "abc_1_01.pv"),
               np.full(int(n / F0_HOP) + 1, 180.0))
    write_wav(str(tmp_path / "abc_1_02.wav"),
              np.stack([music, vocal], -1), SR)  # no .pv -> all-zero f0

    ds = MIR1KDataset(str(tmp_path), segment=2000, overlap=500)
    assert len(ds.files) == 2
    seg_per_file = (n - 2000) // 1500 + 1
    assert len(ds) == 2 * seg_per_file
    x, f0 = ds[0]
    np.testing.assert_allclose(x, vocal[:2000], atol=2 / 32768)
    assert np.all(f0 > 0)
    x2, f02 = ds[seg_per_file]  # first segment of the pv-less file
    np.testing.assert_allclose(x2, vocal[:2000], atol=2 / 32768)
    assert np.all(f02 == 0.0)


def test_inference_dataset_full_utterance(tmp_path):
    d = tmp_path / "p360"
    d.mkdir()
    n = 7000
    x_ref = _write_utt(d / "p360_001_mic1.wav", n, seed=0)
    ds = InferenceDataset(str(tmp_path), "test", dataset_cls=VCTKDataset)
    assert len(ds) == 1
    y, f0, rel = ds[0]
    assert y.shape == (n,) and f0.shape == (n,)
    np.testing.assert_allclose(y, x_ref, atol=2 / 32768)
    assert rel == "p360/p360_001_mic1.wav"
    assert np.all(f0 > 0)


def test_vctk_datamodule_loaders(tmp_path):
    for spk, ns in (("p300", (9000, 6000)), ("p225", (9000,)),
                    ("p360", (7000,))):
        d = tmp_path / spk
        d.mkdir()
        for i, n in enumerate(ns):
            _write_utt(d / f"{spk}_{i:03d}_mic1.wav", n,
                       seed=hash((spk, i)) % 97)
    dm = VCTK(batch_size=2, wav_dir=str(tmp_path), duration=0.5,
              overlap=0.25)
    dm.setup("fit")
    dm.setup("test")
    dm.setup("predict")
    assert dm.sample_rate == SR
    n_train = len(dm.train_dataset)
    tl = dm.train_dataloader()
    assert len(tl) == n_train // 2  # drop_last
    batches = list(tl)
    assert len(batches) == len(tl)
    x, f0 = batches[0]
    assert x.shape == f0.shape == (2, int(0.5 * SR))
    assert x.dtype == f0.dtype == np.float32
    # predict loader yields full utterances with rel paths
    (y,), (f0_full,), (rel,) = next(iter(dm.predict_dataloader()))
    assert y.shape == f0_full.shape == (7000,)
    assert rel.endswith("mic1.wav")

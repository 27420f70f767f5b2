"""Datasets and data modules (reference ``ltng/data.py``).

Host-side numpy pipeline: load all wavs + ``.pv`` f0 tracks into RAM,
window into (duration, overlap) segments via cumulative boundaries +
digitize indexing, sample-level f0 interpolation with unvoiced masking
(f0 < 60 -> 0), speaker-prefix train/valid/test splits.

Batches are numpy; the training loop moves them to device as sharded
arrays (batch axis over the mesh's data axis).
"""

from __future__ import annotations

import pathlib
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..utils.wav import read_wav


class SegmentDataset:
    """Base in-memory segment dataset (reference ``M4SingerDataset``,
    ``ltng/data.py:126-209``)."""

    test_folder_prefixes: set = set()
    valid_folder_prefixes: set = set()
    file_suffix: str = ".wav"
    f0_floor: float = 60.0

    def __init__(self, wav_dir: str, split: str = "train",
                 duration: float = 2.0, overlap: float = 1.0,
                 f0_suffix: str = ".pv"):
        wav_dir = pathlib.Path(wav_dir)
        buckets = {"train": [], "valid": [], "test": []}
        for f in sorted(wav_dir.glob("**/*" + self.file_suffix)):
            prefix = f.parent.name.split("#")[0]
            if prefix in self.test_folder_prefixes:
                buckets["test"].append(f)
            elif prefix in self.valid_folder_prefixes:
                buckets["valid"].append(f)
            else:
                buckets["train"].append(f)
        if split not in buckets:
            raise ValueError(f"Unknown split: {split}")
        self.files = buckets[split]

        self.sample_rate: Optional[int] = None
        self.samples: List[np.ndarray] = []
        self.f0s: List[np.ndarray] = []
        file_lengths = []
        for filename in self.files:
            x, sr = read_wav(str(filename))
            if x.ndim > 1:
                x = x.mean(axis=-1)
            if self.sample_rate is None:
                self.sample_rate = sr
                self.segment_num_frames = int(duration * sr)
                self.hop_num_frames = int((duration - overlap) * sr)
                self.f0_hop_num_frames = 0.005 * sr
            else:
                assert sr == self.sample_rate
            f0 = np.loadtxt(str(filename.with_suffix(f0_suffix)))
            self.f0s.append(np.atleast_1d(f0))
            self.samples.append(x)
            file_lengths.append(
                max(0, x.shape[0] - self.segment_num_frames)
                // self.hop_num_frames + 1)

        self.file_lengths = np.asarray(file_lengths)
        self.boundaries = np.cumsum(np.asarray([0] + file_lengths))

    def __len__(self) -> int:
        return int(self.boundaries[-1])

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        bin_pos = int(np.digitize(index, self.boundaries[1:], right=False))
        x = self.samples[bin_pos]
        f0 = self.f0s[bin_pos]
        f0 = np.where(f0 < self.f0_floor, 0, f0)
        offset = int(index - self.boundaries[bin_pos]) * self.hop_num_frames

        seg = x[offset: offset + self.segment_num_frames]
        tp = np.arange(len(f0)) * self.f0_hop_num_frames
        t = np.arange(offset, offset + self.segment_num_frames)
        mask = np.interp(t, tp, (f0 == 0).astype(float), right=1) > 0
        interp_f0 = np.where(mask, 0, np.interp(t, tp, f0))

        if seg.shape[0] < self.segment_num_frames:
            seg = np.pad(seg, (0, self.segment_num_frames - seg.shape[0]))
        return seg.astype(np.float32), interp_f0.astype(np.float32)


class M4SingerDataset(SegmentDataset):
    test_folder_prefixes = {"Alto-1", "Soprano-1", "Tenor-1", "Bass-1"}
    valid_folder_prefixes = {"Alto-2", "Alto-3", "Tenor-2", "Tenor-3"}


class VCTKDataset(SegmentDataset):
    test_folder_prefixes = {"p360", "p361", "p362", "p363", "p364", "p374",
                            "p376", "s5"}
    valid_folder_prefixes = {"p225", "p226", "p227", "p228", "p229", "p230",
                             "p231", "p232", "p233", "p234", "p236", "p237",
                             "p238", "p239", "p240", "p241"}
    file_suffix = "mic1.wav"


class MPop600Dataset(SegmentDataset):
    """MPop600: files named ``<singer>_<postfix>`` (reference ``datasets``
    submodule; split postfixes per its in-repo usage)."""

    test_file_postfix = {"001.wav", "002.wav", "003.wav"}
    valid_file_postfix = {"004.wav", "005.wav", "006.wav"}
    f0_floor = 80.0

    def __init__(self, wav_dir: str, split: str = "train",
                 duration: float = 2.0, overlap: float = 0.5,
                 f0_suffix: str = ".pv"):
        wav_dir_p = pathlib.Path(wav_dir)
        buckets = {"train": [], "valid": [], "test": []}
        for f in sorted(wav_dir_p.glob("*.wav")):
            parts = f.name.split("_")
            postfix = parts[-1] if len(parts) > 1 else f.name
            if postfix in self.test_file_postfix:
                buckets["test"].append(f)
            elif postfix in self.valid_file_postfix:
                buckets["valid"].append(f)
            else:
                buckets["train"].append(f)
        self.files = buckets[split]
        self.sample_rate = None
        self.samples, self.f0s = [], []
        file_lengths = []
        for filename in self.files:
            x, sr = read_wav(str(filename))
            if x.ndim > 1:
                x = x.mean(axis=-1)
            if self.sample_rate is None:
                self.sample_rate = sr
                self.segment_num_frames = int(duration * sr)
                self.hop_num_frames = int((duration - overlap) * sr)
                self.f0_hop_num_frames = 0.005 * sr
            f0 = np.loadtxt(str(filename.with_suffix(f0_suffix)))
            self.f0s.append(np.atleast_1d(f0))
            self.samples.append(x)
            file_lengths.append(
                max(0, x.shape[0] - self.segment_num_frames)
                // self.hop_num_frames + 1)
        self.file_lengths = np.asarray(file_lengths)
        self.boundaries = np.cumsum(np.asarray([0] + file_lengths))


class LJSpeechDataset(SegmentDataset):
    test_file_names = {f"LJ001-{i:04d}.wav" for i in range(1, 21)}
    valid_file_names = {f"LJ001-{i:04d}.wav" for i in range(21, 101)}
    f0_floor = 80.0

    def __init__(self, wav_dir: str, split: str = "train",
                 duration: float = 2.0, overlap: float = 1.0,
                 f0_suffix: str = ".pv"):
        wav_dir_p = pathlib.Path(wav_dir)
        buckets = {"train": [], "valid": [], "test": []}
        for f in sorted(wav_dir_p.glob("*.wav")):
            if f.name in self.test_file_names:
                buckets["test"].append(f)
            elif f.name in self.valid_file_names:
                buckets["valid"].append(f)
            else:
                buckets["train"].append(f)
        self.files = buckets[split]
        self.sample_rate = None
        self.samples, self.f0s = [], []
        file_lengths = []
        for filename in self.files:
            x, sr = read_wav(str(filename))
            if x.ndim > 1:
                x = x.mean(axis=-1)
            if self.sample_rate is None:
                self.sample_rate = sr
                self.segment_num_frames = int(duration * sr)
                self.hop_num_frames = int((duration - overlap) * sr)
                self.f0_hop_num_frames = 0.005 * sr
            f0 = np.loadtxt(str(filename.with_suffix(f0_suffix)))
            self.f0s.append(np.atleast_1d(f0))
            self.samples.append(x)
            file_lengths.append(
                max(0, x.shape[0] - self.segment_num_frames)
                // self.hop_num_frames + 1)
        self.file_lengths = np.asarray(file_lengths)
        self.boundaries = np.cumsum(np.asarray([0] + file_lengths))


class MIR1KDataset(SegmentDataset):
    """MIR-1K: vocal channel of stereo files, all-train (reference
    ``datasets`` submodule usage)."""

    def __init__(self, data_dir: str, segment: int, overlap: int = 0,
                 upsample_f0: bool = False, in_hertz: bool = True,
                 f0_suffix: str = ".pv"):
        wav_dir = pathlib.Path(data_dir)
        self.files = sorted(wav_dir.glob("**/*.wav"))
        self.sample_rate = None
        self.samples, self.f0s = [], []
        file_lengths = []
        for filename in self.files:
            x, sr = read_wav(str(filename))
            if x.ndim > 1:
                x = x[..., -1]  # vocal channel
            if self.sample_rate is None:
                self.sample_rate = sr
                self.segment_num_frames = int(segment)
                self.hop_num_frames = max(1, int(segment - overlap))
                self.f0_hop_num_frames = 0.005 * sr
            pv = filename.with_suffix(f0_suffix)
            if pv.exists():
                f0 = np.atleast_1d(np.loadtxt(str(pv)))
            else:
                f0 = np.zeros(int(len(x) / self.f0_hop_num_frames) + 1)
            self.f0s.append(f0)
            self.samples.append(x)
            file_lengths.append(
                max(0, x.shape[0] - self.segment_num_frames)
                // self.hop_num_frames + 1)
        self.file_lengths = np.asarray(file_lengths)
        self.boundaries = np.cumsum(np.asarray([0] + file_lengths))


class InferenceDataset:
    """Full-utterance dataset returning (wav, f0, rel_path) (reference
    ``VCTKInferenceDataset``, ``ltng/data.py:250-293``)."""

    def __init__(self, wav_dir: str, split: str = "test",
                 f0_suffix: str = ".pv",
                 dataset_cls=VCTKDataset):
        self.wav_dir = pathlib.Path(wav_dir)
        buckets = {"train": [], "valid": [], "test": []}
        for f in sorted(self.wav_dir.glob("**/*" + dataset_cls.file_suffix)):
            prefix = f.parent.name.split("#")[0]
            if prefix in dataset_cls.test_folder_prefixes:
                buckets["test"].append(f)
            elif prefix in dataset_cls.valid_folder_prefixes:
                buckets["valid"].append(f)
            else:
                buckets["train"].append(f)
        self.files = buckets[split]
        self.f0_suffix = f0_suffix

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int):
        filename = self.files[index]
        y, sr = read_wav(str(filename))
        if y.ndim > 1:
            y = y.mean(axis=-1)
        f0 = np.atleast_1d(np.loadtxt(str(filename.with_suffix(
            self.f0_suffix))))
        f0 = np.where(f0 < 60, 0, f0)
        tp = np.arange(len(f0)) * sr // 200
        t = np.arange(y.shape[0])
        mask = np.interp(t, tp, (f0 == 0).astype(float), right=1) > 0
        interp_f0 = np.where(mask, 0, np.interp(t, tp, f0))
        rel = filename.relative_to(self.wav_dir)
        return (y.astype(np.float32), interp_f0.astype(np.float32), str(rel))


class DataLoader:
    """Minimal host-side batch iterator (shuffle + drop_last like the
    reference's torch DataLoader settings)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
            items = [self.dataset[int(i)] for i in sel]
            yield tuple(np.stack(col) if isinstance(col[0], np.ndarray)
                        else list(col) for col in zip(*items))


class DataModule:
    """LightningDataModule equivalent: builds split datasets + loaders."""

    dataset_cls = SegmentDataset
    inference_cls = InferenceDataset

    def __init__(self, batch_size: int, wav_dir: str, duration: float = 2.0,
                 overlap: float = 0.5, f0_suffix: str = ".pv", seed: int = 0):
        self.batch_size = batch_size
        self.wav_dir = wav_dir
        self.duration = duration
        self.overlap = overlap
        self.f0_suffix = f0_suffix
        self.seed = seed
        self.train_dataset = self.valid_dataset = None
        self.test_dataset = self.predict_dataset = None

    def _make(self, split):
        return self.dataset_cls(self.wav_dir, split, self.duration,
                                self.overlap, self.f0_suffix)

    def setup(self, stage: Optional[str] = None):
        if stage == "fit":
            self.train_dataset = self._make("train")
        if stage in ("fit", "validate"):
            self.valid_dataset = self._make("valid")
        if stage == "test":
            self.test_dataset = self._make("test")
        if stage == "predict":
            self.predict_dataset = self.inference_cls(
                self.wav_dir, "test", self.f0_suffix, self.dataset_cls)

    def train_dataloader(self):
        return DataLoader(self.train_dataset, self.batch_size, shuffle=True,
                          drop_last=True, seed=self.seed)

    def val_dataloader(self):
        return DataLoader(self.valid_dataset, self.batch_size)

    def test_dataloader(self):
        return DataLoader(self.test_dataset, self.batch_size)

    def predict_dataloader(self):
        return DataLoader(self.predict_dataset, 1)

    @property
    def sample_rate(self):
        for ds in (self.train_dataset, self.valid_dataset,
                   self.test_dataset):
            if ds is not None and getattr(ds, "sample_rate", None):
                return ds.sample_rate
        return None


class VCTK(DataModule):
    dataset_cls = VCTKDataset


class M4Singer(DataModule):
    dataset_cls = M4SingerDataset


class LJSpeech(DataModule):
    dataset_cls = LJSpeechDataset


class MPop600(DataModule):
    dataset_cls = MPop600Dataset


class MIR1K(DataModule):
    def __init__(self, batch_size: int, data_dir: str, segment: int,
                 overlap: int = 0, upsample_f0: bool = False,
                 in_hertz: bool = True, seed: int = 0):
        super().__init__(batch_size, data_dir, seed=seed)
        self.segment = segment
        self.seg_overlap = overlap
        self.upsample_f0 = upsample_f0
        self.in_hertz = in_hertz

    def setup(self, stage=None):
        if stage == "fit":
            self.train_dataset = MIR1KDataset(
                self.wav_dir, self.segment, self.seg_overlap,
                self.upsample_f0, self.in_hertz)


class SyntheticVoiceDataset:
    """Self-contained synthetic voice-like dataset (harmonic source with a
    random f0 contour + filtered noise) for smoke tests, benchmarks, and
    CI — no corpus required."""

    def __init__(self, n_items: int = 64, duration: float = 2.0,
                 sample_rate: int = 24000, seed: int = 0):
        self.n = n_items
        self.sample_rate = sample_rate
        self.t = int(duration * sample_rate)
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, index: int):
        rng = np.random.default_rng(self.seed * 100003 + index)
        t = np.arange(self.t) / self.sample_rate
        # smooth random f0 contour in 80..400 Hz with unvoiced gaps
        knots = rng.uniform(100, 350, 8)
        f0 = np.interp(np.linspace(0, 7, self.t), np.arange(8), knots)
        voiced = np.interp(np.linspace(0, 7, self.t), np.arange(8),
                           rng.uniform(0, 1, 8)) > 0.3
        f0 = np.where(voiced, f0, 0.0)
        phase = np.cumsum(np.where(f0 > 0, f0, 0) / self.sample_rate)
        x = np.zeros(self.t)
        for k in range(1, 9):
            x += np.sin(2 * np.pi * k * phase) / k
        x *= voiced.astype(float)
        x += rng.standard_normal(self.t) * 0.03
        x *= 0.3 / max(np.abs(x).max(), 1e-6)
        return x.astype(np.float32), f0.astype(np.float32)


class Synthetic(DataModule):
    def __init__(self, batch_size: int = 8, n_items: int = 64,
                 duration: float = 2.0, sample_rate: int = 24000,
                 seed: int = 0, wav_dir: str = "", overlap: float = 0.0):
        super().__init__(batch_size, wav_dir, duration, overlap, seed=seed)
        self.n_items = n_items
        self.duration = duration
        self._sr = sample_rate

    def _make(self, split):
        offs = {"train": 0, "valid": 1, "test": 2}[split]
        n = self.n_items if split == "train" else max(4, self.n_items // 8)
        return SyntheticVoiceDataset(n, self.duration, self._sr,
                                     seed=self.seed + offs * 7919)

    def setup(self, stage=None):
        if stage == "fit":
            self.train_dataset = self._make("train")
        if stage in ("fit", "validate"):
            self.valid_dataset = self._make("valid")
        if stage == "test":
            self.test_dataset = self._make("test")
        if stage == "predict":
            self.predict_dataset = _WithRelPath(self._make("test"))


class _WithRelPath:
    """Wrap a (x, f0) dataset to the inference interface (x, f0, rel)."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        x, f0 = self.ds[i]
        return x, f0, f"item{i:04d}.wav"

"""Datasets: CIFAR-10/100 + ImageNet folders + synthetic fallback.

Same capability surface as the upstream GenericVisionDataset
(data/datasets.py:64-473 upstream): registry with class names, split
handling, `target_size` auto-detection, binary-classification remapping via
`positive_classes`, `max_samples`-then-`subset` truncation order, class
distribution helper, persistent-volume auto-detection.

TPU-first differences:
* Samples are NHWC float32 in [0,1] numpy arrays — augmentation and
  normalization happen ON DEVICE (data/augment.py), not per-sample on the
  host, so __getitem__ is a cheap memory view.
* No torchvision dependency: CIFAR is read directly from the standard
  python-pickle batch files when present on disk; ImageNet from a
  class-per-folder tree. With no files and no network, a deterministic
  synthetic dataset with class-conditional structure is generated so
  training/tests run air-gapped (upstream MockDataset-style, but first-class).
"""

from __future__ import annotations

import os
import pickle
import tarfile
from pathlib import Path
from typing import Dict, Optional, Tuple

import numpy as np

AVAILABLE_DATASETS: Dict[str, dict] = {
    "cifar10": {
        "name": "CIFAR-10",
        "classes": [
            "airplane", "automobile", "bird", "cat", "deer",
            "dog", "frog", "horse", "ship", "truck",
        ],
        "num_classes": 10,
        "input_size": (32, 32),
        "channels": 3,
    },
    "cifar100": {
        "name": "CIFAR-100",
        "classes": [f"class_{i}" for i in range(100)],
        "num_classes": 100,
        "input_size": (32, 32),
        "channels": 3,
    },
    "imagenet": {
        "name": "ImageNet",
        "classes": [f"n{i:08d}" for i in range(1000)],
        "num_classes": 1000,
        "input_size": (224, 224),
        "channels": 3,
    },
    "synthetic": {
        "name": "Synthetic",
        "classes": [f"class_{i}" for i in range(10)],
        "num_classes": 10,
        "input_size": (32, 32),
        "channels": 3,
    },
    "synthetic-hard": {
        "name": "Synthetic-Hard",
        "classes": [f"class_{i}" for i in range(10)],
        "num_classes": 10,
        "input_size": (32, 32),
        "channels": 3,
    },
}

NATIVE_SIZES = {
    "cifar10": (32, 32),
    "cifar100": (32, 32),
    "imagenet": (224, 224),
    "synthetic": (32, 32),
    "synthetic-hard": (32, 32),
}


def get_dataset_info(dataset_name: str) -> dict:
    if dataset_name not in AVAILABLE_DATASETS:
        raise ValueError(
            f"Unknown dataset: {dataset_name}. "
            f"Available: {list(AVAILABLE_DATASETS.keys())}"
        )
    return AVAILABLE_DATASETS[dataset_name]


def default_data_root() -> Path:
    """Persistent-volume auto-detection (upstream datasets.py:99-108).

    NV_DATA_DIR overrides everything: point it at any mount holding the
    standard CIFAR pickle tarball (cifar-10-python.tar.gz /
    cifar-100-python.tar.gz, extracted or not) and the loader uses it
    directly — no downloader involved (real-data readiness drill; the
    download path stays as the fallback for networked hosts)."""
    env = os.environ.get("NV_DATA_DIR")
    if env:
        return Path(env)
    if Path("/runpod-volume").exists():
        return Path("/runpod-volume/datasets")
    return Path("./data/raw")


# Download support (upstream delegates to torchvision, datasets.py:376-404;
# here a plain urllib fetch with checksum + extraction). Disabled with
# NV_NO_DOWNLOAD=1; failures (air-gapped hosts) degrade to the synthetic
# fallback with a log line, never an exception.
CIFAR_DOWNLOADS: Dict[str, Tuple[str, str]] = {
    "cifar10": (
        "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
        "c58f30108f718f92721af3b95e74349a",
    ),
    "cifar100": (
        "https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
        "eb9058c3a382ffc7106e4002c42a8d85",
    ),
}


_failed_downloads: set = set()


def download_cifar(name: str, root: Path, timeout: float = 15.0) -> bool:
    """Fetch + verify + extract a CIFAR archive under `root`.

    Returns True on success. Any failure (no network, bad checksum, disk)
    logs and returns False — callers fall back to synthetic data. A failed
    name is not retried within the process (air-gapped hosts must not pay
    the timeout once per split).
    """
    import hashlib
    import urllib.request

    from nnue_vision_tpu.training.logging import early_log

    if name not in CIFAR_DOWNLOADS or name in _failed_downloads:
        return False
    url, md5 = CIFAR_DOWNLOADS[name]
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    archive = root / url.rsplit("/", 1)[1]
    try:
        if not archive.exists():
            early_log(f"downloading {url} → {archive}")
            tmp = archive.with_suffix(".part")
            with urllib.request.urlopen(url, timeout=timeout) as resp, open(
                tmp, "wb"
            ) as out:
                while chunk := resp.read(1 << 20):
                    out.write(chunk)
            tmp.rename(archive)
        digest = hashlib.md5(archive.read_bytes()).hexdigest()
        if digest != md5:
            early_log(f"{archive.name}: checksum {digest} != {md5}; discarding")
            archive.unlink()
            # cache the failure like any other — a corrupted mirror must
            # not trigger a full re-download per split
            _failed_downloads.add(name)
            return False
        with tarfile.open(archive) as tf:
            tf.extractall(root)
        return True
    except Exception as e:  # noqa: BLE001 — degrade, never crash training
        _failed_downloads.add(name)
        early_log(f"download of {name} failed ({e}); using fallback data")
        return False


def _resize_bilinear(images: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Host-side bilinear resize for (N, H, W, C) float arrays."""
    n, h, w, c = images.shape
    th, tw = size
    if (h, w) == (th, tw):
        return images
    ys = np.linspace(0, h - 1, th)
    xs = np.linspace(0, w - 1, tw)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    a = images[:, y0][:, :, x0]
    b = images[:, y0][:, :, x1]
    cc = images[:, y1][:, :, x0]
    d = images[:, y1][:, :, x1]
    return (
        a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
        + cc * wy * (1 - wx) + d * wy * wx
    ).astype(np.float32)


def _load_cifar_from_disk(root: Path, name: str, train: bool):
    """Read the standard CIFAR python pickle batches if present.

    Accepts both the extracted directory and the original .tar.gz.
    Returns (images float32 [0,1] NHWC, labels int64) or None.
    """
    dirname = "cifar-10-batches-py" if name == "cifar10" else "cifar-100-python"
    base = root / dirname
    if not base.exists():
        candidates = [root / f"{dirname}.tar.gz"]
        if name == "cifar10":
            candidates.append(root / "cifar-10-python.tar.gz")
        for t in candidates:
            if t.exists():
                try:
                    with tarfile.open(t) as tf:
                        tf.extractall(root)
                except OSError:
                    # NV_DATA_DIR may be a read-only mount holding only
                    # the tarball (hand-carried data on air-gapped
                    # hosts) — extract to a writable cache instead
                    cache = Path.home() / ".cache" / "nnue_vision_tpu" / name
                    cache.mkdir(parents=True, exist_ok=True)
                    if not (cache / dirname).exists():
                        # extract to a temp dir + atomic rename so an
                        # interrupted extraction never leaves a partial
                        # cache that later runs would trust forever
                        import shutil
                        import tempfile

                        tmp = Path(tempfile.mkdtemp(dir=cache))
                        try:
                            with tarfile.open(t) as tf:
                                tf.extractall(tmp)
                            try:
                                (tmp / dirname).rename(cache / dirname)
                            except OSError:
                                pass  # concurrent extractor won the race
                        finally:
                            shutil.rmtree(tmp, ignore_errors=True)
                    base = cache / dirname
                break
    if not base.exists():
        return None

    def read_batch(path):
        with open(path, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        labels = d.get(b"labels", d.get(b"fine_labels"))
        return data, np.asarray(labels, np.int64)

    if name == "cifar10":
        files = (
            [base / f"data_batch_{i}" for i in range(1, 6)]
            if train else [base / "test_batch"]
        )
    else:
        files = [base / ("train" if train else "test")]
    xs, ys = zip(*(read_batch(f) for f in files))
    images = np.concatenate(xs).astype(np.float32) / 255.0
    return images, np.concatenate(ys)


def _synthetic_dataset(
    num_classes: int, size: Tuple[int, int], n: int, seed: int,
    class_seed: int = 1234,
):
    """Deterministic class-conditional images: each class is a distinct
    low-frequency pattern + per-sample noise and jitter.

    The class patterns derive from `class_seed` ONLY (split-independent),
    so a model trained on the train split generalizes to the test split;
    `seed` drives the per-split sample draw (labels, noise, jitter).
    """
    crng = np.random.default_rng(class_seed + num_classes)
    h, w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    freqs = crng.uniform(0.5, 3.0, (num_classes, 3, 2)).astype(np.float32)
    phases = crng.uniform(0, 2 * np.pi, (num_classes, 3)).astype(np.float32)

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, n).astype(np.int64)
    images = np.empty((n, h, w, 3), np.float32)
    for i, lab in enumerate(labels):
        jitter = rng.uniform(-0.5, 0.5, 3).astype(np.float32)  # phase jitter
        base = np.stack(
            [
                np.sin(
                    freqs[lab, c, 0] * 2 * np.pi * yy / h
                    + freqs[lab, c, 1] * 2 * np.pi * xx / w
                    + phases[lab, c] + jitter[c]
                )
                for c in range(3)
            ],
            axis=-1,
        )
        noise = rng.normal(0, 0.15, (h, w, 3)).astype(np.float32)
        images[i] = np.clip(0.5 + 0.35 * base + noise, 0.0, 1.0)
    return images, labels


def _synthetic_hard_dataset(
    num_classes: int, size: Tuple[int, int], n: int, seed: int,
    class_seed: int = 5678,
):
    """Difficulty-controlled synthetic benchmark (standing accuracy
    regression; VERDICT r1 item 4 — the easy `synthetic` task saturates at
    1.0000, which proves float↔int8 parity but hides capacity regressions).

    Construction: a SHARED dictionary of 16 Gabor-like atoms (oriented
    gratings under gaussian envelopes); each class is a sparse signature of
    6 atoms drawn from the shared pool, so signatures overlap heavily
    across classes. Per sample: signature coefficients jittered ×U(0.4,1.6),
    three random distractor atoms mixed in, the composite randomly shifted
    ±4 px (circular), then buried in pixel noise (σ=0.28 vs signal
    amplitude 0.24). Constants CALIBRATED on TPU (round 2) with the full
    production pipeline (QAT, cosine schedule, normalized eval): flagship
    NNUE reaches ≈0.86 val accuracy after 2560 steps — inside the 75–90%
    target band, far from saturation, so capacity regressions and QAT
    deltas are visible.

    Split-independent class structure (`class_seed` only) so train
    generalizes to test; `seed` drives the per-split draw.
    """
    h, w = size
    n_atoms, atoms_per_class, distractors = 16, 6, 3
    crng = np.random.default_rng(class_seed + 7 * num_classes)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yc, xc = yy / h - 0.5, xx / w - 0.5

    atoms = np.empty((n_atoms, h, w, 3), np.float32)
    for k in range(n_atoms):
        theta = crng.uniform(0, np.pi)
        freq = crng.uniform(1.5, 5.0)
        phase = crng.uniform(0, 2 * np.pi)
        cy, cx = crng.uniform(-0.25, 0.25, 2)
        sigma = crng.uniform(0.18, 0.35)
        grating = np.sin(
            2 * np.pi * freq
            * (np.cos(theta) * yc + np.sin(theta) * xc) + phase
        )
        envelope = np.exp(-((yc - cy) ** 2 + (xc - cx) ** 2) / (2 * sigma**2))
        chan = crng.uniform(-1.0, 1.0, 3).astype(np.float32)
        chan /= max(1e-6, np.abs(chan).max())
        atoms[k] = (grating * envelope)[:, :, None] * chan

    signatures = np.zeros((num_classes, n_atoms), np.float32)
    for c in range(num_classes):
        picked = crng.choice(n_atoms, atoms_per_class, replace=False)
        signatures[c, picked] = (
            crng.uniform(0.5, 1.0, atoms_per_class)
            * crng.choice([-1.0, 1.0], atoms_per_class)
        )

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, n).astype(np.int64)
    coefs = signatures[labels] * rng.uniform(0.4, 1.6, (n, n_atoms))
    for i in range(n):
        d = rng.choice(n_atoms, distractors, replace=False)
        coefs[i, d] += rng.uniform(-0.5, 0.5, distractors)
    # (n, h, w, 3) composite via one tensordot over atoms
    images = np.tensordot(coefs.astype(np.float32), atoms, axes=(1, 0))
    shifts = rng.integers(-4, 5, (n, 2))
    for i in range(n):
        images[i] = np.roll(images[i], tuple(shifts[i]), axis=(0, 1))
    noise = rng.normal(0.0, 0.28, images.shape).astype(np.float32)
    images = np.clip(0.5 + 0.24 * images + noise, 0.0, 1.0)
    return images.astype(np.float32), labels


class GenericVisionDataset:
    """In-memory dataset of (NHWC float32 [0,1] image, int label) samples."""

    def __init__(
        self,
        dataset_name: str = "cifar10",
        split: str = "train",
        target_size: Optional[Tuple[int, int]] = None,
        max_samples: Optional[int] = None,
        subset: float = 1.0,
        data_root: Optional[str] = None,
        binary_classification: Optional[dict] = None,
        use_augmentation: Optional[bool] = None,
        augmentation_strength: str = "medium",
        synthetic_fallback: bool = True,
        synthetic_size: int = 512,
        seed: int = 0,
        synthetic_class_seed: Optional[int] = None,
    ):
        self.dataset_name = dataset_name
        self.split = split
        self.dataset_info = get_dataset_info(dataset_name)
        self.data_root = Path(data_root) if data_root else default_data_root()
        self.target_size = target_size or NATIVE_SIZES.get(dataset_name, (96, 96))
        self.augmentation_strength = augmentation_strength
        # Augmentation defaults on only for train splits (upstream :175-176).
        self.use_augmentation = (
            use_augmentation
            if use_augmentation is not None
            else split in ("train", "training")
        )
        self.is_synthetic = False

        is_train = split in ("train", "training")
        loaded = None
        if dataset_name in ("cifar10", "cifar100"):
            loaded = _load_cifar_from_disk(self.data_root, dataset_name, is_train)
            if loaded is None and os.environ.get("NV_NO_DOWNLOAD") != "1":
                if download_cifar(dataset_name, self.data_root):
                    loaded = _load_cifar_from_disk(
                        self.data_root, dataset_name, is_train
                    )
        elif dataset_name == "imagenet":
            loaded = self._load_imagefolder(is_train)

        if loaded is None:
            if not synthetic_fallback and not dataset_name.startswith("synthetic"):
                raise FileNotFoundError(
                    f"{dataset_name} not found under {self.data_root} and "
                    "synthetic fallback disabled"
                )
            self.is_synthetic = True
            n = synthetic_size if is_train else max(64, synthetic_size // 4)
            generator = (
                _synthetic_hard_dataset
                if dataset_name == "synthetic-hard"
                else _synthetic_dataset
            )
            gen_kwargs = {}
            if synthetic_class_seed is not None:
                # A different class_seed is a different GENERATOR VARIANT
                # (new atom dictionary + class signatures) at the same
                # difficulty recipe — used by the seed-variance harness to
                # separate task-instance luck from training-seed noise.
                gen_kwargs["class_seed"] = int(synthetic_class_seed)
            loaded = generator(
                self.dataset_info["num_classes"],
                self.target_size,
                n,
                seed=seed + (0 if is_train else 10_000),
                **gen_kwargs,
            )

        images, labels = loaded
        images = _resize_bilinear(images, self.target_size)

        # Binary remap via positive class names (upstream :139-159).
        if binary_classification:
            positive = binary_classification.get("positive_classes", [])
            idxs = {
                self.dataset_info["classes"].index(c)
                for c in positive
                if c in self.dataset_info["classes"]
            }
            labels = np.isin(labels, list(idxs)).astype(np.int64)
            self.class_names = ["negative", "positive"]
            self.num_classes = 2
        else:
            self.class_names = self.dataset_info["classes"]
            self.num_classes = self.dataset_info["num_classes"]

        # max_samples first, then subset (upstream :420-427).
        if max_samples is not None:
            images, labels = images[:max_samples], labels[:max_samples]
        if subset < 1.0:
            k = int(len(images) * subset)
            images, labels = images[:k], labels[:k]

        self.images = np.ascontiguousarray(images, np.float32)
        self.labels = np.ascontiguousarray(labels, np.int64)

    def _load_imagefolder(self, is_train: bool):
        split_dir = self.data_root / "imagenet" / ("train" if is_train else "val")
        if not split_dir.exists():
            return None
        try:
            from PIL import Image  # optional dependency
        except ImportError:
            return None
        images, labels = [], []
        classes = sorted(d.name for d in split_dir.iterdir() if d.is_dir())
        for li, cls in enumerate(classes):
            for f in sorted((split_dir / cls).glob("*")):
                img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
                images.append(_resize_bilinear(img[None], self.target_size)[0])
                labels.append(li)
        if not images:
            return None
        return np.stack(images), np.asarray(labels, np.int64)

    def __len__(self) -> int:
        return len(self.labels)

    def __getitem__(self, idx: int):
        if idx >= len(self.labels):
            raise IndexError(idx)
        return self.images[idx], int(self.labels[idx])

    def get_class_distribution(self) -> dict:
        dist: Dict[str, int] = {}
        for lab in self.labels:
            name = self.class_names[int(lab)]
            dist[name] = dist.get(name, 0) + 1
        return dist

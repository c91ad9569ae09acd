"""Batch loaders over in-memory datasets.

Same creation surface as upstream create_data_loaders (data/loaders.py:13-123
upstream) — including the policy choices: val and test BOTH use the test
split, augmentation applies to train only, train shuffles and drops the
last partial batch, val/test keep it.

Batches are numpy (images NHWC float32 [0,1], labels int64); device-side
augmentation + normalization happen in the train loop (data/augment.py),
so a loader is just an index shuffler over contiguous arrays — no worker
processes needed (the arrays are already materialized, and TPU input
pipelines want big contiguous host buffers to feed `device_put`).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np

from nnue_vision_tpu.data.datasets import GenericVisionDataset, get_dataset_info


class ArrayLoader:
    """Iterates (images, labels) numpy batches over a GenericVisionDataset."""

    def __init__(self, dataset: GenericVisionDataset, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._epoch = 0
        self._seed = seed

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def iter_indices(self) -> Iterator[np.ndarray]:
        """Per-batch index arrays (same shuffle/drop_last policy as
        __iter__). Lets device-resident pipelines gather batches on the
        accelerator instead of uploading pixels every step."""
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self._seed + self._epoch)
            rng.shuffle(order)
            self._epoch += 1
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, self.batch_size):
            idx = order[start : start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            yield idx

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        for idx in self.iter_indices():
            yield self.dataset.images[idx], self.dataset.labels[idx]


class _HeadSubset:
    """First-n view of a dataset (synthetic splits are generated in random
    label order, so the head is an unbiased sample)."""

    def __init__(self, dataset, n: int):
        self.images = dataset.images[:n]
        self.labels = dataset.labels[:n]
        self.is_synthetic = getattr(dataset, "is_synthetic", False)
        self.class_names = getattr(dataset, "class_names", None)

    def __len__(self) -> int:
        return len(self.labels)


def head_subset_loader(loader: ArrayLoader, n: int,
                       batch_size: Optional[int] = None) -> ArrayLoader:
    """A no-shuffle loader over the first n samples of `loader`'s dataset
    (used to cheapen per-epoch train-split metric evaluation)."""
    return ArrayLoader(
        _HeadSubset(loader.dataset, n), batch_size or loader.batch_size
    )


def create_data_loaders(
    dataset_name: str = "cifar10",
    batch_size: int = 32,
    num_workers: int = 0,  # accepted for interface parity; loaders are zero-copy
    target_size: Optional[Tuple[int, int]] = None,
    max_samples_per_split: Optional[int] = None,
    subset: float = 1.0,
    data_root: Optional[str] = None,
    binary_classification: Optional[dict] = None,
    use_augmentation: bool = True,
    augmentation_strength: str = "medium",
    seed: int = 0,
    synthetic_fallback: bool = True,
    synthetic_size: int = 512,
    synthetic_class_seed: Optional[int] = None,
) -> Tuple[ArrayLoader, ArrayLoader, ArrayLoader]:
    """Returns (train_loader, val_loader, test_loader)."""
    del num_workers
    common = dict(
        dataset_name=dataset_name,
        target_size=target_size,
        max_samples=max_samples_per_split,
        subset=subset,
        data_root=data_root,
        binary_classification=binary_classification,
        augmentation_strength=augmentation_strength,
        synthetic_fallback=synthetic_fallback,
        synthetic_size=synthetic_size,
        seed=seed,
        synthetic_class_seed=synthetic_class_seed,
    )
    train_ds = GenericVisionDataset(
        split="train", use_augmentation=use_augmentation, **common
    )
    # val and test both read the test split, never augmented (upstream :68-92)
    val_ds = GenericVisionDataset(split="test", use_augmentation=False, **common)
    test_ds = GenericVisionDataset(split="test", use_augmentation=False, **common)

    return (
        ArrayLoader(train_ds, batch_size, shuffle=True, drop_last=True, seed=seed),
        ArrayLoader(val_ds, batch_size),
        ArrayLoader(test_ds, batch_size),
    )


def get_dataset_stats(dataset_name: str = "cifar10") -> Dict[str, Any]:
    """Basic dataset facts (upstream loaders.py:126-140)."""
    info = get_dataset_info(dataset_name)
    return {
        "name": info["name"],
        "description": f"{info['name']} dataset for computer vision",
        "num_classes": info["num_classes"],
        "class_names": info["classes"],
        "task": f"{info['num_classes']}-class classification",
        "input_type": "RGB images",
        "input_size": info["input_size"],
        "channels": info["channels"],
        "data_source": "disk (CIFAR pickle / ImageFolder) or synthetic",
    }


def calculate_dataset_statistics(loader: ArrayLoader) -> Dict[str, Any]:
    """Statistics of one batch (upstream loaders.py:170-226)."""
    images, labels = next(iter(loader))
    uniques, counts = np.unique(labels, return_counts=True)
    class_names = getattr(loader.dataset, "class_names", None)
    dist = {
        (class_names[int(u)] if class_names else f"class_{int(u)}"): int(c)
        for u, c in zip(uniques, counts)
    }
    return {
        "batch_size": images.shape[0],
        "image_shape": tuple(images.shape[1:]),
        "image_dtype": str(images.dtype),
        "label_dtype": str(labels.dtype),
        "image_mean_per_channel": images.mean(axis=(0, 1, 2)).tolist(),
        "image_std_per_channel": images.std(axis=(0, 1, 2)).tolist(),
        "image_min": float(images.min()),
        "image_max": float(images.max()),
        "unique_labels": uniques.tolist(),
        "label_distribution": dist,
        "total_samples_in_batch": int(labels.size),
    }

"""Data pipeline tests: datasets, loaders, on-device augmentation.

Covers the upstream policies (val==test split, augmentation only on train,
max_samples-then-subset order; tests/test_augmentation_validation.py
upstream) plus the new device-side augmentation graph.
"""

import jax
import numpy as np
import pytest

from nnue_vision_tpu.data.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    augment_batch,
    normalize_images,
    preprocess_batch,
)
from nnue_vision_tpu.data.datasets import (
    AVAILABLE_DATASETS,
    GenericVisionDataset,
    get_dataset_info,
)
from nnue_vision_tpu.data.loaders import (
    ArrayLoader,
    calculate_dataset_statistics,
    create_data_loaders,
)


def test_registry():
    info = get_dataset_info("cifar10")
    assert info["num_classes"] == 10
    assert len(info["classes"]) == 10
    assert "airplane" in info["classes"]
    with pytest.raises(ValueError):
        get_dataset_info("not_a_dataset")


def test_synthetic_dataset_deterministic():
    a = GenericVisionDataset("cifar10", split="train", synthetic_size=32, seed=1)
    b = GenericVisionDataset("cifar10", split="train", synthetic_size=32, seed=1)
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.labels, b.labels)
    # different split → different data
    c = GenericVisionDataset("cifar10", split="test", synthetic_size=32, seed=1)
    assert not np.array_equal(a.images[: len(c.images)], c.images)


def test_synthetic_hard_dataset():
    """The difficulty-controlled benchmark task (VERDICT r1 item 4):
    deterministic, correct shapes, split-independent class structure, and
    genuinely noisy. Difficulty itself is a MODEL-level property (averaging
    classifiers recover the templates; the binarized NNUE cannot — it lands
    ≈0.78, see config/train_nnue_hard.py + PARITY.md), so the unit test
    checks the generator's structure, not an accuracy band."""
    tr = GenericVisionDataset("synthetic-hard", split="train",
                              synthetic_size=1024, seed=3)
    te = GenericVisionDataset("synthetic-hard", split="test",
                              synthetic_size=1024, seed=3)
    tr2 = GenericVisionDataset("synthetic-hard", split="train",
                               synthetic_size=1024, seed=3)
    np.testing.assert_array_equal(tr.images, tr2.images)
    assert tr.images.shape == (1024, 32, 32, 3)
    assert tr.images.dtype == np.float32
    assert 0.0 <= tr.images.min() and tr.images.max() <= 1.0
    assert len(np.unique(tr.labels)) == 10
    assert not np.array_equal(tr.images[: len(te.images)], te.images)

    # nearest-centroid transfer proves the class structure is shared
    # across splits (training can generalize)
    cents = np.stack(
        [tr.images[tr.labels == c].mean(axis=0).ravel() for c in range(10)]
    )
    flat = te.images.reshape(len(te.images), -1)
    pred = np.argmin(
        ((flat[:, None, :] - cents[None]) ** 2).sum(-1), axis=1
    )
    acc = (pred == te.labels).mean()
    assert acc > 0.3, f"class structure not split-independent (acc {acc})"

    # per-sample noise floor: individual images must sit far from their
    # class template (guards against shipping a de-noised generator that
    # would re-saturate the benchmark)
    residual = np.std(
        tr.images - cents[tr.labels].reshape(-1, 32, 32, 3), axis=(1, 2, 3)
    ).mean()
    assert residual > 0.15, f"residual noise {residual:.3f} too low"


def _fake_cifar10_archive() -> bytes:
    """A tiny but structurally-valid cifar-10-python.tar.gz in memory."""
    import io
    import pickle
    import tarfile

    def batch_bytes(n, seed):
        r = np.random.default_rng(seed)
        payload = {
            b"data": r.integers(0, 256, (n, 3072), dtype=np.int64).astype(np.uint8),
            b"labels": r.integers(0, 10, n).tolist(),
        }
        return pickle.dumps(payload)

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for i in range(1, 6):
            data = batch_bytes(8, i)
            info = tarfile.TarInfo(f"cifar-10-batches-py/data_batch_{i}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
        data = batch_bytes(8, 99)
        info = tarfile.TarInfo("cifar-10-batches-py/test_batch")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    return buf.getvalue()


def test_download_path_loads_real_data(tmp_path, monkeypatch):
    """The torchvision-free downloader (upstream datasets.py:376-404
    equivalent): fetch → checksum → extract → load real pickles, no
    synthetic fallback. Network is mocked; the real pipeline runs."""
    import hashlib
    import io
    import urllib.request

    from nnue_vision_tpu.data import datasets as ds_mod

    archive = _fake_cifar10_archive()
    monkeypatch.delenv("NV_NO_DOWNLOAD", raising=False)
    monkeypatch.setattr(
        ds_mod, "CIFAR_DOWNLOADS",
        {"cifar10": ("http://mock/cifar-10-python.tar.gz",
                     hashlib.md5(archive).hexdigest())},
    )
    monkeypatch.setattr(ds_mod, "_failed_downloads", set())

    class FakeResponse(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda url, timeout=0: FakeResponse(archive),
    )

    train = GenericVisionDataset("cifar10", split="train",
                                 data_root=str(tmp_path))
    assert not train.is_synthetic
    assert train.images.shape == (40, 32, 32, 3)  # 5 batches × 8
    # archive cached on disk: a second dataset loads without the network
    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda url, timeout=0: (_ for _ in ()).throw(OSError("no net")),
    )
    test = GenericVisionDataset("cifar10", split="test",
                                data_root=str(tmp_path))
    assert not test.is_synthetic and test.images.shape[0] == 8


def test_cifar10_binary_layout_bit_faithful(tmp_path):
    """Genuine CIFAR-10 python-batch byte layout (VERDICT r3 item 6):
    each 3072-byte row is three row-major 32×32 planes in R,G,B order —
    byte index c·1024 + y·32 + x (upstream consumes this layout via
    torchvision at reference data/datasets.py:376-404). Pixel values here
    ENCODE their (sample, channel, y, x) coordinates, so any error in
    plane order, row-major order, channel order, the CHW→HWC transpose,
    or label alignment changes the decoded value and fails the test.
    The existing random-data fixtures can't catch those (random bytes
    look the same under any permutation)."""
    import pickle

    from nnue_vision_tpu.data.datasets import _load_cifar_from_disk

    n = 4

    def val(i, c, y, x):
        # injective into [0, 255]: coordinates recoverable from the byte
        return (i * 59 + c * 83 + y * 7 + x * 3) % 256

    ii, cc, yy, xx = np.meshgrid(
        np.arange(n), np.arange(3), np.arange(32), np.arange(32),
        indexing="ij",
    )
    rows = val(ii, cc, yy, xx).astype(np.uint8).reshape(n, 3072)

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    for b in range(1, 6):
        with open(base / f"data_batch_{b}", "wb") as f:
            pickle.dump(
                {b"data": rows, b"labels": [(b * 10 + i) % 10 for i in range(n)]},
                f,
            )
    with open(base / "test_batch", "wb") as f:
        pickle.dump({b"data": rows, b"labels": list(range(n))}, f)

    images, labels = _load_cifar_from_disk(tmp_path, "cifar10", train=True)
    assert images.shape == (5 * n, 32, 32, 3) and labels.shape == (5 * n,)
    # spot-check every coordinate axis with exact expected bytes
    for i in (0, 3):
        for c in range(3):
            for (y, x) in ((0, 0), (0, 31), (31, 0), (17, 5)):
                expected = np.float32(val(i, c, y, x)) / np.float32(255.0)
                got = images[i, y, x, c]
                assert got == expected, (i, c, y, x, got)
    # full-tensor check against the analytic layout for batch 1
    expected_imgs = (
        rows.reshape(n, 3, 32, 32).transpose(0, 2, 3, 1).astype(np.float32)
        / 255.0
    )
    np.testing.assert_array_equal(images[:n], expected_imgs)
    # label order: row i of batch b → global index (b-1)*n + i
    assert labels.tolist() == [
        (b * 10 + i) % 10 for b in range(1, 6) for i in range(n)
    ]

    te_images, te_labels = _load_cifar_from_disk(tmp_path, "cifar10",
                                                 train=False)
    assert te_images.shape == (n, 32, 32, 3)
    assert te_labels.tolist() == list(range(n))


def test_nv_data_dir_tarball_bypasses_downloader(tmp_path, monkeypatch):
    """Real-data readiness drill (VERDICT r2 item 7): NV_DATA_DIR pointed
    at ANY mount holding the standard CIFAR pickle tarball loads real
    data with the downloader completely bypassed (air-gapped hosts with
    a hand-carried tarball)."""
    import urllib.request

    (tmp_path / "cifar-10-python.tar.gz").write_bytes(_fake_cifar10_archive())
    monkeypatch.setenv("NV_DATA_DIR", str(tmp_path))
    monkeypatch.setenv("NV_NO_DOWNLOAD", "1")  # downloader must not run
    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda url, timeout=0: (_ for _ in ()).throw(
            AssertionError("downloader invoked despite NV_DATA_DIR")
        ),
    )
    # no data_root argument: default_data_root() must honor NV_DATA_DIR
    train = GenericVisionDataset("cifar10", split="train")
    assert not train.is_synthetic
    assert train.images.shape == (40, 32, 32, 3)


def test_download_checksum_mismatch_falls_back(tmp_path, monkeypatch):
    import io
    import urllib.request

    from nnue_vision_tpu.data import datasets as ds_mod

    archive = _fake_cifar10_archive()
    monkeypatch.delenv("NV_NO_DOWNLOAD", raising=False)
    monkeypatch.setattr(
        ds_mod, "CIFAR_DOWNLOADS",
        {"cifar10": ("http://mock/cifar-10-python.tar.gz", "0" * 32)},
    )
    monkeypatch.setattr(ds_mod, "_failed_downloads", set())

    class FakeResponse(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    monkeypatch.setattr(
        urllib.request, "urlopen",
        lambda url, timeout=0: FakeResponse(archive),
    )
    ds = GenericVisionDataset("cifar10", split="train",
                              data_root=str(tmp_path), synthetic_size=16)
    assert ds.is_synthetic  # bad checksum → rejected → fallback
    assert not (tmp_path / "cifar-10-python.tar.gz").exists()  # discarded


def test_download_failure_cached_per_process(tmp_path, monkeypatch):
    """An unreachable network must cost ONE attempt per process, not one
    per split (air-gapped hosts)."""
    import urllib.request

    from nnue_vision_tpu.data import datasets as ds_mod

    calls = {"n": 0}

    def failing_urlopen(url, timeout=0):
        calls["n"] += 1
        raise OSError("unreachable")

    monkeypatch.delenv("NV_NO_DOWNLOAD", raising=False)
    monkeypatch.setattr(ds_mod, "_failed_downloads", set())
    monkeypatch.setattr(urllib.request, "urlopen", failing_urlopen)
    for split in ("train", "test"):
        ds = GenericVisionDataset("cifar10", split=split,
                                  data_root=str(tmp_path), synthetic_size=16)
        assert ds.is_synthetic
    assert calls["n"] == 1


def test_dataset_shapes_and_range():
    ds = GenericVisionDataset("cifar10", split="train", synthetic_size=16)
    assert ds.images.shape == (16, 32, 32, 3)
    assert ds.images.dtype == np.float32
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    img, label = ds[0]
    assert img.shape == (32, 32, 3)
    assert isinstance(label, int)
    with pytest.raises(IndexError):
        _ = ds[100]


def test_max_samples_then_subset_order():
    ds = GenericVisionDataset("cifar10", split="train", synthetic_size=100,
                              max_samples=50, subset=0.5)
    assert len(ds) == 25  # 100 → 50 (max) → 25 (subset)


def test_binary_classification_remap():
    ds = GenericVisionDataset(
        "cifar10", split="train", synthetic_size=64,
        binary_classification={"positive_classes": ["airplane", "bird"]},
    )
    assert ds.num_classes == 2
    assert ds.class_names == ["negative", "positive"]
    assert set(np.unique(ds.labels)).issubset({0, 1})


def test_loader_policies():
    train, val, test = create_data_loaders(
        dataset_name="cifar10", batch_size=8, max_samples_per_split=20,
        use_augmentation=True,
    )
    # augmentation only on train
    assert train.dataset.use_augmentation
    assert not val.dataset.use_augmentation and not test.dataset.use_augmentation
    # val and test read the same split
    np.testing.assert_array_equal(val.dataset.images, test.dataset.images)
    # drop_last on train only: 20 samples / 8 → 2 train batches, 3 eval
    assert len(train) == 2 and len(val) == 3
    batches = list(train)
    assert all(b[0].shape[0] == 8 for b in batches)


def test_loader_shuffle_changes_per_epoch():
    ds = GenericVisionDataset("cifar10", split="train", synthetic_size=32)
    loader = ArrayLoader(ds, batch_size=32, shuffle=True, seed=0)
    first = next(iter(loader))[1].copy()
    second = next(iter(loader))[1].copy()
    assert not np.array_equal(first, second)  # reshuffled across epochs
    # but deterministic across loader instances with the same seed
    loader2 = ArrayLoader(ds, batch_size=32, shuffle=True, seed=0)
    np.testing.assert_array_equal(first, next(iter(loader2))[1])


def test_dataset_statistics():
    ds = GenericVisionDataset("cifar10", split="test", synthetic_size=32)
    stats = calculate_dataset_statistics(ArrayLoader(ds, batch_size=16))
    assert stats["batch_size"] == 16
    assert stats["image_shape"] == (32, 32, 3)
    assert 0.0 <= stats["image_min"] <= stats["image_max"] <= 1.0
    assert sum(stats["label_distribution"].values()) == 16


def test_normalize_images():
    x = np.full((2, 4, 4, 3), 0.5, np.float32)
    y = np.asarray(normalize_images(x))
    expected = (0.5 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(y[0, 0, 0], expected, rtol=1e-6)


@pytest.mark.parametrize("strength", ["light", "medium", "heavy"])
def test_augment_batch_properties(rng, strength):
    images = rng.random((8, 16, 16, 3), dtype=np.float32).astype(np.float32)
    key = jax.random.PRNGKey(0)
    out = np.asarray(augment_batch(key, images, strength))
    assert out.shape == images.shape
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 1.0
    # deterministic for a fixed key
    out2 = np.asarray(augment_batch(key, images, strength))
    np.testing.assert_array_equal(out, out2)
    # different keys → different result (with overwhelming probability)
    out3 = np.asarray(augment_batch(jax.random.PRNGKey(1), images, strength))
    assert not np.array_equal(out, out3)


def test_bilinear_gather_matches_map_coordinates(rng):
    """The TPU-friendly flat-gather warp (_bilinear_gather) must reproduce
    `jax.scipy.ndimage.map_coordinates(order=1, mode='constant', cval=0)`
    — the reference semantics the affine warp was originally written
    against — including out-of-frame coordinates (zero fill)."""
    import jax.numpy as jnp

    from nnue_vision_tpu.data.augment import _bilinear_gather

    b, h, w = 5, 13, 11
    x = jnp.asarray(rng.random((b, h, w, 3), dtype=np.float32))
    # coordinates straddle the frame: in-bounds, fractional, and outside
    src_y = jnp.asarray(
        rng.uniform(-3.0, h + 3.0, (b, h, w)).astype(np.float32)
    )
    src_x = jnp.asarray(
        rng.uniform(-3.0, w + 3.0, (b, h, w)).astype(np.float32)
    )

    got = _bilinear_gather(x, src_y, src_x)

    def ref_one(img, sy, sx):
        return jnp.stack(
            [
                jax.scipy.ndimage.map_coordinates(
                    img[:, :, c], [sy, sx], order=1, mode="constant",
                    cval=0.0,
                )
                for c in range(3)
            ],
            axis=-1,
        )

    want = jax.vmap(ref_one)(x, src_y, src_x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=0, atol=1e-6
    )


def test_composed_rot90_warp_is_exact(rng):
    """The composed-geometry warp must reproduce jnp.rot90 EXACTLY for the
    four exact rotation matrices (integer entries → the bilinear sample
    lands on grid points with zero fractional weight)."""
    import jax.numpy as jnp

    from nnue_vision_tpu.data.augment import _warp

    b, h = 4, 8
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))
    mats = [
        [[1.0, 0.0], [0.0, 1.0]],
        [[0.0, 1.0], [-1.0, 0.0]],
        [[-1.0, 0.0], [0.0, -1.0]],
        [[0.0, -1.0], [1.0, 0.0]],
    ]
    for k, m in enumerate(mats):
        mv = (
            jnp.tile(jnp.asarray(m, jnp.float32), (b, 1, 1)),
            jnp.zeros((b, 2), jnp.float32),
        )
        got = np.asarray(_warp(x, mv))
        want = np.asarray(jnp.rot90(x, k, (1, 2)))
        np.testing.assert_array_equal(got, want, err_msg=f"k={k}")


def test_geometry_composition_matches_sequential_warps(rng):
    """Composing two affine maps then warping once must equal warping
    twice for maps that keep all samples in-frame (composition only
    changes the interpolation count, which pure translations by integer
    pixels make exact)."""
    import jax.numpy as jnp

    from nnue_vision_tpu.data.augment import _mv_compose, _warp

    b, h = 3, 8
    x = jnp.asarray(rng.random((b, h, h, 3), dtype=np.float32))

    def translate(dy, dx):
        return (
            jnp.tile(jnp.eye(2, dtype=jnp.float32), (b, 1, 1)),
            jnp.tile(jnp.asarray([dy, dx], jnp.float32), (b, 1)),
        )

    mv1, mv2 = translate(1.0, 0.0), translate(0.0, 2.0)
    composed = np.asarray(_warp(x, _mv_compose(mv1, mv2)))
    sequential = np.asarray(_warp(_warp(x, mv1), mv2))
    np.testing.assert_array_equal(composed, sequential)


def test_augment_changes_some_samples(rng):
    images = rng.random((16, 16, 16, 3), dtype=np.float32).astype(np.float32)
    out = np.asarray(augment_batch(jax.random.PRNGKey(2), images, "medium"))
    changed = [not np.array_equal(out[i], images[i]) for i in range(16)]
    assert any(changed)


def test_preprocess_no_augment_is_pure_normalize(rng):
    images = rng.random((4, 16, 16, 3), dtype=np.float32).astype(np.float32)
    out = preprocess_batch(jax.random.PRNGKey(0), images,
                           strength="heavy", augment=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(normalize_images(images)), rtol=1e-6
    )


def test_bad_strength_rejected(rng):
    images = rng.random((2, 8, 8, 3), dtype=np.float32).astype(np.float32)
    with pytest.raises(ValueError):
        augment_batch(jax.random.PRNGKey(0), images, "extreme")


def test_hflip_probability_distribution(rng):
    """Distribution validation (SURVEY.md §7 hard-part 4): the flip family
    fires at the configured rate (~0.5) across samples/keys."""
    # an asymmetric image so flips are detectable
    base = np.zeros((1, 8, 8, 3), np.float32)
    base[0, :, :4, :] = 1.0
    images = np.repeat(base, 256, axis=0)
    out = np.asarray(augment_batch(jax.random.PRNGKey(7), images, "light"))
    # brightness/cutout may perturb values; detect flips by side-mass
    left = out[:, :, :4, :].mean(axis=(1, 2, 3))
    right = out[:, :, 4:, :].mean(axis=(1, 2, 3))
    flipped = (right > left).mean()
    assert 0.38 < flipped < 0.62, f"flip rate {flipped} not ≈ 0.5"


def test_head_subset_loader():
    """head_subset_loader yields only the first n samples, preserving
    order, and supports a batch-size override (per-epoch train-metric
    subsampling knob, config.eval_train_samples)."""
    import numpy as np

    from nnue_vision_tpu.data.loaders import ArrayLoader, head_subset_loader

    class DS:
        images = np.arange(40, dtype=np.float32).reshape(10, 2, 2, 1)
        labels = np.arange(10)

        def __len__(self):
            return 10

    sub = head_subset_loader(ArrayLoader(DS(), 4), 6, batch_size=3)
    batches = list(sub)
    assert [len(l) for _, l in batches] == [3, 3]
    got = np.concatenate([l for _, l in batches])
    assert np.array_equal(got, np.arange(6))
    assert np.array_equal(batches[0][0], DS.images[:3])

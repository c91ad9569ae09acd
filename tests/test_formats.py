"""Format-layer tests: byte determinism, round-trips, layout invariants.

Mirrors the reference's serialization coverage (SURVEY.md §2.5) but asserts
byte-level determinism, which the reference never did.
"""

import struct

import numpy as np
import pytest

from nnue_vision_tpu.formats import (
    ETINY_MAGIC,
    FormatError,
    NNUE_MAGIC,
    read_etiny,
    read_nnue,
    write_etiny,
    write_nnue,
)
from tests.conftest import random_quantized_etiny, random_quantized_nnue


def test_nnue_roundtrip(rng, tmp_path):
    q = random_quantized_nnue(rng)
    path = tmp_path / "m.nnue"
    write_nnue(q, path)
    q2 = read_nnue(path)
    assert q2.grid_size == q.grid_size
    assert q2.l1 == q.l1 and q2.l2 == q.l2 and q2.l3 == q.l3
    assert q2.num_classes == q.num_classes
    assert q2.visual_threshold == pytest.approx(q.visual_threshold)
    np.testing.assert_array_equal(q2.conv.weight, q.conv.weight)
    np.testing.assert_array_equal(q2.ft.weight, q.ft.weight)
    np.testing.assert_array_equal(q2.ft.bias, q.ft.bias)
    np.testing.assert_array_equal(q2.fc1.weight, q.fc1.weight)
    np.testing.assert_array_equal(q2.fc1.bias, q.fc1.bias)
    np.testing.assert_array_equal(q2.fc2.weight, q.fc2.weight)
    np.testing.assert_array_equal(q2.out.weight, q.out.weight)
    np.testing.assert_array_equal(q2.out.bias, q.out.bias)


def test_nnue_write_deterministic(rng, tmp_path):
    q = random_quantized_nnue(rng)
    p1, p2 = tmp_path / "a.nnue", tmp_path / "b.nnue"
    write_nnue(q, p1)
    write_nnue(q, p2)
    assert p1.read_bytes() == p2.read_bytes()


def test_nnue_header_layout(rng, tmp_path):
    """The first bytes are exactly the v2 header the C++ reader expects."""
    q = random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4, num_classes=3)
    path = tmp_path / "m.nnue"
    write_nnue(q, path)
    raw = path.read_bytes()
    assert raw[:4] == NNUE_MAGIC
    version, feats, l1, l2, l3, buckets = struct.unpack("<6I", raw[4:28])
    assert version == 2
    assert feats == 4 * 4 * 6
    assert (l1, l2, l3, buckets) == (16, 8, 4, 1)
    nnue2score, qone, thresh = struct.unpack("<3f", raw[28:40])
    assert nnue2score == 600.0 and qone == 127.0
    assert thresh == pytest.approx(q.visual_threshold)


def test_nnue_file_size_formula(rng, tmp_path):
    """Total size matches the layer-stack container layout exactly."""
    grid, ch, l1, l2, l3, c = 4, 6, 16, 8, 4, 3
    q = random_quantized_nnue(rng, grid, ch, l1, l2, l3, c)
    path = tmp_path / "m.nnue"
    write_nnue(q, path)
    f = grid * grid * ch
    expected = (
        4 + 4 + 5 * 4 + 3 * 4  # header
        + 4 + 4 + 4 * 4 + ch * 27 + 4 + ch * 4  # conv payload
        + 4 + 2 * 4 + f * l1 * 2 + 4 + l1 * 4  # feature transformer
        + 4 * 4  # layer-stack scales
        + 2 * 4 + (l2 + 1) * l1 + 4 + (l2 + 1) * 4  # L1 (+pad row)
        + 2 * 4 + l1 * l1 + 4 + l1 * 4  # factorization identity
        + 2 * 4 + l3 * 2 * l2 + 4 + l3 * 4  # L2 (doubled input)
        + 2 * 4 + c * l3 + 4 + c * 4  # output
    )
    assert path.stat().st_size == expected


def test_conv_weight_engine_byte_order(rng, tmp_path):
    """Conv bytes on disk are (out, kh, kw, in) — the order the engine
    indexes (nnue_engine.cpp:69) — while the API holds true OIHW."""
    q = random_quantized_nnue(rng, grid=4, ch=2)
    path = tmp_path / "m.nnue"
    write_nnue(q, path)
    raw = path.read_bytes()
    conv_w_off = 40 + 4 + 4 + 16  # header + inner tag + scale + dims
    on_disk = np.frombuffer(
        raw[conv_w_off : conv_w_off + 2 * 27], np.int8
    ).reshape(2, 3, 3, 3)
    np.testing.assert_array_equal(on_disk, q.conv.weight.transpose(0, 2, 3, 1))


def test_etiny_roundtrip(rng, tmp_path):
    q = random_quantized_etiny(rng)
    path = tmp_path / "m.etiny"
    write_etiny(q, path)
    q2 = read_etiny(path)
    assert q2.variant == "micro"
    assert q2.num_classes == q.num_classes
    assert len(q2.blocks) == len(q.blocks)
    assert q2.blocks[1].is_dense and not q2.blocks[0].is_dense
    assert q2.blocks[1].stride == 2
    for b1, b2 in zip(q.blocks, q2.blocks):
        np.testing.assert_array_equal(b1.pw_expand, b2.pw_expand)
        np.testing.assert_array_equal(b1.dw, b2.dw)
        np.testing.assert_array_equal(b1.pw_project, b2.pw_project)
    np.testing.assert_array_equal(q2.stem.weight, q.stem.weight)
    np.testing.assert_array_equal(q2.classifier.weight, q.classifier.weight)
    np.testing.assert_array_equal(q2.classifier.bias, q.classifier.bias)


def test_etiny_magic_and_determinism(rng, tmp_path):
    q = random_quantized_etiny(rng)
    p1, p2 = tmp_path / "a.etiny", tmp_path / "b.etiny"
    write_etiny(q, p1)
    write_etiny(q, p2)
    assert p1.read_bytes()[:4] == ETINY_MAGIC
    assert p1.read_bytes() == p2.read_bytes()


def test_bad_magic_rejected(tmp_path):
    path = tmp_path / "bad.nnue"
    path.write_bytes(b"XXXX" + b"\x00" * 64)
    with pytest.raises(FormatError):
        read_nnue(path)
    with pytest.raises(FormatError):
        read_etiny(path)


def test_truncated_file_rejected(rng, tmp_path):
    q = random_quantized_nnue(rng)
    path = tmp_path / "m.nnue"
    write_nnue(q, path)
    truncated = tmp_path / "t.nnue"
    truncated.write_bytes(path.read_bytes()[: path.stat().st_size // 2])
    with pytest.raises((FormatError, struct.error)):
        read_nnue(truncated)


def test_multibucket_layer_stack_rejected(rng, tmp_path):
    """ROADMAP #7 resolution: num_ls_buckets > 1 is an explicit,
    tested REJECTION, not undefined behavior. The format carries the
    field (header offset 24, /root/reference/serialize.py:44) but both
    upstream and this framework only ever write 1, and the upstream
    reader's layer-stack parsing assumes a single bucket
    (/root/reference/engine/src/nnue_engine.cpp:557) — silently
    accepting >1 would mis-parse the payload. Our readers (Python
    formats.py and engine/src/nnue.cpp:68-69) refuse loudly instead."""
    import struct as _struct

    q = random_quantized_nnue(rng)
    path = tmp_path / "m.nnue"
    write_nnue(q, path)
    blob = bytearray(path.read_bytes())
    # header: magic(4) version(4) num_features(4) l1(4) l2(4) l3(4) → buckets
    assert _struct.unpack_from("<I", blob, 24)[0] == 1
    _struct.pack_into("<I", blob, 24, 2)
    bad = tmp_path / "twobucket.nnue"
    bad.write_bytes(bytes(blob))
    with pytest.raises(FormatError, match="bucket"):
        read_nnue(bad)

    # the C++ engine must reject the same file (when a build is present)
    import subprocess
    from pathlib import Path

    exe = Path("engine/build/nnue_inference")
    if exe.exists():
        img = tmp_path / "img.bin"
        np.zeros((32, 32, 3), np.float32).tofile(img)
        r = subprocess.run(
            [str(exe), str(bad), str(img), "32", "32"],
            capture_output=True, text=True, timeout=30,
        )
        assert r.returncode != 0, "engine accepted a multi-bucket file"

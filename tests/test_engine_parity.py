"""The keystone tests: serialized models evaluate BIT-EXACTLY the same in
the JAX engine simulation, the numpy simulation, and the C++ engine binary.

The reference's parity tests only asserted cosine similarity / non-NaN
(tests/test_compiled_parity.py:115-117,:176-177 upstream); this framework's
contract is exact logit equality, which these tests enforce.
"""

import subprocess

import numpy as np
import pytest

from nnue_vision_tpu.formats import write_etiny, write_nnue
from nnue_vision_tpu.ops.engine_sim import (
    etiny_engine_forward,
    etiny_sim_params,
    nnue_engine_forward,
    nnue_sim_params,
)
from nnue_vision_tpu.ops.engine_sim_np import etiny_forward_np, nnue_forward_np
from tests.conftest import random_quantized_etiny, random_quantized_nnue


def _run_nnue_cli(exe, model, image_file, h, w, n=None):
    args = [str(exe), str(model), str(image_file), str(h), str(w)]
    if n is not None:
        args.append(str(n))
    r = subprocess.run(args, capture_output=True, text=True, timeout=30)
    assert r.returncode == 0, r.stderr
    out = []
    for line in r.stdout.strip().splitlines():
        parts = line.split(",")
        out.append(
            (np.array([float(x) for x in parts[:-1]], np.float32), float(parts[-1]))
        )
    return out


def _run_etiny_cli(exe, model, image_file, h, w):
    r = subprocess.run(
        [str(exe), str(model), str(image_file), str(h), str(w)],
        capture_output=True, text=True, timeout=30,
    )
    assert r.returncode == 0, r.stderr
    return np.array(
        [float(l.split(":")[1]) for l in r.stdout.splitlines()
         if l.startswith("RESULT_")],
        np.float32,
    )


@pytest.mark.parametrize("grid,ch,h", [(4, 6, 16), (10, 8, 32), (5, 4, 12)])
def test_nnue_cpp_parity(rng, tmp_path, engine_build_dir, grid, ch, h):
    q = random_quantized_nnue(rng, grid=grid, ch=ch)
    model = tmp_path / "m.nnue"
    write_nnue(q, model)
    exe = engine_build_dir / "nnue_inference"
    for _ in range(2):
        img = (rng.random((h, h, 3), dtype=np.float32) * 2 - 0.5).astype(np.float32)
        image_file = tmp_path / "img.bin"
        img.tofile(image_file)
        (cpp_logits, cpp_density), = _run_nnue_cli(exe, model, image_file, h, h)
        np_logits, np_density = nnue_forward_np(q, img)
        np.testing.assert_array_equal(cpp_logits, np_logits)
        # CLI prints density at 10 dp; compare within print truncation.
        assert cpp_density == pytest.approx(np_density, abs=5e-10)


def test_nnue_cpp_batch_mode(rng, tmp_path, engine_build_dir):
    q = random_quantized_nnue(rng)
    model = tmp_path / "m.nnue"
    write_nnue(q, model)
    h = 16
    imgs = rng.random((4, h, h, 3), dtype=np.float32).astype(np.float32)
    image_file = tmp_path / "batch.bin"
    imgs.tofile(image_file)
    results = _run_nnue_cli(
        engine_build_dir / "nnue_inference", model, image_file, h, h, n=4
    )
    assert len(results) == 4
    for i, (logits, _) in enumerate(results):
        np_logits, _ = nnue_forward_np(q, imgs[i])
        np.testing.assert_array_equal(logits, np_logits)


def test_nnue_jax_cpp_parity(rng, tmp_path, engine_build_dir):
    """Full triangle on the production-shaped config: JAX == numpy == C++."""
    q = random_quantized_nnue(rng, grid=4, ch=6, l1=16, l2=8, l3=4, num_classes=3)
    model = tmp_path / "m.nnue"
    write_nnue(q, model)
    params, cfg = nnue_sim_params(q)
    h = 12
    imgs = (rng.random((3, h, h, 3), dtype=np.float32) * 2 - 0.5).astype(np.float32)
    logits, _, count = nnue_engine_forward(params, imgs, cfg=cfg, image_h=h, image_w=h)
    logits, count = np.asarray(logits), np.asarray(count)
    image_file = tmp_path / "batch.bin"
    imgs.tofile(image_file)
    results = _run_nnue_cli(
        engine_build_dir / "nnue_inference", model, image_file, h, h, n=3
    )
    for i, (cpp_logits, cpp_density) in enumerate(results):
        np.testing.assert_array_equal(logits[i], cpp_logits)
        # exact density via the integer count (XLA f32 divide is ~1 ULP off)
        exact = np.float32(count[i]) / np.float32(q.num_features)
        assert abs(float(exact) - cpp_density) < 1e-9


def test_etiny_cpp_parity(rng, tmp_path, engine_build_dir):
    q = random_quantized_etiny(rng)
    model = tmp_path / "m.etiny"
    write_etiny(q, model)
    exe = engine_build_dir / "etinynet_inference"
    h = 32
    for _ in range(2):
        img = rng.random((h, h, 3), dtype=np.float32).astype(np.float32)
        image_file = tmp_path / "img.bin"
        img.tofile(image_file)
        cpp_logits = _run_etiny_cli(exe, model, image_file, h, h)
        np.testing.assert_array_equal(cpp_logits, etiny_forward_np(q, img))


def test_etiny_jax_cpp_parity(rng, tmp_path, engine_build_dir):
    q = random_quantized_etiny(rng)
    model = tmp_path / "m.etiny"
    write_etiny(q, model)
    params, cfg = etiny_sim_params(q)
    h = 32
    imgs = rng.random((2, h, h, 3), dtype=np.float32).astype(np.float32)
    logits = np.asarray(
        etiny_engine_forward(params, imgs, cfg=cfg, image_h=h, image_w=h)
    )
    for i in range(2):
        image_file = tmp_path / "img.bin"
        imgs[i].tofile(image_file)
        cpp_logits = _run_etiny_cli(
            engine_build_dir / "etinynet_inference", model, image_file, h, h
        )
        np.testing.assert_array_equal(logits[i], cpp_logits)

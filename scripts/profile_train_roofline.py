#!/usr/bin/env python3
"""Train-step roofline decomposition (VERDICT r2 item 3).

Times, with the chained-dispatch readback-forced method, successively
larger slices of the scanned training step at the production batch:

  gather     — device-resident index gather of images+labels only
  augment    — + the light augmentation + normalize pipeline
  forward    — + NNUE forward and CE loss (no backward)
  grad       — + backward (value_and_grad), no optimizer update
  full       — the shipped train step (update + weight clip)

and compares against the analytic bounds for each slice:

  FLOPs  — matmul/conv MACs ×2 (fwd) / ×3 (fwd+bwd) on the MXU
  bytes  — HBM traffic of the batch gather + augment elementwise pass

One JSON line at the end carries every measurement plus the derived
bound shares; docs/TRAIN_ROOFLINE.md narrates the conclusion.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from nnue_vision_tpu.data.augment import preprocess_batch  # noqa: E402
from nnue_vision_tpu.models.nnue import (  # noqa: E402
    GridFeatureSet, NNUEConfig, nnue_apply, nnue_init,
)
from nnue_vision_tpu.training.optim import create_optimizer  # noqa: E402
from nnue_vision_tpu.training.step import (  # noqa: E402
    make_train_state, train_step,
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


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    spd = 64

    cfg = NNUEConfig(
        feature_set=GridFeatureSet(10, 8),
        l1_size=1024, l2_size=128, l3_size=32,
        num_classes=10, input_size=32,
    )
    optimizer = create_optimizer(OptCfg(), steps_per_epoch=97)
    params = nnue_init(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    n_data = 8192
    device_images = jnp.asarray(
        rng.random((n_data, 32, 32, 3), dtype=np.float32))
    device_labels = jnp.asarray(rng.integers(0, 10, n_data).astype(np.int64))

    def scan_of(body):
        # device_images/labels enter as ARGUMENTS, not closure constants:
        # jit-closure jnp arrays are embedded as program constants, and on
        # this backend that costs ~1 ms/step extra (measured — see
        # closure_penalty_ms in the output)
        @jax.jit
        def run_args(imgs, lbls, state, key, idx_chunk):
            keys = jax.random.split(key, idx_chunk.shape[0])

            def step(carry, inp):
                idx, k = inp
                return body(carry, idx, k, imgs, lbls)

            return jax.lax.scan(step, state, (idx_chunk, keys))

        def run(state, key, idx_chunk):
            return run_args(device_images, device_labels, state, key,
                            idx_chunk)

        return run

    def gather_body(carry, idx, k, imgs, lbls):
        images = jnp.take(imgs, idx, axis=0)
        labels = jnp.take(lbls, idx, axis=0)
        s = carry + images.sum() + labels.sum()
        return s, s

    def augment_body(carry, idx, k, imgs, lbls):
        images = jnp.take(imgs, idx, axis=0)
        x = preprocess_batch(k, images, strength="light", augment=True)
        s = carry + x.sum()
        return s, s

    def forward_body(carry, idx, k, imgs, lbls):
        images = jnp.take(imgs, idx, axis=0)
        labels = jnp.take(lbls, idx, axis=0)
        x = preprocess_batch(k, images, strength="light", augment=True)
        logits = nnue_apply(params, x, cfg)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        return carry + loss, loss

    def loss_fn(p, x, labels):
        logits = nnue_apply(p, x, cfg)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    def grad_body(carry, idx, k, imgs, lbls):
        images = jnp.take(imgs, idx, axis=0)
        labels = jnp.take(lbls, idx, axis=0)
        x = preprocess_batch(k, images, strength="light", augment=True)
        loss, grads = jax.value_and_grad(loss_fn)(params, x, labels)
        gsum = sum(g.sum() for g in jax.tree_util.tree_leaves(grads))
        return carry + loss + gsum * 0, loss

    def full_body(state, idx, k, imgs, lbls):
        images = jnp.take(imgs, idx, axis=0)
        labels = jnp.take(lbls, idx, axis=0)
        x = preprocess_batch(k, images, strength="light", augment=True)
        state, metrics = train_step(
            state, x, labels, model_type="nnue", model_cfg=cfg,
            optimizer=optimizer)
        return state, metrics["loss"]

    def timed(run, init_state, reps=8):
        key = jax.random.PRNGKey(1)
        chunks = [jnp.asarray(rng.integers(0, n_data, (spd, batch)))
                  for _ in range(reps)]
        st = init_state
        st, out = run(st, key, chunks[0])  # compile
        jax.block_until_ready(out)
        np.asarray(out)  # force readback path
        best = float("inf")
        for _ in range(3):
            st = init_state
            t0 = time.perf_counter()
            for c in chunks:
                st, out = run(st, key, c)
            # per-step outputs chain through the scan carry: out[-1] of
            # the LAST dispatch depends on every prior step. Read back the
            # small (K,) output, not a param leaf — a multi-MB d2h on the
            # tunneled backend would dwarf the measured region.
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best / (reps * spd) * 1000.0  # ms per step

    out = {"batch": batch, "steps_per_dispatch": spd}

    # the production dispatch itself (bench.py's measured unit), for
    # harness cross-validation: stage sums must reconcile with this
    from nnue_vision_tpu.training.step import scanned_train_steps

    def full_prod(state, key, idx_chunk):
        # EXACT bench.py harness: no outer jit, buffers as arguments
        key, sub = jax.random.split(key)
        state, metrics = scanned_train_steps(
            state, device_images, device_labels, idx_chunk, sub,
            model_type="nnue", model_cfg=cfg, optimizer=optimizer,
            strength="light", augment=True,
        )
        return state, metrics["loss"]

    # forward with params passed as a scan-carry argument rather than a
    # trace-time closure constant (closure-constant handling is a known
    # XLA layout/copy hazard)
    def forward_arg_body(carry, idx, k, imgs, lbls):
        p, acc = carry
        images = jnp.take(imgs, idx, axis=0)
        labels = jnp.take(lbls, idx, axis=0)
        x = preprocess_batch(k, images, strength="light", augment=True)
        logits = nnue_apply(p, x, cfg)
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()
        return (p, acc + loss), loss

    # Contiguous-slice variants: the random-row gather is per-row-DMA
    # latency bound (measured 8.6× its bandwidth bound). Permuting the
    # whole dataset ONCE per dispatch (amortized over K steps) and
    # slicing batches contiguously reproduces exact epoch-shuffle
    # semantics at sequential-DMA speed.
    def scan_contig(use_full):
        @jax.jit
        def run_args(imgs, lbls, state, key):
            # permutation + full-dataset gather ONCE per dispatch, inside
            # the timed+jitted region (amortized over spd steps)
            perm = jax.random.permutation(jax.random.fold_in(key, 7), n_data)
            pimgs = jnp.take(imgs, perm, axis=0)
            plbls = jnp.take(lbls, perm, axis=0)
            keys = jax.random.split(key, spd)
            starts = (jnp.arange(spd, dtype=jnp.int32) * batch) % (
                n_data - batch + 1
            )

            def step(carry, inp):
                s, k = inp
                images = jax.lax.dynamic_slice_in_dim(pimgs, s, batch, axis=0)
                labels = jax.lax.dynamic_slice_in_dim(plbls, s, batch, axis=0)
                if use_full:
                    st = carry
                    x = preprocess_batch(k, images, strength="light",
                                         augment=True)
                    st, metrics = train_step(
                        st, x, labels, model_type="nnue", model_cfg=cfg,
                        optimizer=optimizer)
                    return st, metrics["loss"]
                acc = carry + images.sum() + labels.sum()
                return acc, acc

            return jax.lax.scan(step, state, (starts, keys))

        def run(state, key, idx_chunk):
            del idx_chunk  # contiguous variant draws its own epoch order
            return run_args(device_images, device_labels, state, key)

        return run

    # empty scan body: the pure per-iteration floor of lax.scan on this
    # backend (reads one idx element so the loop isn't DCE'd)
    def empty_body(carry, idx, k, imgs, lbls):
        s = carry + idx[0].astype(jnp.float32)
        return s, s

    # full step with scan unroll: replicates the body U× per loop
    # iteration — if the floor is loop machinery, per-step cost drops
    def scan_unroll(body, unroll):
        @jax.jit
        def run_args(imgs, lbls, state, key, idx_chunk):
            keys = jax.random.split(key, idx_chunk.shape[0])

            def step(carry, inp):
                idx, k = inp
                return body(carry, idx, k, imgs, lbls)

            return jax.lax.scan(step, state, (idx_chunk, keys),
                                unroll=unroll)

        def run(state, key, idx_chunk):
            return run_args(device_images, device_labels, state, key,
                            idx_chunk)

        return run

    stages = [
        ("empty", scan_of(empty_body), jnp.float32(0.0)),
        ("gather", scan_of(gather_body), jnp.float32(0.0)),
        ("gather_contig", scan_contig(False), jnp.float32(0.0)),
        ("full_unroll4", scan_unroll(full_body, 4),
         make_train_state(params, optimizer)),
        ("full_unroll8", scan_unroll(full_body, 8),
         make_train_state(params, optimizer)),
        ("augment", scan_of(augment_body), jnp.float32(0.0)),
        ("forward", scan_of(forward_body), jnp.float32(0.0)),
        ("forward_arg", scan_of(forward_arg_body),
         (params, jnp.float32(0.0))),
        ("grad", scan_of(grad_body), jnp.float32(0.0)),
        ("full", scan_of(full_body), make_train_state(params, optimizer)),
        ("full_prod", full_prod, make_train_state(params, optimizer)),
        ("full_contig", scan_contig(True),
         make_train_state(params, optimizer)),
    ]
    for name, run, init in stages:
        ms = timed(run, init)
        out[name + "_ms_per_step"] = round(ms, 4)
        out[name + "_images_per_sec"] = round(batch / (ms / 1000.0))
        print(json.dumps({name: out[name + "_ms_per_step"]}), flush=True)

    # Analytic bounds at this batch
    oh = ow = cfg.conv_out_hw
    ch = cfg.feature_set.num_features_per_square
    f = cfg.feature_set.num_features
    fwd_flops = 2.0 * (
        oh * ow * ch * 27 + f * cfg.l1_size
        + cfg.l1_size * cfg.l2_size + cfg.l2_size * cfg.l3_size
        + cfg.l3_size * cfg.num_classes
    )
    peak = 197e12
    hbm = 819e9
    img_bytes = 32 * 32 * 3 * 4
    out["analytic"] = {
        "fwd_flops_per_image": fwd_flops,
        "train_flops_per_image": 3 * fwd_flops,
        "mxu_bound_ms_fwd": round(batch * fwd_flops / peak * 1e3, 4),
        "mxu_bound_ms_train": round(batch * 3 * fwd_flops / peak * 1e3, 4),
        # gather: read + write the batch; augment: ~2 more r/w passes
        "hbm_bound_ms_gather": round(2 * batch * img_bytes / hbm * 1e3, 4),
        "hbm_bound_ms_augment_pass": round(
            4 * batch * img_bytes / hbm * 1e3, 4),
        "peak_bf16_flops": peak,
        "hbm_bytes_per_sec": hbm,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

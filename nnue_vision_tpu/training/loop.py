"""The training loop: train_model(config, model_type).

Upstream workflow parity (train.py:257-454): run tracker init + early-log
replay, data loaders, model build from config, optimizer, fail-fast C++
engine pre-compile + inference test, per-batch CE training with grad clip,
per-epoch float eval on train+val, per-epoch compiled (int8 engine
arithmetic) eval on val, identical metric keys (train/loss,
train/epoch_*, val/*, compiled/*, test/*), best-val-F1 checkpointing,
final test eval, cloud auto-stop unless keep_alive.

TPU redesign:
* the whole step (augment → normalize → forward → backward → update) is
  one jitted graph; batches are sharded over the data mesh when more than
  one device is visible, params replicated (GSPMD inserts the grad psum).
* per-epoch compiled metrics come from the bit-exact TPU int8 simulation
  (one device launch) rather than upstream's subprocess-per-image loop;
  the real engine binary is still exercised once at startup (fail-fast)
  and in `compiled_backend="engine"` mode.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import jax
import numpy as np

from nnue_vision_tpu.data.augment import preprocess_batch
from nnue_vision_tpu.data.loaders import create_data_loaders
from nnue_vision_tpu.models.etinynet import EtinyNetConfig, etinynet_init
from nnue_vision_tpu.models.nnue import GridFeatureSet, NNUEConfig, nnue_init
from nnue_vision_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from nnue_vision_tpu.training import checkpoint as ckpt
from nnue_vision_tpu.training.engine_build import (
    build_sanitizer_engine,
    compile_cpp_engine,
    smoke_test_sanitizer_engine,
)
from nnue_vision_tpu.training.evaluate import (
    evaluate_compiled_model,
    evaluate_int8_sim,
    evaluate_model,
)
from nnue_vision_tpu.training.logging import early_log, init_run, replay_early_logs
from nnue_vision_tpu.training.optim import create_optimizer
from nnue_vision_tpu.training.step import (
    gathered_train_step,
    make_train_state,
    scanned_train_steps,
    scanned_train_steps_fused,
    train_step,
)


def build_model(config: Any, model_type: str, rng: jax.Array):
    """(params, batch_stats, model_cfg) from an executable config module."""
    input_size = config.input_size
    if isinstance(input_size, (tuple, list)):
        input_size = input_size[0]
    if model_type == "nnue":
        model_cfg = NNUEConfig(
            feature_set=GridFeatureSet(
                grid_size=config.grid_size,
                num_features_per_square=config.num_features_per_square,
            ),
            l1_size=config.l1_size,
            l2_size=config.l2_size,
            l3_size=config.l3_size,
            num_classes=config.num_classes,
            input_size=input_size,
            qat=getattr(config, "qat", False),
            dtype=getattr(config, "dtype", "float32"),
        )
        params = nnue_init(rng, model_cfg)
        return params, None, model_cfg
    if model_type == "etinynet":
        model_cfg = EtinyNetConfig(
            variant=config.etinynet_variant,
            num_classes=config.num_classes,
            input_size=input_size,
            use_asq=getattr(config, "use_asq", False),
            asq_bits=getattr(config, "asq_bits", 4),
            engine_friendly=getattr(config, "engine_friendly", False),
            dtype=getattr(config, "dtype", "float32"),
        )
        params, stats = etinynet_init(rng, model_cfg)
        return params, stats, model_cfg
    raise ValueError(f"unknown model type: {model_type}")


def stop_cloud(reason: str = "") -> None:
    """Best-effort cloud instance stop (upstream stop_runpod, train.py:450-453)."""
    try:
        from nnue_vision_tpu.cloud.launcher import stop_instance

        stop_instance(reason=reason)
    except Exception as e:  # never let shutdown errors mask training results
        early_log(f"cloud stop failed (ignored): {e}")


def train_model(
    config: Any, model_type: str, wandb_run_id: Optional[str] = None
) -> int:
    devices = jax.devices()
    early_log(f"Using {len(devices)} device(s): {devices[0].platform}")
    # Pay the backend's one-time device→host transfer initialization now,
    # visibly, instead of mid-training (on tunneled TPU backends the first
    # d2h can take minutes while later ones are instant).
    t0 = time.perf_counter()
    np.asarray(jax.numpy.zeros(()))
    warm = time.perf_counter() - t0
    if warm > 1.0:
        early_log(f"device→host transfer path initialized ({warm:.1f}s)")

    run_cfg = {k: v for k, v in vars(config).items() if not k.startswith("__")}
    run = init_run(
        getattr(config, "project_name", "nnue_vision_tpu"),
        run_cfg,
        run_id=wandb_run_id,
        log_dir=getattr(config, "log_dir", "logs"),
    )
    early_log(f"Run: {run.name} ({run.url})")
    replay_early_logs()

    manager = ckpt.CheckpointManager(
        getattr(config, "log_dir", "logs"), run.name, run=run
    )
    # Opt-in Orbax async step checkpoints (pod-scale: saves overlap
    # training, restores are sharding-aware). The pickle best-model file
    # above remains the canonical serialize.py-readable artifact.
    orbax_ckpt = None
    if getattr(config, "checkpoint_backend", "pickle") == "orbax":
        from pathlib import Path

        orbax_dir = getattr(config, "orbax_dir", None) or (
            Path(getattr(config, "log_dir", "logs")) / "orbax" / run.name
        )
        orbax_ckpt = ckpt.OrbaxStepCheckpointer(
            orbax_dir, max_to_keep=int(getattr(config, "orbax_max_to_keep", 3))
        )
        early_log(f"orbax async checkpoints → {orbax_ckpt.dir}")

    train_loader, val_loader, test_loader = create_data_loaders(
        dataset_name=getattr(config, "dataset_name", "cifar10"),
        batch_size=config.batch_size,
        num_workers=getattr(config, "num_workers", 0),
        target_size=None,
        max_samples_per_split=getattr(config, "max_samples_per_split", None),
        subset=getattr(config, "subset", 1.0),
        use_augmentation=getattr(config, "use_augmentation", True),
        augmentation_strength=getattr(config, "augmentation_strength", "medium"),
        seed=getattr(config, "seed", 42),
        synthetic_size=getattr(config, "synthetic_size", 512),
        synthetic_class_seed=getattr(config, "synthetic_class_seed", None),
    )
    if train_loader.dataset.is_synthetic:
        early_log("NOTE: dataset not found on disk — training on synthetic data")

    rng = jax.random.PRNGKey(getattr(config, "seed", 42))
    rng, init_key = jax.random.split(rng)
    params, batch_stats, model_cfg = build_model(config, model_type, init_key)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    early_log(f"Model: {model_type}, parameters: {n_params:,}")

    steps_per_epoch = max(1, len(train_loader))
    optimizer = create_optimizer(config, steps_per_epoch)
    state = make_train_state(params, optimizer, batch_stats)

    # Data-parallel mesh sized to the largest device count that divides the
    # (drop_last) train batch, so every shard is equal — no padding, no
    # masked-loss complications.
    # config.max_devices caps the data-parallel width (0/absent = all);
    # max_devices=1 forces single-device even on a multi-chip host.
    mesh = None
    n_cap = int(getattr(config, "max_devices", 0) or 0) or len(devices)
    if min(len(devices), n_cap) > 1:
        n = min(len(devices), n_cap)
        while n > 1 and config.batch_size % n != 0:
            n -= 1
        if n > 1:
            mesh = make_mesh(n)
            state = replicate(mesh, state)
            early_log(f"Data-parallel over {n} devices")
        else:
            early_log(
                f"batch_size {config.batch_size} not divisible by any "
                f"device count ≤ {len(devices)}; running single-device"
            )

    # Fail-fast: the deployment engine must build and evaluate BEFORE
    # training starts (upstream train.py:323-347). Skippable for
    # environments without a toolchain via NV_SKIP_ENGINE=1.
    compiled_backend = getattr(config, "compiled_backend", "sim")
    if os.environ.get("NV_SKIP_ENGINE") != "1":
        compile_cpp_engine(model_type)
        if os.environ.get("NNUE_SANITIZER_SMOKE", "0") == "1":
            build_sanitizer_engine()
            smoke_test_sanitizer_engine(model_type)
        early_log("Testing C++ engine inference with current weights...")
        probe = [
            (train_loader.dataset.images[:4], train_loader.dataset.labels[:4])
        ]
        engine_metrics = evaluate_compiled_model(
            state.params, state.batch_stats, probe,
            model_type=model_type, model_cfg=model_cfg,
        )
        early_log(
            f"Engine OK: f1={engine_metrics['f1']:.4f} "
            f"{engine_metrics['ms_per_sample']:.2f} ms/sample"
        )
    else:
        compiled_backend = "sim"

    use_aug = getattr(config, "use_augmentation", True)
    strength = getattr(config, "augmentation_strength", "medium")
    max_epochs = getattr(config, "max_epochs", 1)
    best_val_f1 = 0.0

    # Progressive quantization (VERDICT r1 item 5): engine_friendly training
    # from scratch is unstable (straight-through quantizers + cold BN
    # statistics); with ef_warmup_epochs=W the first W epochs train the
    # CONTINUOUS engine-structured model (ef_quantizers=False: scale-only
    # norms, engine clamp ranges, no residual/dense — but no rounding), then
    # training switches the straight-through quantizers on and fine-tunes —
    # the quantized model starts from a strong solution of the same function
    # family, so the switch perturbs only by rounding. (Warming up on the
    # UNCONSTRAINED float model instead collapses to chance at the switch —
    # its BN biases and residual paths have no engine representation;
    # measured: val 0.93 → 0.10.) Params/stats structures are shared between
    # modes, so the switch is a config swap (one re-trace), not a restart.
    ef_warmup = int(getattr(config, "ef_warmup_epochs", 0))
    warm_cfg = model_cfg
    if ef_warmup > 0 and getattr(model_cfg, "engine_friendly", False):
        import dataclasses as _dc

        if hasattr(model_cfg, "ef_quantizers"):
            warm_cfg = _dc.replace(model_cfg, ef_quantizers=False)
        else:
            warm_cfg = _dc.replace(model_cfg, engine_friendly=False)
    elif ef_warmup > 0 and getattr(model_cfg, "qat", False):
        # NNUE analog: warm up with the continuous model INSIDE the engine
        # clamp ranges (qat_rounding=False — same function family, only the
        # weight/bias rounding is off), then switch the fake-quant rounding
        # on; the optimizer restart below applies identically. Warming up
        # on the unclamped float semantics instead would change the
        # function family at the switch (the EtinyNet collapse mode).
        import dataclasses as _dc

        warm_cfg = _dc.replace(model_cfg, qat_rounding=False)
    else:
        ef_warmup = 0

    def cfg_for(epoch: int):
        return warm_cfg if epoch < ef_warmup else model_cfg

    # At the quantizer switch the loss landscape changes (rounding turns
    # on); the warmup phase's cosine-decayed LR and stale Adam moments slow
    # the fine-tune badly. ef_finetune_restart (default on) gives the
    # quantized phase a fresh optimizer: full LR, fresh moments, cosine
    # spanning the remaining epochs.
    ft_optimizer = optimizer
    if ef_warmup > 0 and getattr(config, "ef_finetune_restart", True):

        class _FtCfg:  # config may be a module; delegate, override epochs
            def __getattr__(self, name):
                if name == "max_epochs":
                    return int(getattr(config, "max_epochs", 1)) - ef_warmup
                return getattr(config, name)

        ft_optimizer = create_optimizer(_FtCfg(), steps_per_epoch)

    def opt_for(epoch: int):
        return optimizer if epoch < ef_warmup else ft_optimizer

    # Knowledge distillation from a frozen float checkpoint
    # (config.distill_from). Format-ceiling oracle experiment: train the
    # engine_friendly student against the unconstrained float teacher's
    # soft targets to measure the best accuracy the deployment format's
    # 7-level activations can carry (VERDICT r2 next-round item 2.ii).
    distill_kwargs: dict = {}
    distill_from = getattr(config, "distill_from", None)
    if distill_from:
        import sys as _sys
        from pathlib import Path as _Path

        _sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))
        from serialize import load_checkpoint_auto

        t_type, t_params, t_stats, t_cfg = load_checkpoint_auto(
            _Path(distill_from)
        )
        if t_type != model_type:
            raise ValueError(
                f"distill_from checkpoint is a {t_type} model; "
                f"training a {model_type}"
            )
        distill_kwargs = {
            "teacher_cfg": t_cfg,
            "teacher_params": jax.device_put(t_params),
            "teacher_stats": jax.device_put(t_stats)
            if t_stats is not None else None,
            "distill_alpha": float(getattr(config, "distill_alpha", 0.5)),
            "distill_temp": float(getattr(config, "distill_temp", 4.0)),
        }
        early_log(
            f"distilling from {distill_from} "
            f"(alpha={distill_kwargs['distill_alpha']}, "
            f"T={distill_kwargs['distill_temp']})"
        )

    start_epoch = 0
    if orbax_ckpt is not None and getattr(config, "resume", False):
        latest = orbax_ckpt.latest_step()
        if latest is not None:
            restored, meta = orbax_ckpt.restore(
                latest,
                target={
                    "params": state.params,
                    "opt_state": state.opt_state,
                    "batch_stats": state.batch_stats,
                },
            )
            state = state._replace(
                params=restored["params"],
                opt_state=restored["opt_state"],
                batch_stats=restored["batch_stats"],
            )
            start_epoch = int(meta.get("epoch", latest)) + 1
            best_val_f1 = float(meta.get("best_val_f1", 0.0))
            early_log(
                f"resumed from orbax step {latest} → epoch {start_epoch} "
                f"(best val F1 so far {best_val_f1:.4f})"
            )

    # Device-resident input pipeline: when the training set fits in HBM,
    # upload it ONCE and gather batches by index on device — per-step host
    # traffic drops to a (B,) index vector. Under a data mesh the dataset is
    # replicated across chips and the index arrays are sharded over the data
    # axis, so each chip gathers only its batch shard from its local copy
    # (GSPMD keeps the gather local; grads still psum over ICI).
    device_data = None
    _shard_idx = lambda idx: idx  # noqa: E731 — identity off-mesh
    ds = train_loader.dataset
    dataset_bytes = ds.images.nbytes + ds.labels.nbytes
    max_resident = int(getattr(config, "device_resident_max_bytes", 4 << 30))
    if dataset_bytes <= max_resident:
        if mesh is None:
            device_data = (
                jax.device_put(ds.images),
                jax.device_put(ds.labels),
            )
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            device_data = replicate(mesh, (ds.images, ds.labels))
            _batch_shardings = {
                1: NamedSharding(mesh, P("data")),       # (B,) single step
                2: NamedSharding(mesh, P(None, "data")),  # (K, B) scan chunk
            }

            def _shard_idx(idx):
                return jax.device_put(
                    np.asarray(idx), _batch_shardings[np.ndim(idx)]
                )

        early_log(
            f"training set resident on device ({dataset_bytes / 1e6:.1f} MB"
            + (f", replicated over {mesh.devices.size} chips)" if mesh else ")")
        )

    # Fused Pallas input path (ops/input_pipeline.py): gather + flip +
    # brightness/contrast + cutout + normalize collapse into ONE kernel per
    # step with all randomness hoisted out of the scan body — the
    # dispatch-floor fix from docs/TRAIN_ROOFLINE.md. Distribution-identical
    # to the light tier (different RNG stream). Production-on for the
    # flagship NNUE light-tier config; config.fused_input_pipeline=False
    # opts out. Costs one extra dataset copy in HBM (the W-flipped half).
    gather_data = None
    fused_interpret = False
    if (
        device_data is not None
        # the fused path holds a 2× (flipped+padded) gather copy in HBM on
        # top of the resident original — gate on ~3× the dataset bytes so a
        # near-limit dataset can't OOM the chip at startup (ADVICE r4)
        and 3 * dataset_bytes <= max_resident
        and model_type == "nnue"
        and use_aug
        and strength == "light"
        and not distill_kwargs
        and bool(getattr(config, "fused_input_pipeline", True))
    ):
        from nnue_vision_tpu.ops.input_pipeline import prepare_gather_dataset

        fused_interpret = jax.devices()[0].platform != "tpu"
        if mesh is None:
            gather_data = prepare_gather_dataset(device_data[0])
        else:
            # replicate the gather copy like the resident dataset; the
            # fused step shard_maps the kernel over the data axis so each
            # chip gathers its batch shard locally (VERDICT r4 item 3)
            gather_data = replicate(mesh, prepare_gather_dataset(ds.images))
        early_log(
            "fused input pipeline active: one Pallas gather+augment+"
            "normalize kernel per step"
            + (" (interpret mode)" if fused_interpret else "")
            + (f" (shard_map over {mesh.devices.size} chips)" if mesh else "")
        )

    # Device-resident EVAL splits (single-device only; under a mesh the
    # eval inputs stay host-side so GSPMD placement is uniform). Uploading
    # the normalized split once and slicing on device removes the
    # train+2×val re-upload every epoch — both a speedup and the fix for
    # the tunneled-backend staging-buffer leak that OOM-killed 400-epoch
    # runs (~370 MB RSS/epoch on a 20k-image task).
    eval_train_loader, eval_val_loader, eval_test_loader = (
        train_loader, val_loader, test_loader,
    )
    # config.eval_train_samples: evaluate per-epoch train/epoch_* metrics
    # on only the first N train samples (an unbiased head for generated
    # splits) — the full-split train metric is diagnostic, not a
    # selection signal, and dominates eval dispatch count on big splits.
    # config.eval_batch_size: larger eval batches = fewer dispatches.
    eval_train_n = int(getattr(config, "eval_train_samples", 0) or 0)
    eval_bs = getattr(config, "eval_batch_size", None)
    if eval_train_n and eval_train_n < len(ds.labels):
        from nnue_vision_tpu.data.loaders import head_subset_loader

        eval_train_loader = head_subset_loader(train_loader, eval_train_n)
        early_log(
            f"train-split epoch metrics subsampled to {eval_train_n} samples"
        )
    if mesh is None:
        from nnue_vision_tpu.training.evaluate import maybe_resident

        eval_train_loader = maybe_resident(
            eval_train_loader, max_resident, eval_bs
        )
        eval_val_loader = maybe_resident(val_loader, max_resident, eval_bs)
        eval_test_loader = maybe_resident(test_loader, max_resident, eval_bs)

    # Steps fused per device dispatch on the resident path (lax.scan);
    # amortizes dispatch overhead, which dominates for these model sizes.
    steps_per_dispatch = int(getattr(config, "steps_per_dispatch", 8))

    # Optional profiler trace (upstream had only wall-clock timing;
    # SURVEY.md §5 tracing). Set config.profile_dir to capture a
    # jax.profiler trace of the first training epoch for xprof/tensorboard.
    profile_dir = getattr(config, "profile_dir", None)

    try:
        for epoch in range(start_epoch, max_epochs):
            if epoch == ef_warmup and ef_warmup > 0 and ft_optimizer is not optimizer:
                state = state._replace(opt_state=ft_optimizer.init(state.params))
                early_log(
                    f"quantizer switch at epoch {epoch}: optimizer restarted "
                    "(fresh moments, cosine over the fine-tune phase)"
                )
            if profile_dir and epoch == 0:
                jax.profiler.start_trace(str(profile_dir))
            epoch_start = time.perf_counter()
            losses = []

            if device_data is not None:
                idx_batches = list(train_loader.iter_indices())
                step_no = 0
                pos = 0
                while pos < len(idx_batches):
                    chunk = idx_batches[pos : pos + steps_per_dispatch]
                    rng, aug_key = jax.random.split(rng)
                    if len(chunk) == steps_per_dispatch and len(chunk) > 1:
                        if gather_data is not None:
                            state, metrics = scanned_train_steps_fused(
                                state, gather_data, device_data[1],
                                _shard_idx(np.stack(chunk)), aug_key,
                                model_type=model_type,
                                model_cfg=cfg_for(epoch),
                                optimizer=opt_for(epoch),
                                height=int(ds.images.shape[1]),
                                width=int(ds.images.shape[2]),
                                interpret=fused_interpret,
                                mesh=mesh,
                            )
                        else:
                            state, metrics = scanned_train_steps(
                                state, device_data[0], device_data[1],
                                _shard_idx(np.stack(chunk)), aug_key,
                                model_type=model_type, model_cfg=cfg_for(epoch),
                                optimizer=opt_for(epoch), strength=strength,
                                augment=use_aug, **distill_kwargs,
                            )
                        chunk_losses = np.asarray(metrics["loss"])
                    else:
                        chunk_losses = []
                        for idx in chunk:
                            rng, k = jax.random.split(rng)
                            state, metrics = gathered_train_step(
                                state, device_data[0], device_data[1],
                                _shard_idx(idx), k,
                                model_type=model_type, model_cfg=cfg_for(epoch),
                                optimizer=opt_for(epoch), strength=strength,
                                augment=use_aug, **distill_kwargs,
                            )
                            chunk_losses.append(float(metrics["loss"]))
                    for loss in chunk_losses:
                        loss = float(loss)
                        losses.append(loss)
                        run.log(
                            {"train/loss": loss},
                            step=epoch * steps_per_epoch + step_no,
                        )
                        step_no += 1
                    pos += len(chunk)
            else:
                for batch_idx, batch in enumerate(train_loader):
                    rng, aug_key = jax.random.split(rng)
                    images, labels = batch
                    if mesh is not None:
                        images, labels = shard_batch(mesh, (images, labels))
                    x = preprocess_batch(
                        aug_key, images, strength=strength, augment=use_aug
                    )
                    state, metrics = train_step(
                        state, x, labels,
                        model_type=model_type, model_cfg=cfg_for(epoch),
                        optimizer=opt_for(epoch), **distill_kwargs,
                    )
                    loss = float(metrics["loss"])
                    losses.append(loss)
                    run.log(
                        {"train/loss": loss},
                        step=epoch * steps_per_epoch + batch_idx,
                    )

            if profile_dir and epoch == 0:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                early_log(f"profiler trace written to {profile_dir}")

            # Fail fast with diagnostics on numerical blow-up
            # (training_utils.py:356-370 upstream philosophy).
            if losses and not np.isfinite(losses[-1]):
                from nnue_vision_tpu.training.utils import check_for_nonfinite

                detail = check_for_nonfinite(state.params, where="params")
                raise FloatingPointError(
                    f"non-finite training loss at epoch {epoch + 1}: "
                    f"{losses[-1]}; {detail or 'params finite — loss path'}"
                )

            train_loss, train_metrics = evaluate_model(
                state.params, state.batch_stats, eval_train_loader,
                model_type=model_type, model_cfg=cfg_for(epoch),
            )
            val_loss, val_metrics = evaluate_model(
                state.params, state.batch_stats, eval_val_loader,
                model_type=model_type, model_cfg=cfg_for(epoch),
            )
            if compiled_backend == "engine":
                compiled_metrics = evaluate_compiled_model(
                    state.params, state.batch_stats, val_loader,
                    model_type=model_type, model_cfg=cfg_for(epoch),
                )
            else:
                compiled_metrics = evaluate_int8_sim(
                    state.params, state.batch_stats, eval_val_loader,
                    model_type=model_type, model_cfg=cfg_for(epoch),
                    use_pallas=(
                        "mega" if (compiled_backend == "mega"
                                   and model_type == "nnue")
                        else (compiled_backend == "pallas"
                              and model_type == "nnue")
                    ),
                )

            log_data = {
                "train/epoch_loss": train_loss,
                "train/epoch_f1": train_metrics["f1"],
                "train/epoch_accuracy": train_metrics["acc"],
                "val/loss": val_loss,
                "val/f1": val_metrics["f1"],
                "val/accuracy": val_metrics["acc"],
                "compiled/f1": compiled_metrics["f1"],
                "compiled/accuracy": compiled_metrics["acc"],
                "compiled/ms_per_sample": compiled_metrics.get("ms_per_sample", 0.0),
                "compiled/latent_density": compiled_metrics.get("latent_density", 0.0),
            }
            run.log(log_data, step=(epoch + 1) * steps_per_epoch - 1)
            early_log(
                f"Epoch {epoch + 1}/{max_epochs} [{time.perf_counter() - epoch_start:.1f}s] - "
                f"train loss {train_loss:.4f} f1 {train_metrics['f1']:.4f} | "
                f"val loss {val_loss:.4f} f1 {val_metrics['f1']:.4f} acc {val_metrics['acc']:.4f} | "
                f"compiled f1 {compiled_metrics['f1']:.4f} "
                f"acc {compiled_metrics['acc']:.4f} "
                f"density {compiled_metrics.get('latent_density', 0.0):.4f}"
            )

            # during an ef warmup the float-phase model is not the
            # deployable function — best-F1 checkpointing applies only to
            # epochs training the final (engine_friendly) config.
            # checkpoint_metric="compiled_f1" ranks epochs by the DEPLOYED
            # (int8 engine-arithmetic) F1 instead of upstream's float val
            # gate — on long QAT runs the two rank epochs differently by
            # up to ~0.7 pt of compiled accuracy (PARITY.md, 400-epoch run)
            gate_f1 = (
                compiled_metrics["f1"]
                if getattr(config, "checkpoint_metric", "val_f1")
                == "compiled_f1"
                else val_metrics["f1"]
            )
            is_new_best = epoch >= ef_warmup and gate_f1 > best_val_f1

            if orbax_ckpt is not None:
                # async: returns immediately, write overlaps the next epoch.
                # best_val_f1 (including this epoch if it is the new best)
                # rides in the metadata so resume does not reset the
                # best-model gate and overwrite a better artifact.
                orbax_ckpt.save(
                    epoch,
                    params=state.params,
                    opt_state=state.opt_state,
                    batch_stats=state.batch_stats,
                    metadata={
                        "model_type": model_type,
                        "epoch": epoch,
                        "val_f1": float(val_metrics["f1"]),
                        "best_val_f1": float(
                            max(best_val_f1, gate_f1)
                            if is_new_best else best_val_f1
                        ),
                    },
                )

            if is_new_best:
                best_val_f1 = gate_f1
                manager.save_best(
                    model_type=model_type,
                    model_config=model_cfg,
                    params=state.params,
                    batch_stats=state.batch_stats,
                    opt_state=state.opt_state,
                    epoch=epoch,
                    metrics={
                        "val_f1": val_metrics["f1"],
                        "val_loss": val_loss,
                        "compiled_f1": compiled_metrics["f1"],
                    },
                    config_name=getattr(config, "name", ""),
                )

        test_loss, test_metrics = evaluate_model(
            state.params, state.batch_stats, eval_test_loader,
            model_type=model_type, model_cfg=model_cfg,
        )
        run.log({"test/f1": test_metrics["f1"], "test/loss": test_loss})
        early_log(
            f"Test: loss {test_loss:.4f} f1 {test_metrics['f1']:.4f} "
            f"acc {test_metrics['acc']:.4f}"
        )
    finally:
        if orbax_ckpt is not None:
            orbax_ckpt.close()  # block until async writes are durable
        run.finish()
        if not getattr(config, "keep_alive", False):
            stop_cloud("training finished")

    return 0

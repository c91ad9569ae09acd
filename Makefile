# Convenience entry points. Everything here is also runnable directly.

.PHONY: test test-fast test-comprehensive bench real-data-eval engine \
	anchor-etinynet anchor-nnue \
	engine-speed

test:
	python -m pytest tests/ -x -q

test-fast:
	python run_fast_tests.py

# Builds our engine AND the unmodified reference engine, runs every
# suite including the bit-exact upstream interchange tests (which fail
# loudly rather than skip if the reference build is missing).
test-comprehensive:
	python run_comprehensive_tests.py

bench:
	python bench.py

engine:
	cmake -S engine -B engine/build -DCMAKE_BUILD_TYPE=Release
	cmake --build engine/build --parallel

# Paired C++ engine speed measurement vs the unmodified reference
# (builds both, times identical serialized models + images; prints the
# table — docs/SPEED_PARITY.md is curated by hand from these runs, so
# no --out here: it would overwrite the analysis sections). CPU-only —
# safe while the TPU is busy or down.
engine-speed:
	env -u PALLAS_AXON_POOL_IPS python scripts/engine_speed_parity.py \
		--images 32 --iters 200

# Real-data accuracy drill: trains both flagship configs on CIFAR-10
# (NV_DATA_DIR=<dir with cifar-10-python.tar.gz> on air-gapped hosts)
# and writes docs/REAL_DATA_RESULTS.md vs the reference README claims.
# NV_EVAL_EPOCHS=<n> shortens the schedules for a smoke drill.
real-data-eval:
	python scripts/real_data_eval.py

# Cross-framework accuracy anchor, EtinyNet cell (PARITY.md): the
# reference's own EtinyNet trainer (one documented crash-bug dedent) vs
# our framework on the identical 5k-sample synthetic-hard task at the
# identical 60-epoch budget. The reference side is CPU torch (~20 min);
# ours runs on the TPU (~2 min). SEED=43 etc. varies the matched pair.
SEED ?= 42
anchor-etinynet:
	python scripts/reference_anchor.py --workdir /tmp/ref_anchor_etiny_$(SEED) \
		--model etinynet --epochs 60 --train-size 5000 --test-size 500 \
		--seed $(SEED)
	python train.py etinynet --config config/train_etinynet_anchor_budget.py \
		--seed $(SEED)

# bfloat16 mixed-precision validation on the same cell (PARITY.md round 5):
# ours only — compares against the f32 rows the target above produces.
anchor-etinynet-bf16:
	python train.py etinynet --config config/train_etinynet_anchor_bf16.py \
		--seed $(SEED)

# NNUE cell (the round-4 headline anchor): reference production
# hyperparameters on both sides. The reference flatlines at chance on
# this task (SGD and Adam); the EtinyNet cell above is the one where it
# demonstrably learns, validating the shared dependency stand-ins.
anchor-nnue:
	python scripts/reference_anchor.py --workdir /tmp/ref_anchor_$(SEED) \
		--epochs 30 --test-size 1000 --seed $(SEED)
	python train.py nnue --config config/train_nnue_anchor_budget.py \
		--seed $(SEED)

# Convenience entry points. Everything here is also runnable directly.

.PHONY: test test-fast test-comprehensive bench real-data-eval engine \
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

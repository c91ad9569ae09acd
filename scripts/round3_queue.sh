#!/bin/bash
# Round-3 TPU experiment queue: format-ceiling oracles first, then the
# seed/variant variance study (VERDICT r2 items 2 and 6). Strictly
# sequential — the TPU is single-tenant. Each run is bounded by timeout;
# a failure logs and continues. NV_QUEUE_DEADLINE (epoch seconds) stops
# starting new runs past the deadline so the driver's end-of-round bench
# still gets the chip.

cd /root/repo || exit 1
DEADLINE="${NV_QUEUE_DEADLINE:-0}"
LOG=logs/round3_queue.log
echo "=== queue start $(date) deadline=$DEADLINE ===" >> "$LOG"

run() {
    if [ "$DEADLINE" != "0" ] && [ "$(date +%s)" -gt "$DEADLINE" ]; then
        echo "SKIP (deadline): $*" >> "$LOG"
        return
    fi
    echo "=== START $(date +%H:%M:%S): $*" >> "$LOG"
    timeout "$1" python train.py "${@:2}" >> "$LOG" 2>&1
    rc=$?
    echo "=== END   $(date +%H:%M:%S) rc=$rc: $*" >> "$LOG"
}

# --- format-ceiling oracles (PARITY.md measured-ceiling table) ---
run 14400 etinynet --config config/train_etinynet_hard_ext.py
run 6000  etinynet --config config/train_etinynet_distill.py
run 6000  etinynet --config config/train_etinynet_hard_scratch.py

# --- variance study: 60-epoch budget, 2 models × (variant A seeds
# 42/43/44 + variant B seeds 42/43). Variant B = a different generator
# class_seed (new atom dictionary + signatures), same difficulty recipe.
for seed in 42 43 44; do
    run 2400 nnue --config config/train_nnue_hard.py --max_epochs 60 \
        --seed "$seed" --name_suffix "varA_s${seed}"
done
for seed in 42 43; do
    run 2400 nnue --config config/train_nnue_hard.py --max_epochs 60 \
        --seed "$seed" --synthetic_class_seed 9999 \
        --name_suffix "varB_s${seed}"
done
for seed in 42 43 44; do
    run 3000 etinynet --config config/train_etinynet_hard.py --max_epochs 60 \
        --seed "$seed" --name_suffix "varA_s${seed}"
done
for seed in 42 43; do
    run 3000 etinynet --config config/train_etinynet_hard.py --max_epochs 60 \
        --seed "$seed" --synthetic_class_seed 9999 \
        --name_suffix "varB_s${seed}"
done

echo "=== queue done $(date) ===" >> "$LOG"

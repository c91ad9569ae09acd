#!/bin/bash
# Round-3 queue, part 3: the seed/variant variance study (VERDICT r2
# item 6), interleaved across model families so the deadline cuts tails
# evenly. Replaces queue2: the 7-level-from-scratch oracle is DROPPED —
# the extended run already measured compiled 0.9529 (> the 0.9514 float
# ceiling), so the format-ceiling question is answered by oracles (i)
# extended schedule and (ii) distillation; a third method adds nothing.
#
# Runs pick up the resident-eval leak fix and the eval-cost knobs
# (eval_train_samples/eval_batch_size) committed 2026-08-17 — expected
# ~25-35% shorter epochs than the earlier hard runs.

cd /root/repo || exit 1
DEADLINE="${NV_QUEUE_DEADLINE:-0}"
LOG=logs/round3_queue.log
echo "=== queue3 start $(date) deadline=$DEADLINE ===" >> "$LOG"

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

for seed in 42 43 44; do
    run 2400 nnue --config config/train_nnue_hard.py --max_epochs 60 \
        --seed "$seed" --name_suffix "varA_s${seed}"
    run 3000 etinynet --config config/train_etinynet_hard.py --max_epochs 60 \
        --seed "$seed" --name_suffix "varA_s${seed}"
done
for seed in 42 43; do
    run 2400 nnue --config config/train_nnue_hard.py --max_epochs 60 \
        --seed "$seed" --synthetic_class_seed 9999 \
        --name_suffix "varB_s${seed}"
    run 3000 etinynet --config config/train_etinynet_hard.py --max_epochs 60 \
        --seed "$seed" --synthetic_class_seed 9999 \
        --name_suffix "varB_s${seed}"
done

echo "=== queue3 done $(date) ===" >> "$LOG"

#!/bin/bash
# Round-3 queue, part 2 (launched manually after the distillation run):
# the 7-level-from-scratch oracle, then the variance study INTERLEAVED
# across model families so the deadline cuts tails evenly instead of
# dropping one family wholesale.

cd /root/repo || exit 1
DEADLINE="${NV_QUEUE_DEADLINE:-0}"
LOG=logs/round3_queue.log
echo "=== queue2 start $(date) deadline=$DEADLINE ===" >> "$LOG"

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

run 6000 etinynet --config config/train_etinynet_hard_scratch.py

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

echo "=== queue2 done $(date) ===" >> "$LOG"

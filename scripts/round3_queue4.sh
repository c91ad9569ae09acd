#!/bin/bash
# Round-3 queue, part 4 — runs after the variance study. The resident-eval
# + eval-knob fixes cut epochs from ~21-27s to ~1-1.5s, so the remaining
# chip budget fits the long compiled-gated runs AND the from-scratch
# oracle AND extra variance seeds:
#   1. etinynet 400-epoch progressive, compiled_f1 gate → ceiling ARTIFACT
#   2. nnue 300-epoch QAT, compiled_f1 gate → does NNUE's 0.9178 move?
#   3. 7-level-from-scratch oracle (iii), now ~10 min
#   4. extra variance seeds (varA s45/s46, varB s44) both families

cd /root/repo || exit 1
DEADLINE="${NV_QUEUE_DEADLINE:-0}"
LOG=logs/round3_queue.log
echo "=== queue4 start $(date) deadline=$DEADLINE ===" >> "$LOG"

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

run 3000 etinynet --config config/train_etinynet_hard_ext2.py
run 2400 nnue --config config/train_nnue_hard_long.py
run 1800 etinynet --config config/train_etinynet_hard_scratch.py

for seed in 45 46; do
    run 1200 nnue --config config/train_nnue_hard.py --max_epochs 60 \
        --seed "$seed" --name_suffix "varA_s${seed}"
    run 1200 etinynet --config config/train_etinynet_hard.py --max_epochs 60 \
        --seed "$seed" --name_suffix "varA_s${seed}"
done
run 1200 nnue --config config/train_nnue_hard.py --max_epochs 60 \
    --seed 44 --synthetic_class_seed 9999 --name_suffix "varB_s44"
run 1200 etinynet --config config/train_etinynet_hard.py --max_epochs 60 \
    --seed 44 --synthetic_class_seed 9999 --name_suffix "varB_s44"

echo "=== queue4 done $(date) ===" >> "$LOG"

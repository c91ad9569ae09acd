#!/bin/bash
# Round-3 queue, part 5 — post threshold-fix re-runs. The QAT forward now
# trains against the serialized SCALAR threshold (mean-collapse, matching
# nnue_quantize); re-run the run that collapsed under the old per-channel
# semantics (varB_s44: compiled f1 0.90 -> 0.44 at epoch 37) and the
# flagship compiled-gated long run, which the tighter train/deploy tie
# may improve.

cd /root/repo || exit 1
DEADLINE="${NV_QUEUE_DEADLINE:-0}"
LOG=logs/round3_queue.log
echo "=== queue5 start $(date) deadline=$DEADLINE ===" >> "$LOG"

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

run 1200 nnue --config config/train_nnue_hard.py --max_epochs 60 \
    --seed 44 --synthetic_class_seed 9999 --name_suffix "varB_s44_fix"
run 2400 nnue --config config/train_nnue_hard_long.py --name_suffix "fix"

echo "=== queue5 done $(date) ===" >> "$LOG"

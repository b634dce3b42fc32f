#!/bin/bash
# Round-5 hard-mode convergence run (VERDICT r4 next #7): the r4 proof used
# 192 images whose depth is a smooth function of color — it validated the
# system but not optimization health at reference difficulty. This drives
# the real CLI on 2048 multi-factor scenes (ground-plane geometry +
# perspective object size + texture gradient; COLOR IS A DISTRACTOR —
# constant-predictor abs_rel floor ~0.69) long enough to plateau, so
# best-vs-latest checkpoint selection means something.
#
# Usage: bash scripts/run_hard_convergence_tpu.sh /tmp/synth_hard
set -u
ROOT=${1:-/tmp/synth_hard}
LOG=${LOG:-/tmp/hard_convergence_r5.log}
BS=16
EPOCHS=${EPOCHS:-18}    # 2048/16 = 128 steps/epoch -> 2304 steps

cd /root/repo
echo "=== hard convergence: dataset (2048 scenes) ===" | tee $LOG
python scripts/make_synthetic_nyu.py $ROOT --hard --n-train 2048 --n-eval 64 \
    --bs $BS --epochs $EPOCHS --validate-every 200 --name synth_hard \
    >> $LOG 2>&1 || exit 1

echo "=== hard convergence: train ===" >> $LOG
timeout 28800 python train.py $ROOT/params.txt >> $LOG 2>&1
echo "=== train exit: $? ===" >> $LOG

python scripts/analyze_convergence.py "$ROOT/runs/synth_hard" \
    --bs $BS --validate-every 200 --no-kill | tee -a $LOG

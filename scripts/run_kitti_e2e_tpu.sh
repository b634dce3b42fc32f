#!/bin/bash
# Round-5 KITTI end-to-end smoke (VERDICT r4 next #6): kb_crop + use_right +
# depth/256 + garg-crop had only composed in unit tests; this runs the full
# CLI chain in KITTI mode on a synthetic-but-learnable KITTI-format tree:
#   1. build the tree (scripts/make_synthetic_kitti.py),
#   2. short `python train.py params.txt` run on TPU (352x704 crops, bs8),
#   3. `python evaluate.py params.txt --checkpoint_path <latest> --save_dir`
#      over the 375x1242 eval frames incl. the 16-bit png dump path
#      (reference evaluate.py:134-150).
# The analyzer checks loss-down + abs_rel improving; the eval leg checks the
# 9-metric table prints and pngs exist.
#
# Usage: bash scripts/run_kitti_e2e_tpu.sh /tmp/synth_kitti
set -u
ROOT=${1:-/tmp/synth_kitti}
LOG=${LOG:-/tmp/kitti_e2e_r5.log}
EPOCHS=${EPOCHS:-25}

cd /root/repo
echo "=== kitti e2e: dataset ===" | tee $LOG
python scripts/make_synthetic_kitti.py $ROOT --n-train 128 --n-eval 8 \
    --bs 8 --epochs $EPOCHS --validate-every 100 >> $LOG 2>&1 || exit 1

echo "=== kitti e2e: train ($EPOCHS epochs x 16 steps) ===" >> $LOG
timeout 10800 python train.py $ROOT/params.txt >> $LOG 2>&1
echo "=== train exit: $? ===" >> $LOG
python scripts/analyze_convergence.py "$ROOT/runs/synth_kitti" \
    --bs 8 --no-kill | tee -a $LOG

CKPT=$(ls -dt $ROOT/runs/synth_kitti/*_latest | head -1)
echo "=== kitti e2e: evaluate w/ png dump ($CKPT) ===" >> $LOG
timeout 5400 python evaluate.py $ROOT/params_eval.txt \
    --checkpoint_path "$CKPT" --save_dir $ROOT/pred_dump >> $LOG 2>&1
echo "=== eval exit: $? ===" >> $LOG
echo "=== dumped predictions: $(find $ROOT/pred_dump -name '*.png' | wc -l) ===" >> $LOG
tail -5 $LOG

#!/bin/bash
# Round-5 detector train->eval composition (VERDICT r4 next #5): show the
# rebuilt Swin-B Cascade Mask R-CNN trainer MOVES mAP, not just loss:
#   1. tiny learnable COCO set (scripts/make_synthetic_coco.py),
#   2. eval the RANDOM-INIT checkpoint -> mAP_before (~0),
#   3. train N steps at a pinned reduced scale (one compiled program),
#   4. eval the trained checkpoint -> mAP_after; require after > before.
# Reference capability: Swin.../tools/{train,test}.py with the ade20k config
# (configs/swin/cascade_..._ade20k.py:127-139).
#
# Usage: bash scripts/run_detector_map_tpu.sh /tmp/synth_coco [STEPS]
set -u
ROOT=${1:-/tmp/synth_coco}
STEPS=${2:-1200}
LOG=${LOG:-/tmp/detector_map_r5.log}
SCALE=320,400

cd /root/repo
echo "=== detector map: dataset ===" | tee $LOG
python scripts/make_synthetic_coco.py $ROOT --n 12 --hw 320,400 >> $LOG 2>&1 || exit 1

echo "=== detector map: baseline ckpt (0 steps) ===" >> $LOG
timeout 3600 python scripts/train_detector.py --images $ROOT/images \
    --annotations $ROOT/inst.json --num-classes 2 --max-gt 8 \
    --fixed-scale $SCALE --epochs 1 --max-steps 1 --lr 0 \
    --out $ROOT/run0 >> $LOG 2>&1 || { echo BASELINE-TRAIN FAILED >> $LOG; exit 1; }

echo "=== detector map: eval before ===" >> $LOG
timeout 3600 python scripts/eval_detector.py --images $ROOT/images \
    --annotations $ROOT/inst.json --num-classes 2 \
    --max-long 400 --max-short 320 \
    --checkpoint $(ls -dt $ROOT/run0/detector_latest* | head -1) \
    2>&1 | tee -a $LOG | tail -3

echo "=== detector map: train $STEPS steps ===" >> $LOG
timeout 14400 python scripts/train_detector.py --images $ROOT/images \
    --annotations $ROOT/inst.json --num-classes 2 --max-gt 8 \
    --fixed-scale $SCALE --epochs 200 --max-steps $STEPS --lr 1e-4 \
    --log-every 50 --out $ROOT/run1 >> $LOG 2>&1 || { echo TRAIN FAILED >> $LOG; exit 1; }

echo "=== detector map: eval after ===" >> $LOG
timeout 3600 python scripts/eval_detector.py --images $ROOT/images \
    --annotations $ROOT/inst.json --num-classes 2 \
    --max-long 400 --max-short 320 \
    --checkpoint $(ls -dt $ROOT/run1/detector_latest* | head -1) \
    2>&1 | tee -a $LOG | tail -3
echo "=== detector map: done (compare the two mAP lines above) ===" >> $LOG

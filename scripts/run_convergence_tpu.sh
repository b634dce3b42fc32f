#!/bin/bash
# The round-4 convergence run (VERDICT r3 next #1): drive the REAL CLI
# (`python train.py params.txt`) on the synthetic-but-learnable NYU-format
# dataset on TPU, SIGKILL it mid-run once >=3 validations and >=320 steps
# are in the log, resume with `--resume latest`, and analyze the JSONL for
# (a) train SILog down, (b) val abs_rel improving, (c) best-checkpoint
# firing, (d) the resume continuing the schedule.
#
# Usage: bash scripts/run_convergence_tpu.sh /tmp/synth_nyu
set -u
ROOT=${1:-/tmp/synth_nyu}
LOG=/tmp/convergence_r4.log
EXP_DIR=$ROOT/runs/synth_convergence
EV=$EXP_DIR/events.jsonl

cd /root/repo
echo "=== leg 1: fresh run (adaptive mid-run kill) ===" | tee $LOG
python train.py $ROOT/params.txt >> $LOG 2>&1 &
PID=$!
for i in $(seq 1 720); do   # cap 2h
    sleep 10
    kill -0 $PID 2>/dev/null || break
    if [ -f "$EV" ]; then
        # NB grep -c prints "0" itself on no-match (exit 1) — appending
        # `|| echo 0` would yield "0\n0" and break the -ge tests below
        STEPS=$(grep -c '"Train/Loss"' "$EV" 2>/dev/null); STEPS=${STEPS:-0}
        VALS=$(grep -c '"Metrics/abs_rel"' "$EV" 2>/dev/null); VALS=${VALS:-0}
        if [ "$STEPS" -ge 64 ] && [ "$VALS" -ge 3 ]; then   # 64 logs = 320 steps
            echo "=== killing leg 1 at ~$((STEPS*5)) steps, $VALS validations ===" >> $LOG
            kill -9 $PID
            break
        fi
    fi
done
wait $PID 2>/dev/null
echo "=== leg 1 done ===" >> $LOG

echo "=== leg 2: resume latest ===" >> $LOG
timeout 7200 python train.py $ROOT/params.txt --resume latest >> $LOG 2>&1
echo "=== leg 2 exit: $? ===" >> $LOG

python scripts/analyze_convergence.py "$EXP_DIR" | tee -a $LOG

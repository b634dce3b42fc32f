#!/usr/bin/env bash
# Crash-restart loop (capability of the reference's
# keep_resuming_until_success.sh:1-12): rerun training with --resume latest
# until it exits cleanly. Unlike the reference there is no pkill between
# tries — one process drives the TPU, and orbax checkpoints restore the full
# train state (params, optimizer, step).
#
# Usage: scripts/keep_resuming_until_success.sh params/args_train_nyu_....txt
set -u
PARAMS="$1"
until python train.py "$PARAMS" --resume latest; do
    echo "training crashed with exit $? — resuming from latest checkpoint" >&2
    sleep 5
done

#!/bin/bash
# Chunked long-run training: run N epochs per process invocation, resuming
# from the last checkpoint between chunks.
#
# Why: dev hosts whose TPU is reached through the axon tunnel leak the full
# host staging buffer on EVERY host->device upload (measured ~6.5 MB/step for
# a thin-wire 256^2 batch-8 training step; no Python-side workaround), so a
# multi-hour run eventually OOMs the host. Restarting the process every few
# epochs bounds the leak; the persistent jax compile cache makes restarts
# cost seconds, and `--weights <last>` restores params and continues the
# epoch numbering (cli/run.py:336-340). On production TPU hosts (direct PCIe)
# this wrapper is unnecessary but harmless.
#
# Usage: train_chunked.sh TARGET_EPOCHS LOGS_DIR CHUNK -- <cli/run.py train args...>
#   e.g. train_chunked.sh 20 /tmp/run 3 -- --dataloader datalist_json \
#          --datalist train.dat --imgsize 256 --backbone resnet101 ...
set -u
TARGET=$1; LOGS=$2; CHUNK=$3; shift 3
[ "${1:-}" == "--" ] && shift
mkdir -p "$LOGS"
while true; do
  last=$(ls -d "$LOGS"/mask_rcnn_*_[0-9]* 2>/dev/null | sort | tail -1)
  if [ -n "$last" ]; then
    ep=$(basename "$last" | sed 's/.*_0*//'); resume=(--weights "$last")
  else
    ep=0; resume=()
  fi
  if [ "$ep" -ge "$TARGET" ]; then echo "done at epoch $ep"; break; fi
  todo=$(( TARGET - ep )); n=$(( todo < CHUNK ? todo : CHUNK ))
  echo "=== epoch $ep -> $(( ep + n )) ==="
  python -m caesar_mrcnn_tpu.cli.run train --nepochs "$n" --logs "$LOGS" \
    "${resume[@]}" "$@"
  rc=$?
  newlast=$(ls -d "$LOGS"/mask_rcnn_*_[0-9]* 2>/dev/null | sort | tail -1)
  if [ "$newlast" == "${last:-}" ]; then
    echo "no checkpoint progress (exit $rc); aborting"; exit 1
  fi
done

#!/bin/bash
# QUALITY_r04 pipeline: reproduce the round-3 training recipe end-to-end and
# evaluate at the 512^2 benchmark resolution (VERDICT r3 item 7).
#
# Stages (each idempotent — reruns skip completed work):
#   0. synthetic surveys (deterministic seeds; skipped if datalist.dat exists)
#        256^2 train: 16,000 imgs seed 100 + round-3 sidelobe-rate knobs
#        256^2 test :    400 imgs seed 900, default physics
#        512^2 train:  4,000 imgs seed 150 + knobs
#        512^2 test :    400 imgs seed 950, default physics
#   A. 20 epochs @256^2 (chunked: the axon tunnel leaks every upload —
#      see CLAUDE.md — so long runs restart the process every few epochs)
#   B. +3 fine-tune epochs @512^2 from the 256^2 epoch-20 checkpoint
#      (seeded by copying the checkpoint into the 512 logs dir so
#      train_chunked.sh resumes from it; epochs continue 21..23)
#   C. test @512^2 at the reference operating point (scoreThr 0.7, IoU 0.6)
#   D. test again at scoreThr 0.05 (full scored dump for the sweep)
#   E. VOC AP + PR curves (eval_voc) and the score-threshold operating
#      curve for the sidelobe class (scripts/operating_curve.py)
#
# Recipe provenance: QUALITY_r03.md (reference scale = 16,439 real images,
# reference operating point: /root/reference/README.md:80-81).
set -eu
cd "$(dirname "$0")/.."

ROOT=${QUALITY_ROOT:-/tmp}
DS256=$ROOT/quality_r3          # same seeds as round 3 => comparable splits
DS512=$ROOT/quality_512
RUN256=$ROOT/quality_r4_run
RUN512=$ROOT/quality_512_run
EVAL=$ROOT/quality_r4_eval      # operating-point dump (scoreThr 0.7)
EVAL_LOW=$ROOT/quality_r4_eval_low  # full scored dump (scoreThr 0.05)

TRAIN_ARGS_COMMON=(--dataloader datalist_json --backbone resnet101
  --nimg_per_gpu 8 --max_gt_instances 64 --use_mini_mask --weight_classes
  --nthreads 4)

echo "=== stage 0: datasets ==="
python - <<'EOF'
from caesar_mrcnn_tpu.data.synthetic import write_survey
import os
ROOT = os.environ.get("QUALITY_ROOT", "/tmp")
KNOBS = dict(sidelobe_spoke_p=1.0, sidelobe_src_snr=15.0, sidelobe_arc_p=0.6)
for out, n, seed, size, kw in [
    (f"{ROOT}/quality_r3/train", 16000, 100, 256, KNOBS),
    (f"{ROOT}/quality_r3/test", 400, 900, 256, {}),
    (f"{ROOT}/quality_512/train", 4000, 150, 512, KNOBS),
    (f"{ROOT}/quality_512/test", 400, 950, 512, {}),
]:
    if os.path.exists(os.path.join(out, "datalist.dat")):
        print("exists:", out); continue
    write_survey(out, n, seed=seed, size=size, progress_every=1000, **kw)
    print("wrote:", out)
EOF

echo "=== stage A: 20 epochs @256^2 ==="
bash scripts/train_chunked.sh 20 "$RUN256" 3 -- \
  --datalist "$DS256/train/datalist.dat" --imgsize 256 \
  "${TRAIN_ARGS_COMMON[@]}"

echo "=== stage B: fine-tune to epoch 23 @512^2 ==="
mkdir -p "$RUN512"
if ! ls -d "$RUN512"/mask_rcnn_*_[0-9]* >/dev/null 2>&1; then
  seed_ckpt=$(ls -d "$RUN256"/mask_rcnn_*_0020 | tail -1)
  cp -r "$seed_ckpt" "$RUN512/"
fi
bash scripts/train_chunked.sh 23 "$RUN512" 2 -- \
  --datalist "$DS512/train/datalist.dat" --imgsize 512 \
  "${TRAIN_ARGS_COMMON[@]}"

FINAL=$(ls -d "$RUN512"/mask_rcnn_*_[0-9]* | sort | tail -1)
echo "final checkpoint: $FINAL"

run_eval () {  # $1 = outdir, $2 = scoreThr
  if [ -f "$1/map_summary.json" ]; then echo "exists: $1"; return; fi
  python -m caesar_mrcnn_tpu.cli.run test \
    --dataloader datalist_json --datalist "$DS512/test/datalist.dat" \
    --weights "$FINAL" --imgsize 512 --backbone resnet101 \
    --nimg_per_gpu 8 --scoreThr "$2" --iouThr 0.6 --logs "$1"
}

echo "=== stage C: test @512^2 scoreThr 0.7 ==="
run_eval "$EVAL" 0.7
echo "=== stage D: test @512^2 scoreThr 0.05 (sweep dump) ==="
run_eval "$EVAL_LOW" 0.05

echo "=== stage E: VOC AP + operating curve ==="
python -m caesar_mrcnn_tpu.cli.eval_voc -gt "$EVAL/groundtruths" \
  -det "$EVAL/detections" -sp "$EVAL/voc_results" --noplot || true
python scripts/operating_curve.py --gt "$EVAL_LOW/groundtruths" \
  --det "$EVAL_LOW/detections" --out "$EVAL_LOW/opcurve" --iou 0.6

echo "=== QUALITY_r04 pipeline complete ==="
echo "operating point artifacts: $EVAL (completeness/reliability CSVs, map_summary.json, voc_results)"
echo "sweep artifacts: $EVAL_LOW/opcurve (operating_curve.csv, pr_*.png, summary.json)"

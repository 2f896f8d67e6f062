#!/bin/bash
# QUALITY_r05 pipeline: round-4 recipe rerun + the round-5 additions
# (VERDICT r4 items 3, 4, 5):
#
#   0. synthetic surveys (identical seeds to r3/r4 => comparable splits)
#   A. 20 epochs @256^2 (chunked; tunnel upload leak, CLAUDE.md)
#   B. +3 fine-tune epochs @512^2 from the 256^2 epoch-20 checkpoint
#   C. test @512^2 at the REFERENCE operating point (scoreThr 0.7 global,
#      --scoreThrPerClass none) — comparable to QUALITY_r03/r04
#   C2. test @512^2 at the KNEE operating point (per-class sidelobe=0.9,
#      the productionized config default — VERDICT r4 item 4)
#   D. test @512^2 at scoreThr 0.05 (full scored dump for the sweep)
#   E. VOC AP + operating curve
#   F. proposal-budget trim A/B (VERDICT r4 item 3): reference point with
#      --pre_nms_limit 3000 --post_nms_rois_inference 512; mAP gate for
#      the bench adoption decision
#   G. sidelobe information-floor bound (VERDICT r4 item 5):
#      scripts/sidelobe_bound.py quantifies the detectability of missed
#      sidelobe GTs
set -eu
cd "$(dirname "$0")/.."

ROOT=${QUALITY_ROOT:-/tmp}
DS256=$ROOT/quality_r3
DS512=$ROOT/quality_512
RUN256=$ROOT/quality_r5_run
RUN512=$ROOT/quality_512_run_r5
EVAL=$ROOT/quality_r5_eval            # reference operating point
EVAL_KNEE=$ROOT/quality_r5_eval_knee  # per-class knee operating point
EVAL_LOW=$ROOT/quality_r5_eval_low    # full scored dump
EVAL_TRIM=$ROOT/quality_r5_eval_trim  # proposal-budget trim A/B

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

run_eval () {  # $1 = outdir, $2 = scoreThr, $3 = scoreThrPerClass, rest = extra
  local out=$1 thr=$2 perclass=$3; shift 3
  if [ -f "$out/map_summary.json" ]; then echo "exists: $out"; return; fi
  python -m caesar_mrcnn_tpu.cli.run test \
    --dataloader datalist_json --datalist "$DS512/test/datalist.dat" \
    --weights "$FINAL" --imgsize 512 --backbone resnet101 \
    --nimg_per_gpu 8 --scoreThr "$thr" --scoreThrPerClass "$perclass" \
    --iouThr 0.6 --logs "$out" "$@"
}

echo "=== stage C: reference operating point (scoreThr 0.7 global) ==="
run_eval "$EVAL" 0.7 none
echo "=== stage C2: knee operating point (sidelobe=0.9) ==="
run_eval "$EVAL_KNEE" 0.7 "sidelobe=0.9"
echo "=== stage D: scoreThr 0.05 dump for the sweep ==="
run_eval "$EVAL_LOW" 0.05 none
echo "=== stage F: proposal-budget trim A/B ==="
run_eval "$EVAL_TRIM" 0.7 none --pre_nms_limit 3000 --post_nms_rois_inference 512

echo "=== stage E: VOC AP + operating curve ==="
for d in "$EVAL" "$EVAL_KNEE" "$EVAL_TRIM"; do
  python -m caesar_mrcnn_tpu.cli.eval_voc -gt "$d/groundtruths" \
    -det "$d/detections" -sp "$d/voc_results" --noplot || true
done
python scripts/operating_curve.py --gt "$EVAL_LOW/groundtruths" \
  --det "$EVAL_LOW/detections" --out "$EVAL_LOW/opcurve" --iou 0.6

echo "=== stage G: sidelobe information-floor bound ==="
python scripts/sidelobe_bound.py --datalist "$DS512/test/datalist.dat" \
  --weights "$FINAL" --imgsize 512 --out "$EVAL/sidelobe_bound.json" || true

echo "=== QUALITY_r05 pipeline complete ==="

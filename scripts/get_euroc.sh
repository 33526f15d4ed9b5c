#!/usr/bin/env bash
# Download a EuRoC MAV sequence and run the offline ASL parity evaluation
# — one command wherever egress exists (this container has none; see
# PARITY.md for the committed synthetic acceptance run).
#
# Reference protocol: flame_offline_asl over V1_01_easy
# (scripts/Dockerfile:46-52, cfg/flame_offline_asl.yaml): Vicon ground
# truth (state_groundtruth_estimate0) + cam0, RFU world frame.
#
# Usage: scripts/get_euroc.sh [sequence] [out_dir] [frames]
set -euo pipefail

SEQ="${1:-V1_01_easy}"
OUT="${2:-/tmp/flame_euroc}"
FRAMES="${3:-500}"
URL="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/vicon_room1/$SEQ/$SEQ.zip"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

mkdir -p "$OUT"
cd "$OUT"

if [ ! -d "$SEQ/mav0" ]; then
  echo ">> downloading $SEQ"
  wget -q --show-progress "$URL"
  mkdir -p "$SEQ" && cd "$SEQ" && unzip -q "../$SEQ.zip" && cd ..
fi

echo ">> running offline evaluation ($FRAMES frames)"
PYTHONPATH="$REPO" python -m flame_ros_tpu.frontends.offline_runner \
  --dataset asl \
  --pose-path "$OUT/$SEQ/mav0/state_groundtruth_estimate0" \
  --rgb-path "$OUT/$SEQ/mav0/cam0" \
  --world-frame RFU \
  --frames "$FRAMES" \
  --out "$OUT/results_$SEQ"

echo ">> results: $OUT/results_$SEQ/stats.txt"
tail -3 "$OUT/results_$SEQ/stats.txt"

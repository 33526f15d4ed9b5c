#!/usr/bin/env bash
# Download a TUM RGB-D sequence, build associations, and run the offline
# parity evaluation — one command wherever egress exists (this container
# has none; see PARITY.md for the committed synthetic acceptance run).
#
# Reference protocol: flame_offline_tum (src/flame_offline_tum.cc:320-398)
# over fr3/long_office_household or fr3/structure_texture_far
# (README.md:139), depth-associated GT -> stats.txt with per-frame
# confusion matrix + idepth RMSE.
#
# Usage: scripts/get_tum.sh [sequence] [out_dir] [frames]
set -euo pipefail

SEQ="${1:-rgbd_dataset_freiburg3_structure_texture_far}"
OUT="${2:-/tmp/flame_tum}"
FRAMES="${3:-500}"
BASE_URL="https://cvg.cit.tum.de/rgbd/dataset/freiburg3"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

mkdir -p "$OUT"
cd "$OUT"

if [ ! -d "$SEQ" ]; then
  echo ">> downloading $SEQ"
  wget -q --show-progress "$BASE_URL/$SEQ.tgz"
  tar xzf "$SEQ.tgz"
fi

echo ">> building associations (pose + rgb + depth)"
PYTHONPATH="$REPO" python -c "
from flame_ros_tpu.datasets.tum import build_associations
lines = build_associations('$OUT/$SEQ', '$OUT/$SEQ/associations.txt')
print(f'associated {len(lines)} frames')
"

# TUM fr3 factory intrinsics (vision.in.tum.de/data/datasets/rgbd-dataset/
# file_formats); fr3 RGB is already undistorted to good approximation.
cat > "$OUT/$SEQ/kinect.yaml" <<'EOF'
image_width: 640
image_height: 480
camera_name: kinect_fr3
camera_matrix:
  rows: 3
  cols: 3
  data: [535.4, 0.0, 320.1, 0.0, 539.2, 247.6, 0.0, 0.0, 1.0]
distortion_model: plumb_bob
distortion_coefficients:
  rows: 1
  cols: 5
  data: [0.0, 0.0, 0.0, 0.0, 0.0]
rectification_matrix:
  rows: 3
  cols: 3
  data: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
projection_matrix:
  rows: 3
  cols: 4
  data: [535.4, 0.0, 320.1, 0.0, 0.0, 539.2, 247.6, 0.0, 0.0, 0.0, 1.0, 0.0]
EOF

# Kinect auto-exposes: brightness-offset-invariant epipolar matching
# (the reference's raw SSD is kept for synthetic parity runs).
cat > "$OUT/$SEQ/flame_params.yaml" <<'EOF2'
engine:
  zero_mean_ssd: true
EOF2

echo ">> running offline evaluation ($FRAMES frames)"
PYTHONPATH="$REPO" python -m flame_ros_tpu.frontends.offline_runner \
  --dataset tum \
  --input "$OUT/$SEQ/associations.txt" \
  --calib "$OUT/$SEQ/kinect.yaml" \
  --config "$OUT/$SEQ/flame_params.yaml" \
  --frames "$FRAMES" \
  --out "$OUT/results_$SEQ"

echo ">> results: $OUT/results_$SEQ/stats.txt"
tail -3 "$OUT/results_$SEQ/stats.txt"

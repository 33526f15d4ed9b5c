#!/usr/bin/env bash
# Round-4 recorded acceptance runs (external GT poses, VGA, 200 frames,
# full defaults): MAV 6-DoF regime, primitives scene family, and the
# zero_mean_ssd A/B on NON-exposure regimes (default-flip evidence).
set -u
OUT=${1:-/tmp/regime_acceptance}
mkdir -p "$OUT"
: > "$OUT/matrix.jsonl"
run() {
  local name="$1"; shift
  echo "=== $name: $*" >&2
  local t0=$SECONDS
  local line
  line=$(JAX_PLATFORMS=cpu python -m flame_ros_tpu.frontends.offline_runner \
      --dataset synthetic --resolution vga --frames 200 \
      --out "$OUT/$name" "$@" 2>/dev/null | tail -1)
  case "$line" in
    {*) echo "{\"run\": \"$name\", \"wall_s\": $((SECONDS - t0)), ${line#\{}" \
        >> "$OUT/matrix.jsonl" ;;
    *)  echo "{\"run\": \"$name\", \"wall_s\": $((SECONDS - t0)), \"error\": \"runner produced no summary\"}" \
        >> "$OUT/matrix.jsonl" ;;
  esac
}
run mav --motion mav
run primitives --scene primitives
run easy_zms --zero-mean-ssd
run rotation_zms --motion rotation --zero-mean-ssd
run lowtex_zms --texture-gain 0.3 --zero-mean-ssd
run mav_tracking --motion mav --pose-source tracking
run primitives_tracking --scene primitives --pose-source tracking
echo done

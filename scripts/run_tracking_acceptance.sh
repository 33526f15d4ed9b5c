#!/usr/bin/env bash
# Tracking-mode (no GT poses) acceptance matrix — BASELINE config 4.
# VGA, 200 frames, full product defaults, ba_refine on/off A/B per regime.
# Results land as JSON lines in $OUT/matrix.jsonl (one per run).
set -u
OUT=${1:-/tmp/tracking_acceptance}
mkdir -p "$OUT"
: > "$OUT/matrix.jsonl"
run() {
  local name="$1"; shift
  echo "=== $name: $*" >&2
  local t0=$SECONDS
  local line
  line=$(JAX_PLATFORMS=cpu python -m flame_ros_tpu.frontends.offline_runner \
      --dataset synthetic --resolution vga --frames 200 \
      --pose-source tracking --out "$OUT/$name" "$@" 2>/dev/null | tail -1)
  case "$line" in
    {*) echo "{\"run\": \"$name\", \"wall_s\": $((SECONDS - t0)), ${line#\{}" \
        >> "$OUT/matrix.jsonl" ;;
    *)  echo "{\"run\": \"$name\", \"wall_s\": $((SECONDS - t0)), \"error\": \"runner produced no summary\"}" \
        >> "$OUT/matrix.jsonl" ;;
  esac
}
run easy
run easy_ba --ba-refine
run rotation --motion rotation
run rotation_ba --motion rotation --ba-refine
run lowtex --texture-gain 0.3
run lowtex_ba --texture-gain 0.3 --ba-refine
echo done

#!/usr/bin/env bash
# Epipolar sample-count A/B (round-4 roadmap item 5): S=16 (default) vs
# S=8 at acceptance scale (VGA, 200 frames, full defaults otherwise),
# same-session arms on the easy / rotation / low-texture regimes.
# S=8 measured 6.01 vs 6.48 ms/frame on v5e (chainablate epi8) — this
# decides whether the saving passes the accuracy gate.
set -u
OUT=${1:-/tmp/epi_ab}
mkdir -p "$OUT"
: > "$OUT/matrix.jsonl"
cat > "$OUT/epi8.yaml" <<'YAML'
engine:
  num_search_samples: 8
YAML
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
run easy_s16
run easy_s8 --config "$OUT/epi8.yaml"
run rotation_s16 --motion rotation
run rotation_s8 --motion rotation --config "$OUT/epi8.yaml"
run lowtex_s16 --texture-gain 0.3
run lowtex_s8 --texture-gain 0.3 --config "$OUT/epi8.yaml"
echo done

#!/usr/bin/env bash
# Chip-accuracy acceptance matrix on the REAL TPU (default environment —
# the axon-relayed chip). Runs the key regimes at full acceptance scale
# (VGA, 200 frames, full product defaults) and records one JSON line per
# run. With the utils/precision.py fix these must match the CPU-recorded
# PARITY tables; pre-fix the chip read 2-5x worse (BENCH_NOTES §round-4
# TPU numerics).
set -u
OUT=${1:-/tmp/tpu_acceptance}
FRAMES=${2:-200}
mkdir -p "$OUT"
: > "$OUT/matrix.jsonl"
python - << 'PYEOF' >> "$OUT/matrix.jsonl"
import jax, json
print(json.dumps({"backend": jax.default_backend(),
                  "devices": [str(d) for d in jax.devices()]}))
PYEOF
run() {
  local name="$1"; shift
  echo "=== $name: $*" >&2
  local t0=$SECONDS
  local line
  line=$(python -m flame_ros_tpu.frontends.offline_runner \
      --dataset synthetic --resolution vga --frames "$FRAMES" \
      --out "$OUT/$name" "$@" 2>/dev/null | tail -1)
  case "$line" in
    {*) echo "{\"run\": \"$name\", \"wall_s\": $((SECONDS - t0)), ${line#\{}" \
        >> "$OUT/matrix.jsonl" ;;
    *)  echo "{\"run\": \"$name\", \"wall_s\": $((SECONDS - t0)), \"error\": \"runner produced no summary\"}" \
        >> "$OUT/matrix.jsonl" ;;
  esac
}
run easy
run rotation --motion rotation
run lowtex --texture-gain 0.3
run mav --motion mav
run primitives --scene primitives
run mav_tracking --motion mav --pose-source tracking
echo done

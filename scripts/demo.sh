#!/usr/bin/env bash
# End-to-end demo (the reference's Docker example equivalent,
# scripts/flame_docker_example.sh): run the full engine over a synthetic
# posed sequence, evaluate against ground truth, and export an
# interactive mesh viewer. Zero-egress friendly — no dataset download.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/flame_demo}"
FRAMES="${2:-60}"

python -m flame_ros_tpu.frontends.offline_runner \
  --dataset synthetic --frames "$FRAMES" --resolution qvga \
  --out "$OUT" --save-products --verbose

python - "$OUT" <<'EOF'
import sys, numpy as np
out = sys.argv[1]
mesh = np.load(f"{out}/final_mesh.npz")
from flame_ros_tpu.viz.html_viewer import export_html_viewer
from flame_ros_tpu.viz.export import write_ply_mesh
export_html_viewer(f"{out}/mesh_viewer.html", mesh["vertices_px"],
                   mesh["idepths"], mesh["normals"], mesh["triangles"],
                   mesh["tri_validity"], mesh["K"])
write_ply_mesh(f"{out}/mesh.ply", mesh["vertices_px"], mesh["idepths"],
               mesh["normals"], mesh["triangles"], mesh["tri_validity"],
               mesh["K"])
print(f"demo artifacts in {out}: stats.txt, telemetry.jsonl, "
      f"mesh_viewer.html, mesh.ply")
EOF

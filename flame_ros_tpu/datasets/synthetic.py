"""Synthetic posed RGB-D sequence renderer (textured room scene).

Serves the role the reference fills with downloaded TUM/EuRoC sequences
(reference: scripts/Dockerfile:46-52 pulls EuRoC V1_01_easy for its demo):
a deterministic source of grayscale frames + ground-truth depth + exact
6-DoF poses, used by unit tests, the golden end-to-end harness, and
bench.py. Zero-egress environments cannot download datasets, so the
framework ships its own scene generator.

The scene is a set of bounded textured planes (room walls/floor/ceiling +
a box) ray-cast analytically: with RDF camera rays r = Kinv (u,v,1) (z = 1),
the hit parameter s along the world ray equals camera z-depth, so depth maps
are exact. Textures are multi-frequency sinusoids — smooth, alias-free, and
gradient-rich at every scale, which the detection/epipolar kernels need.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.geometry.se3 import SE3
from flame_ros_tpu.utils.precision import einsumh

VGA = Pinhole(fx=525.0, fy=525.0, cx=319.5, cy=239.5, width=640, height=480)
QVGA = Pinhole(fx=262.5, fy=262.5, cx=159.5, cy=119.5, width=320, height=240)


def _room_planes():
    """Planes: (point, normal, tangent_u, tangent_v, half_extent_u, half_extent_v, tex_seed)."""
    def plane(p, n, tu, tv, eu, ev, seed):
        return (np.array(p, np.float32), np.array(n, np.float32),
                np.array(tu, np.float32), np.array(tv, np.float32),
                np.float32(eu), np.float32(ev), seed)

    return [
        # Back wall at z=4.
        plane([0, 0, 4.0], [0, 0, -1], [1, 0, 0], [0, 1, 0], 3.0, 2.0, 1),
        # Left wall x=-2.5, right wall x=2.5.
        plane([-2.5, 0, 2.0], [1, 0, 0], [0, 0, 1], [0, 1, 0], 3.0, 2.0, 2),
        plane([2.5, 0, 2.0], [-1, 0, 0], [0, 0, 1], [0, 1, 0], 3.0, 2.0, 3),
        # Floor y=1.5 (RDF: +y is down), ceiling y=-1.5.
        plane([0, 1.5, 2.0], [0, -1, 0], [1, 0, 0], [0, 0, 1], 3.0, 3.0, 4),
        plane([0, -1.5, 2.0], [0, 1, 0], [1, 0, 0], [0, 0, 1], 3.0, 3.0, 5),
        # Box front face at z=2.2 and top face.
        plane([0.6, 0.9, 2.2], [0, 0, -1], [1, 0, 0], [0, 1, 0], 0.6, 0.6, 6),
        plane([0.6, 0.3, 2.5], [0, -1, 0], [1, 0, 0], [0, 0, 1], 0.6, 0.3, 7),
        # A slanted panel for non-frontoparallel structure.
        plane([-1.0, -0.2, 2.8], [0.5547, 0, -0.83205], [0.83205, 0, 0.5547],
              [0, 1, 0], 0.7, 0.7, 8),
    ]


def _primitive_planes():
    """Second scene family (independent of the room): occluding boxes
    floating in front of a back wall + floor, producing depth
    DISCONTINUITIES at every silhouette edge — the structure the room's
    closed surfaces lack, and exactly where mesh-over-occlusion artifacts
    (long skewed triangles bridging fore/background) appear. Exercises
    the oblique/edge-length display filters (reference
    src/flame_nodelet.cc:644-715, cfg/flame_nodelet.yaml:33-42)."""
    def plane(p, n, tu, tv, eu, ev, seed):
        return (np.array(p, np.float32), np.array(n, np.float32),
                np.array(tu, np.float32), np.array(tv, np.float32),
                np.float32(eu), np.float32(ev), seed)

    out = [
        # Back wall at z=4.5 and floor.
        plane([0, 0, 4.5], [0, 0, -1], [1, 0, 0], [0, 1, 0], 3.4, 2.4, 11),
        plane([0, 1.6, 2.4], [0, -1, 0], [1, 0, 0], [0, 0, 1], 3.4, 3.4, 12),
    ]
    # Floating boxes (front + top + one side face each): fore/background
    # depth ratios of ~2-3x across their silhouettes.
    boxes = [
        # (center, half_extents, seed)
        ((-0.9, 0.45, 1.9), (0.35, 0.30, 0.25), 13),
        ((0.75, -0.35, 2.6), (0.40, 0.35, 0.30), 16),
        ((0.1, 0.85, 3.2), (0.55, 0.25, 0.25), 19),
    ]
    for (cx, cy, cz), (ex, ey, ez), seed in boxes:
        out.append(plane([cx, cy, cz - ez], [0, 0, -1],
                         [1, 0, 0], [0, 1, 0], ex, ey, seed))
        out.append(plane([cx, cy - ey, cz], [0, -1, 0],
                         [1, 0, 0], [0, 0, 1], ex, ez, seed + 1))
        out.append(plane([cx - ex, cy, cz], [-1, 0, 0],
                         [0, 0, 1], [0, 1, 0], ez, ey, seed + 2))
    return out


def _primitive_spheres():
    """(center, radius, seed): curved occluders — their silhouette is a
    smooth curve no Delaunay edge aligns with, the adversarial case for
    triangle-filter heuristics."""
    return [
        (np.array([0.0, -0.55, 2.1], np.float32), np.float32(0.38), 23),
        (np.array([-1.15, -0.15, 3.0], np.float32), np.float32(0.45), 27),
    ]


def _value_noise_octave(u, v, table):
    """Smoothstep-interpolated value noise from a random grid (non-periodic,
    so epipolar matching has no repeated lobes to alias onto)."""
    S = table.shape[0]
    u = jnp.clip(u, 0.0, S - 1.001)
    v = jnp.clip(v, 0.0, S - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    fu = fu * fu * (3.0 - 2.0 * fu)  # smoothstep fade -> C1 texture
    fv = fv * fv * (3.0 - 2.0 * fv)
    t = jnp.asarray(table)
    i00 = t[v0, u0]
    i01 = t[v0, u0 + 1]
    i10 = t[v0 + 1, u0]
    i11 = t[v0 + 1, u0 + 1]
    return ((i00 * (1 - fu) + i01 * fu) * (1 - fv)
            + (i10 * (1 - fu) + i11 * fu) * fv)


def _texture(tu, tv, seed: int, eu: float, ev: float):
    """Procedural grayscale texture in [0, 255]: multi-octave value noise."""
    rng = np.random.default_rng(seed)
    val = jnp.zeros_like(tu)
    total = 0.0
    for size, amp in ((12, 1.0), (48, 0.65), (192, 0.45)):
        table = rng.uniform(-1.0, 1.0, (size, size)).astype(np.float32)
        u = (tu / eu * 0.5 + 0.5) * (size - 1)
        v = (tv / ev * 0.5 + 0.5) * (size - 1)
        val = val + amp * _value_noise_octave(u, v, table)
        total += amp
    val = val / total
    return jnp.clip(val * 0.5 + 0.5, 0.0, 1.0) * 215.0 + 20.0


@partial(jax.jit, static_argnames=("cam", "scene"))
def render_frame(cam: Pinhole, pose_q, pose_t, scene: str = "room"):
    """Render (gray [H,W] f32 in [0,255], depth [H,W] f32) for pose T_wc.

    scene: "room" (closed textured surfaces, the original family) or
    "primitives" (floating boxes + spheres over a back wall — occlusion
    boundaries / depth discontinuities; an independent generator family
    so acceptance numbers are not correlated with one scene model).
    """
    H, W = cam.height, cam.width
    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    rays = cam.ray(jnp.stack([u, v], axis=-1))  # [H,W,3], z=1
    T = SE3(pose_q, pose_t)
    d_w = T.rotate(rays)       # [H,W,3]
    o_w = pose_t               # [3]

    best_depth = jnp.full((H, W), jnp.inf, jnp.float32)
    best_val = jnp.zeros((H, W), jnp.float32)
    planes = _room_planes() if scene == "room" else _primitive_planes()
    for (p0, n, tu_ax, tv_ax, eu, ev, seed) in planes:
        p0 = jnp.asarray(p0)
        n = jnp.asarray(n)
        denom = einsumh("hwc,c->hw", d_w, n)
        s = einsumh("c,c->", p0 - o_w, n) / jnp.where(
            jnp.abs(denom) < 1e-9, jnp.inf, denom)
        hit_w = o_w + s[..., None] * d_w
        rel = hit_w - p0
        tu = einsumh("hwc,c->hw", rel, jnp.asarray(tu_ax))
        tv = einsumh("hwc,c->hw", rel, jnp.asarray(tv_ax))
        inside = (jnp.abs(tu) <= eu) & (jnp.abs(tv) <= ev) & (s > 0.05)
        depth = jnp.where(inside, s, jnp.inf)
        closer = depth < best_depth
        best_val = jnp.where(closer, _texture(tu, tv, seed, eu, ev), best_val)
        best_depth = jnp.minimum(best_depth, depth)

    if scene == "primitives":
        for (c, r, seed) in _primitive_spheres():
            c = jnp.asarray(c)
            # Ray-sphere: |o + s d - c|^2 = r^2 with unnormalized d
            # (camera z = 1), so the hit parameter s IS the camera
            # z-depth — GT depth stays exact, as for the planes.
            oc = o_w - c
            a = einsumh("hwc,hwc->hw", d_w, d_w)
            b = 2.0 * einsumh("hwc,c->hw", d_w, oc)
            c0 = einsumh("c,c->", oc, oc) - r * r
            disc = b * b - 4.0 * a * c0
            s = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2.0 * a)
            hit = (disc > 0.0) & (s > 0.05)
            depth_s = jnp.where(hit, s, jnp.inf)
            closer = depth_s < best_depth
            # Surface-attached lon/lat texture: photometrically
            # consistent across viewpoints (required for direct methods).
            p = o_w + s[..., None] * d_w - c
            lon = jnp.arctan2(p[..., 1], p[..., 0])
            lat = jnp.arcsin(jnp.clip(p[..., 2] / r, -1.0, 1.0))
            tex = _texture(lon, lat, seed, np.pi, np.pi / 2)
            best_val = jnp.where(closer, tex, best_val)
            best_depth = jnp.minimum(best_depth, depth_s)

    gray = jnp.where(jnp.isfinite(best_depth), best_val, 0.0)
    depth = jnp.where(jnp.isfinite(best_depth), best_depth, 0.0)
    return gray, depth


def make_trajectory(n_frames: int, motion: str = "strafe") -> SE3:
    """Smooth camera trajectory, camera-to-world, RDF world."""
    ts = np.linspace(0.0, 1.0, n_frames, dtype=np.float32)
    if motion == "strafe":
        # Elliptical lateral sweep: good epipolar baselines whose *direction*
        # varies between frames (collinear camera centers would make all
        # epipolar lines coincide, letting wrong-lobe matches stay
        # self-consistent forever — a degenerate config real rigs avoid).
        tx = 0.6 * np.sin(2 * np.pi * ts)
        ty = 0.18 * (1.0 - np.cos(2 * np.pi * ts))
        tz = 0.15 * ts
        yaw = 0.05 * np.sin(2 * np.pi * ts)
    elif motion == "forward":
        tx = 0.05 * np.sin(2 * np.pi * ts)
        ty = np.zeros_like(ts)
        tz = 0.9 * ts
        yaw = np.zeros_like(ts)
    elif motion == "rotation":
        # Rotation-dominant sweep (stress regime, BASELINE "low-texture/
        # stress" config class): yaw pans ±~17° with a small pitch wobble
        # while the camera centre barely translates (±6 cm lateral). The
        # short, direction-varying baselines give the epipolar filter
        # very little parallax per frame — the regime the reference
        # guards with its angular-rate publish gate
        # (src/flame_nodelet.cc:644-662).
        tx = 0.06 * np.sin(2 * np.pi * ts)
        ty = 0.02 * (1.0 - np.cos(2 * np.pi * ts))
        tz = np.zeros_like(ts)
        yaw = 0.30 * np.sin(2 * np.pi * ts)
        pitch = 0.06 * np.sin(4 * np.pi * ts)
        taus = np.stack([tx, ty, tz, pitch, yaw, np.zeros_like(ts)],
                        axis=-1)
        return SE3.exp(jnp.asarray(taus))
    elif motion == "mav":
        # 6-DoF MAV regime (BASELINE config 3 stand-in: EuRoC V1 Vicon-
        # room flight, reference src/flame_offline_asl.cc:91-798): roll
        # and pitch oscillate out of phase at twice the lateral sweep
        # frequency, with a forward excursion toward the back wall, a
        # vertical bob, and a yaw pan — all six DoF excited at once. At
        # 200 frames / 30 fps this is ~16 deg/s peak roll rate and
        # ~0.5 m/s peak translation, V1_01_easy-like.
        tx = 0.5 * np.sin(2 * np.pi * ts)
        ty = 0.15 * np.sin(4 * np.pi * ts + 0.7)
        tz = 0.45 * (1.0 - np.cos(2 * np.pi * ts))
        roll = 0.15 * np.sin(4 * np.pi * ts)
        pitch = 0.12 * np.sin(4 * np.pi * ts + 1.1)
        yaw = 0.25 * np.sin(2 * np.pi * ts + 0.4)
        taus = np.stack([tx, ty, tz, pitch, yaw, roll], axis=-1)
        return SE3.exp(jnp.asarray(taus))
    elif motion == "static":
        tx = ty = tz = yaw = np.zeros_like(ts)
    else:
        raise ValueError(f"unknown motion {motion}")
    taus = np.stack([tx, ty, tz,
                     np.zeros_like(ts), yaw, np.zeros_like(ts)], axis=-1)
    return SE3.exp(jnp.asarray(taus))


@dataclass
class SyntheticSequence:
    cam: Pinhole
    images: np.ndarray      # [N, H, W] float32, grayscale 0..255
    depths: np.ndarray      # [N, H, W] float32 meters (0 where invalid)
    poses: SE3              # batched [N]
    timestamps: np.ndarray  # [N] seconds

    def __len__(self):
        return self.images.shape[0]


def export_asl(seq: "SyntheticSequence", root: str,
               depth_scale: float = 5000.0) -> None:
    """Write a sequence as a EuRoC/ASL folder tree (mav0-style: cam0 +
    depth0 + state_groundtruth_estimate0, sensor.yaml + data.csv + PNG
    data folders) so the FULL ASL pipeline — folder reader, timestamp
    association, T_BS chain, world-frame conversion, rectification —
    can be driven end-to-end on exact-GT data (reference analog: the
    Docker demo's downloaded V1_01_easy, scripts/Dockerfile:46-52;
    here zero-egress environments generate their own). Poses are
    camera-to-world RDF with identity T_BS, so load with
    world_frame="RDF". Depth is uint16 / depth_scale (0.2 mm
    quantization at the default 5000)."""
    import os

    import cv2
    import yaml

    cam = seq.cam
    cam0 = os.path.join(root, "cam0")
    depth0 = os.path.join(root, "depth0")
    pose0 = os.path.join(root, "state_groundtruth_estimate0")
    for d in (cam0, depth0):
        os.makedirs(os.path.join(d, "data"), exist_ok=True)
    os.makedirs(pose0, exist_ok=True)
    eye = np.eye(4)
    yaml_T = {"rows": 4, "cols": 4, "data": eye.ravel().tolist()}
    with open(os.path.join(cam0, "sensor.yaml"), "w") as f:
        yaml.dump({"sensor_type": "camera", "T_BS": yaml_T,
                   "intrinsics": [cam.fx, cam.fy, cam.cx, cam.cy],
                   "resolution": [cam.width, cam.height],
                   "distortion_coefficients": [0.0, 0.0, 0.0, 0.0]}, f)
    with open(os.path.join(depth0, "sensor.yaml"), "w") as f:
        yaml.dump({"sensor_type": "depth", "T_BS": yaml_T,
                   "depth_scale_factor": float(depth_scale)}, f)
    with open(os.path.join(pose0, "sensor.yaml"), "w") as f:
        yaml.dump({"sensor_type": "visual-inertial", "T_BS": yaml_T}, f)
    cam_rows, depth_rows, pose_rows = [], [], []
    q = np.asarray(seq.poses.q)
    t = np.asarray(seq.poses.t)
    for i in range(len(seq)):
        ts = int(round(float(seq.timestamps[i]) * 1e9))
        cv2.imwrite(os.path.join(cam0, "data", f"{ts}.png"),
                    np.clip(seq.images[i], 0, 255).astype(np.uint8))
        d16 = np.clip(seq.depths[i] * depth_scale, 0, 65535)
        cv2.imwrite(os.path.join(depth0, "data", f"{ts}.png"),
                    d16.astype(np.uint16))
        cam_rows.append(f"{ts},{ts}.png")
        depth_rows.append(f"{ts},{ts}.png")
        pose_rows.append(
            f"{ts},{float(t[i, 0]):.9f},{float(t[i, 1]):.9f},"
            f"{float(t[i, 2]):.9f},{float(q[i, 0]):.9f},"
            f"{float(q[i, 1]):.9f},{float(q[i, 2]):.9f},"
            f"{float(q[i, 3]):.9f}")
    hdr = "#timestamp [ns],filename\n"
    with open(os.path.join(cam0, "data.csv"), "w") as f:
        f.write(hdr + "\n".join(cam_rows) + "\n")
    with open(os.path.join(depth0, "data.csv"), "w") as f:
        f.write(hdr + "\n".join(depth_rows) + "\n")
    with open(os.path.join(pose0, "data.csv"), "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n"
                + "\n".join(pose_rows) + "\n")


def export_tum(seq: "SyntheticSequence", root: str,
               depth_scale: float = 5000.0) -> tuple:
    """Write a sequence as a TUM RGB-D dataset tree (rgb/ + depth/ PNG
    folders, a pre-associated assoc.txt in the reference's
    pose-rgb-depth line format, and a ROS CameraInfo calib.yaml) so the
    FULL TUM pipeline — association-file parser, P-matrix calibration,
    plumb-bob rectification, uint16/5000 depth scaling, frame
    conversion — can be driven end-to-end on exact-GT data (reference
    analog: flame_offline_tum on the downloaded fr3 sequences,
    /root/reference/src/flame_offline_tum.cc:403-525 + README.md:117-127;
    zero-egress environments generate their own). Poses are
    camera-to-world RDF (load with --input-frame RDF); assoc.txt stores
    quaternions in TUM xyzw order. Returns (assoc_path, calib_path)."""
    import os

    import cv2

    cam = seq.cam
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    q = np.asarray(seq.poses.q)   # (w, x, y, z)
    t = np.asarray(seq.poses.t)
    lines = []
    for i in range(len(seq)):
        ts = float(seq.timestamps[i])
        name = f"{ts:.6f}.png"
        cv2.imwrite(os.path.join(root, "rgb", name),
                    np.clip(seq.images[i], 0, 255).astype(np.uint8))
        d16 = np.clip(seq.depths[i] * depth_scale, 0, 65535)
        cv2.imwrite(os.path.join(root, "depth", name),
                    d16.astype(np.uint16))
        lines.append(
            f"{ts:.6f} {t[i, 0]:.9f} {t[i, 1]:.9f} {t[i, 2]:.9f} "
            f"{q[i, 1]:.9f} {q[i, 2]:.9f} {q[i, 3]:.9f} {q[i, 0]:.9f} "
            f"{ts:.6f} rgb/{name} {ts:.6f} depth/{name}")
    assoc = os.path.join(root, "assoc.txt")
    with open(assoc, "w") as f:
        f.write("\n".join(lines) + "\n")
    calib = os.path.join(root, "calib.yaml")
    K = [cam.fx, 0.0, cam.cx, 0.0, cam.fy, cam.cy, 0.0, 0.0, 1.0]
    P = [cam.fx, 0.0, cam.cx, 0.0,
         0.0, cam.fy, cam.cy, 0.0,
         0.0, 0.0, 1.0, 0.0]
    with open(calib, "w") as f:
        f.write(
            f"image_width: {cam.width}\n"
            f"image_height: {cam.height}\n"
            "camera_name: synthetic\n"
            "camera_matrix: {rows: 3, cols: 3, data: "
            f"{K}}}\n"
            "distortion_model: plumb_bob\n"
            "distortion_coefficients: {rows: 1, cols: 5, "
            "data: [0, 0, 0, 0, 0]}\n"
            "projection_matrix: {rows: 3, cols: 4, data: "
            f"{P}}}\n")
    return assoc, calib


def make_sequence(n_frames: int = 30, cam: Pinhole = QVGA,
                  motion: str = "strafe", fps: float = 30.0,
                  texture_gain: float = 1.0,
                  exposure_amp: float = 0.0,
                  exposure_period: float = 50.0,
                  scene: str = "room") -> SyntheticSequence:
    """Render a posed sequence. Stress knobs (BASELINE "TUM low-texture
    stress" config class — real sequences are not downloadable here, so
    the hard regimes are synthesized):

    - texture_gain: scales image contrast about mid-gray. 1.0 = normal;
      0.3 leaves ~7% of VGA pixels above the detector's min_grad_mag
      floor (low-texture stress for detection + patch matching).
    - exposure_amp r: per-frame affine brightness oscillation — gain
      1 + r*sin(2*pi*i/period) and bias 30*r*sin(2*pi*i/period + 1.3) —
      the auto-exposure "hunting" a real camera does, scaled so keyframe
      and current frame never share an exposure regardless of sequence
      length. Plain SSD epipolar matching breaks; engine.zero_mean_ssd
      is the counter (the reference's analog is auto-exposure TUM RGB-D
      footage).
    GT depths and poses are exact in all regimes.
    """
    poses = make_trajectory(n_frames, motion)
    imgs, deps = [], []
    for i in range(n_frames):
        g, d = render_frame(cam, poses.q[i], poses.t[i], scene)
        g = np.asarray(g)
        if texture_gain != 1.0:
            g = 127.5 + texture_gain * (g - 127.5)
        if exposure_amp != 0.0:
            ph = 2.0 * np.pi * i / exposure_period
            gain = 1.0 + exposure_amp * np.sin(ph)
            bias = 30.0 * exposure_amp * np.sin(ph + 1.3)
            g = gain * g + bias
        imgs.append(np.clip(g, 0.0, 255.0).astype(np.float32))
        deps.append(np.asarray(d))
    return SyntheticSequence(
        cam=cam,
        images=np.stack(imgs),
        depths=np.stack(deps),
        poses=poses,
        timestamps=np.arange(n_frames, dtype=np.float64) / fps,
    )

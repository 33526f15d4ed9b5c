"""Direct image-alignment pose tracking (visual odometry front end).

The reference assumes poses arrive from an external source (tf lookups /
dataset ground truth — SURVEY §2.10); the BASELINE north star asks for an
online mode with *estimated* poses. This module supplies it: coarse-to-fine
Gauss-Newton photometric alignment of the current frame against a
reference keyframe with (mesh-rasterized) dense inverse depth — the
LSD-SLAM-style direct tracking formulation, built as fixed-shape JAX so
the whole pyramid solve jits into one device computation.

    min_xi  sum_p w_p * ( I_cur( pi( T(xi) * pi^-1(p, d_ref(p)) ) )
                          - I_ref(p) )^2

with Huber weights, analytic Jacobians through the warp, and a fixed
iteration budget per pyramid level (masked early-exit semantics — lanes
that stop improving contribute zero updates).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.geometry.se3 import (SE3, quat_conj, quat_mul,
                                        quat_rotate)
from flame_ros_tpu.ops.pyramid import bilinear_pyramid
from flame_ros_tpu.utils.precision import mmh


class TrackResult(NamedTuple):
    q: jax.Array           # [4] refined pose T_ref_cur rotation
    t: jax.Array           # [3]
    final_cost: jax.Array  # scalar mean Huber cost
    n_inliers: jax.Array   # scalar
    gain: jax.Array        # scalar affine exposure gain (cur vs ref)
    offset: jax.Array      # scalar affine exposure offset
    # Points that were observable at all (textured in ref, in view, in
    # front) — the denominator the failure gate judges n_inliers
    # against. A near-zero n_valid with cost ~0 is the DEGENERATE
    # failure signature (e.g. a textureless reference), not a good
    # track.
    n_valid: jax.Array     # scalar


def _se3_exp_qt(tau):
    T = SE3.exp(tau)
    return T.q, T.t


def _select_ref_points(ref_pyr, ref_idepth, cam: Pinhole, num_points: int,
                       min_grad: float):
    """Pick `num_points` trackable reference points: grid-strided
    candidates scored by central-difference gradient magnitude, gated on
    a finite positive inverse depth. Returns (uv [P,2], xi [P],
    valid [P], iref [P], X_ref [P,3])."""
    H, W = cam.height, cam.width
    idx = (jnp.arange(num_points * 4) * 97) % (H * W)  # strided coverage
    py = (idx // W).astype(jnp.float32)
    px = (idx % W).astype(jnp.float32)
    uv = jnp.stack([px, py], -1)
    lvl0 = jnp.zeros(num_points * 4, jnp.int32)
    gx, _ = bilinear_pyramid(ref_pyr, uv + jnp.array([1.0, 0.0]), lvl0)
    gx2, _ = bilinear_pyramid(ref_pyr, uv - jnp.array([1.0, 0.0]), lvl0)
    gy, _ = bilinear_pyramid(ref_pyr, uv + jnp.array([0.0, 1.0]), lvl0)
    gy2, _ = bilinear_pyramid(ref_pyr, uv - jnp.array([0.0, 1.0]), lvl0)
    grad = jnp.abs(gx - gx2) * 0.5 + jnp.abs(gy - gy2) * 0.5
    xi_ref = ref_idepth[py.astype(jnp.int32), px.astype(jnp.int32)]
    ok = jnp.isfinite(xi_ref) & (xi_ref > 1e-3) & (grad >= min_grad)
    score = jnp.where(ok, grad, -1.0)
    top = jax.lax.top_k(score, num_points)[1]
    uv = uv[top]
    xi = jnp.nan_to_num(xi_ref, nan=1.0)[top]
    valid0 = ok[top]
    iref0, _ = bilinear_pyramid(ref_pyr, uv,
                                jnp.zeros(num_points, jnp.int32))
    X_ref = cam.backproject(uv, jnp.maximum(xi, 1e-3))
    return uv, xi, valid0, iref0, X_ref


@partial(jax.jit, static_argnames=("cam", "num_points", "iters_per_level",
                                   "num_levels", "estimate_affine"))
def track_frame(ref_pyr, ref_idepth, cur_pyr, init_q, init_t, *,
                cam: Pinhole, num_points: int = 2048,
                iters_per_level: int = 10, num_levels: int = 3,
                huber_delta: float = 8.0, min_grad: float = 4.0,
                estimate_affine: bool = True):
    """Estimate T_rc (points in ref frame -> cur frame... specifically the
    transform taking ref-camera coordinates to cur-camera coordinates).

    ref_pyr/cur_pyr: [L, H, W] pyramids; ref_idepth: [H, W] (NaN invalid);
    init_q/init_t: initial guess for T_rc (e.g. identity or motion model).
    Returns TrackResult with the refined relative pose.

    estimate_affine: jointly estimate a per-frame affine exposure model
    (DSO-style): r = I_cur(warp(p)) - (gain * I_ref(p) + offset). Auto-
    exposure cameras (e.g. TUM RGB-D) change gain/offset frame to frame;
    raw photometric alignment then biases the pose. On constant-exposure
    input the solve returns gain=1, offset=0 and is behavior-neutral.
    (Beyond the reference, which assumes externally-supplied poses.)
    """
    H, W = cam.height, cam.width

    # --- select trackable points (static count, mask-weighted) --------
    uv, xi, valid0, iref0, X_ref = _select_ref_points(
        ref_pyr, ref_idepth, cam, num_points, min_grad)

    def level_solve(carry, level):
        q, t, g, o = carry
        lvl = jnp.full((num_points,), level, jnp.int32)

        def gn_iter(_, qt):
            q, t, g, o = qt
            Xc = quat_rotate(q[None, :], X_ref) + t[None, :]
            z = Xc[..., 2]
            front = z > 1e-3
            zs = jnp.where(front, z, 1.0)
            u = cam.fx * Xc[..., 0] / zs + cam.cx
            v = cam.fy * Xc[..., 1] / zs + cam.cy
            uvc = jnp.stack([u, v], -1)
            icur, inb = bilinear_pyramid(cur_pyr, uvc, lvl)
            # Image gradient at the warped point (central, level-aware).
            step = jnp.exp2(level.astype(jnp.float32))
            du = jnp.stack([jnp.full_like(u, step), jnp.zeros_like(u)], -1)
            dv = jnp.stack([jnp.zeros_like(u), jnp.full_like(u, step)], -1)
            ip_u, _ = bilinear_pyramid(cur_pyr, uvc + du, lvl)
            im_u, _ = bilinear_pyramid(cur_pyr, uvc - du, lvl)
            ip_v, _ = bilinear_pyramid(cur_pyr, uvc + dv, lvl)
            im_v, _ = bilinear_pyramid(cur_pyr, uvc - dv, lvl)
            gIu = (ip_u - im_u) / (2 * step)
            gIv = (ip_v - im_v) / (2 * step)

            r = icur - (g * iref0 + o)
            w_h = jnp.where(jnp.abs(r) <= huber_delta, 1.0,
                            huber_delta / jnp.maximum(jnp.abs(r), 1e-6))
            m = (valid0 & front & inb).astype(jnp.float32) * w_h

            # d(pixel)/d(Xc):
            fxz = cam.fx / zs
            fyz = cam.fy / zs
            Ju = jnp.stack([fxz, jnp.zeros_like(z),
                            -cam.fx * Xc[..., 0] / (zs * zs)], -1)
            Jv = jnp.stack([jnp.zeros_like(z), fyz,
                            -cam.fy * Xc[..., 1] / (zs * zs)], -1)
            gX = gIu[:, None] * Ju + gIv[:, None] * Jv     # [P, 3]
            # d(Xc)/d(twist): [I | -[Xc]x] for tau = (v, omega).
            Jx = jnp.concatenate([
                gX,
                jnp.stack([
                    -gX[:, 1] * Xc[:, 2] + gX[:, 2] * Xc[:, 1],
                    gX[:, 0] * Xc[:, 2] - gX[:, 2] * Xc[:, 0],
                    -gX[:, 0] * Xc[:, 1] + gX[:, 1] * Xc[:, 0],
                ], -1)], -1)                                # [P, 6]

            if estimate_affine:
                # dr/d(gain) = -iref, dr/d(offset) = -1: two extra GN
                # columns. Column magnitudes span ~1 (offset) to ~1e3
                # (pose), which makes the raw 8x8 float32 solve lose the
                # pose block — Jacobi-normalize the system first.
                # Affine columns participate only at fine pyramid levels
                # (zeroed when coarse, so the pose step there is the pure
                # 6-DoF solve): at coarse levels the pose is still far
                # off and the affine directions — which correlate with
                # image content — absorb misalignment structure instead
                # (measured g->0.57 on a constant-exposure pair).
                fine = (level < 2).astype(jnp.float32)
                Jx = jnp.concatenate(
                    [Jx, -fine * iref0[:, None],
                     -fine * jnp.ones_like(iref0)[:, None]],
                    -1)                                     # [P, 8]
                A = mmh((Jx * m[:, None]).T, Jx) + jnp.diag(
                    jnp.array([1e-4] * 6 + [1e-2, 1e-2], jnp.float32))
                b = mmh((Jx * m[:, None]).T, r)
                s = jax.lax.rsqrt(jnp.diag(A) + 1e-12)
                An = s[:, None] * A * s[None, :]
                upd = -s * jnp.linalg.solve(An, s * b)
                tau = jnp.clip(upd[:6], -0.5, 0.5)
                g_new = jnp.clip(g + fine * jnp.clip(upd[6], -0.2, 0.2),
                                 0.5, 2.0)
                o_new = jnp.clip(o + fine * jnp.clip(upd[7], -16.0, 16.0),
                                 -96.0, 96.0)
            else:
                A = mmh((Jx * m[:, None]).T, Jx) + 1e-4 * jnp.eye(6)
                b = mmh((Jx * m[:, None]).T, r)
                tau = jnp.clip(-jnp.linalg.solve(A, b), -0.5, 0.5)
                g_new, o_new = g, o
            dq, dt = _se3_exp_qt(tau)
            # Left-compose the increment: T <- dT * T.
            q_new = quat_mul(dq, q)
            t_new = quat_rotate(dq, t) + dt
            return (q_new, t_new, g_new, o_new)

        q, t, g, o = jax.lax.fori_loop(0, iters_per_level, gn_iter,
                                       (q, t, g, o))
        return (q, t, g, o), None

    if estimate_affine:
        # Pose-independent exposure seed from global image statistics
        # (coarsest level, padding excluded): g0 = std ratio, o0 = mean
        # residual. Under a real gain/offset change this lands on the
        # true model before any alignment, so the coarse pose solve sees
        # exposure-corrected residuals; the fine levels then refine
        # (g, o) jointly with the pose. Constant exposure -> (1, 0).
        lc = num_levels - 1
        npx = (H >> lc) * (W >> lc)
        a = ref_pyr[lc].reshape(-1)[:npx]
        c = cur_pyr[lc].reshape(-1)[:npx]
        g0 = jnp.clip(jnp.std(c) / jnp.maximum(jnp.std(a), 1e-3), 0.5, 2.0)
        o0 = jnp.clip(jnp.mean(c) - g0 * jnp.mean(a), -96.0, 96.0)
    else:
        g0 = jnp.float32(1.0)
        o0 = jnp.float32(0.0)
    levels = jnp.arange(num_levels - 1, -1, -1, dtype=jnp.int32)
    (q, t, g, o), _ = jax.lax.scan(
        level_solve, (init_q, init_t, g0, o0), levels)

    # Final diagnostics at level 0.
    Xc = quat_rotate(q[None, :], X_ref) + t[None, :]
    z = jnp.maximum(Xc[..., 2], 1e-3)
    uvc = jnp.stack([cam.fx * Xc[..., 0] / z + cam.cx,
                     cam.fy * Xc[..., 1] / z + cam.cy], -1)
    icur, inb = bilinear_pyramid(cur_pyr, uvc,
                                 jnp.zeros(num_points, jnp.int32))
    r = jnp.abs(icur - (g * iref0 + o))
    m = valid0 & inb & (Xc[..., 2] > 1e-3)
    inl = m & (r < 2 * huber_delta)
    cost = jnp.sum(jnp.where(m, jnp.minimum(r, 3 * huber_delta), 0.0)) \
        / jnp.maximum(jnp.sum(m.astype(jnp.float32)), 1.0)
    return TrackResult(q=q, t=t, final_cost=cost,
                       n_inliers=jnp.sum(inl.astype(jnp.int32)),
                       gain=g, offset=o,
                       n_valid=jnp.sum(m.astype(jnp.int32)))


@partial(jax.jit, static_argnames=("cam", "pts_per_kf", "level", "iters",
                                   "n_steps"))
def ring_relocalize(kf_pyrs, kf_q, kf_t, kf_valid,
                    feat_uv, feat_mu, feat_valid, feat_kfidx,
                    cur_pyr, guess_q, guess_t, *, cam: Pinhole,
                    pts_per_kf: int = 256, level: int = 2,
                    step: float = 0.05, n_steps: int = 3, iters: int = 4):
    """Relocalize the current frame against the KEYFRAME RING.

    Recovery path for a lost tracker (occlusion / flash / motion blur
    outlasting the coast window): for every keyframe slot j in the
    engine's ring, take up to `pts_per_kf` depth-filter features OWNED
    by j (uv in j's image, posterior inverse depth in j's frame — the
    same per-keyframe anchoring the epipolar filter maintains), seed
    T_jc from the coasted world-pose guess, and run a discrete
    coordinate-descent over the twist grid ±{1..n_steps}·step per axis
    at a coarse pyramid level (the same beyond-basin search shape as
    ba.py::discrete_pose_presearch — which recovers ≥0.09 rad+m basin
    errors per its docstring). All K searches run as one vmap; the
    caller picks the best (valid, enough-points, cost-gated) slot.

    Reference analog: none — the reference DROPS frames whose pose
    cannot be resolved and waits for the external tracker to recover
    (tracked_image_stream.cc:182-185); this build owns the tracker, so
    it must also own the re-search.

    Returns (q_jc [K,4], t_jc [K,3], cost [K], n_pts [K]) where
    T_jc maps keyframe-j camera coords → current camera coords;
    cost = mean |residual| at `level` (inf where the candidate loses
    visibility), n_pts = features owned by each slot.
    """
    K = kf_q.shape[0]

    # Per-keyframe point selection: top-(pts_per_kf) owned live features
    # (deterministic index-ordered tiebreak via a tiny ramp).
    F = feat_uv.shape[0]
    ramp = jnp.arange(F, dtype=jnp.float32) * (1.0 / (F + 1))

    def gather_owned(j):
        owned = feat_valid & (feat_kfidx == j)
        score = jnp.where(owned, 1.0 - ramp, -1.0)
        top = jax.lax.top_k(score, pts_per_kf)[1]
        return (feat_uv[top], feat_mu[top], owned[top],
                jnp.sum(owned.astype(jnp.int32)))

    uv_k, d_k, pv_k, n_k = jax.vmap(gather_owned)(jnp.arange(K))

    # Candidate twist grid (identity first — the discrete cost never
    # increases).
    steps = jnp.arange(1, n_steps + 1, dtype=jnp.float32) * step
    signed = jnp.concatenate([steps, -steps])            # [2S]
    cand = jnp.zeros((6 * 2 * n_steps + 1, 6), jnp.float32)
    for a in range(6):
        cand = cand.at[1 + a * 2 * n_steps:
                       1 + (a + 1) * 2 * n_steps, a].set(signed)

    def search_one(pyr_j, q_wj, t_wj, uv_j, d_j, pv_j):
        # Reference intensities at the search level, in keyframe j.
        iref, _ = bilinear_pyramid(pyr_j, uv_j,
                                   jnp.full((pts_per_kf,), level,
                                            jnp.int32))
        X_j = cam.backproject(uv_j, jnp.maximum(d_j, 1e-3))   # [P, 3]
        pv = pv_j.astype(jnp.float32)

        # Seed T_jc = T_wc_guess^-1 ∘ T_wj.
        qg_inv = quat_conj(guess_q)
        q0 = quat_mul(qg_inv, q_wj)
        t0 = quat_rotate(qg_inv, t_wj - guess_t)

        def cost_of(q_jc, t_jc, tau):
            dq, dt = _se3_exp_qt(tau)
            qq = quat_mul(dq, q_jc)
            tt = quat_rotate(dq, t_jc) + dt
            Xc = quat_rotate(qq[None, :], X_j) + tt[None, :]
            z = Xc[..., 2]
            front = z > 1e-3
            zs = jnp.where(front, z, 1.0)
            uvc = jnp.stack([cam.fx * Xc[..., 0] / zs + cam.cx,
                             cam.fy * Xc[..., 1] / zs + cam.cy], -1)
            val, inb = bilinear_pyramid(
                cur_pyr, uvc, jnp.full((pts_per_kf,), level, jnp.int32))
            w = (front & inb).astype(jnp.float32) * pv
            n = jnp.sum(w)
            c = jnp.sum(jnp.minimum(jnp.abs(val - iref), 24.0) * w) \
                / jnp.maximum(n, 1.0)
            # Out-of-view "solutions" zero their residuals — require
            # the candidate to keep most points visible.
            enough = n >= 0.5 * jnp.maximum(jnp.sum(pv), 1.0)
            return jnp.where(enough, c, jnp.inf)

        # Dual seed: the coasted-guess-derived T_jc, or "camera is back
        # near keyframe j" (T_jc = identity — the classic relocalization
        # case where the platform returns to mapped territory). Start
        # the descent at the cheaper of the two.
        zero = jnp.zeros((6,), jnp.float32)
        c_guess = cost_of(q0, t0, zero)
        q_id = jnp.array([1.0, 0.0, 0.0, 0.0], jnp.float32)
        t_id = jnp.zeros((3,), jnp.float32)
        c_id = cost_of(q_id, t_id, zero)
        use_id = c_id < c_guess
        q0 = jnp.where(use_id, q_id, q0)
        t0 = jnp.where(use_id, t_id, t0)

        def it(i, qt):
            # Annealed coordinate descent: the candidate grid shrinks
            # 2x per round (coarse rounds close multi-step coast drift
            # — measured 0.3 m guess error after a 15-frame occlusion,
            # far outside a fixed ±n_steps·step grid; fine rounds
            # polish). The identity candidate keeps the discrete cost
            # monotonically non-increasing at every scale.
            q_jc, t_jc = qt
            s = jnp.exp2((iters - 1 - i).astype(jnp.float32))
            costs = jax.vmap(lambda tau: cost_of(q_jc, t_jc,
                                                 s * tau))(cand)
            best = s * cand[jnp.argmin(costs)]
            dq, dt = _se3_exp_qt(best)
            return (quat_mul(dq, q_jc), quat_rotate(dq, t_jc) + dt)

        q_jc, t_jc = jax.lax.fori_loop(0, iters, it, (q0, t0))
        final = cost_of(q_jc, t_jc, zero)
        return q_jc, t_jc, final

    q_jc, t_jc, cost = jax.vmap(search_one)(kf_pyrs, kf_q, kf_t,
                                            uv_k, d_k, pv_k)
    cost = jnp.where(kf_valid, cost, jnp.inf)
    return q_jc, t_jc, cost, n_k

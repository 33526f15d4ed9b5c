"""Batched multi-scale epipolar inverse-depth search + Bayesian filtering.

The depth-estimation heart of the engine (reference: the `update_idepths`
stage and the per-feature posterior mean/variance exposed by
flame::Flame::getRawIDepths, SURVEY §2.9; failure taxonomy from
msg/FlameStats.msg:13-18). The reference runs per-feature epipolar searches
on CPU with OpenMP; here ALL features advance in one fused device
computation over an image *pyramid*:

  for all N feature slots in parallel:
    - form the epipolar curve in the current image, parameterized *linearly
      in inverse depth* xi through projective space: p(xi) = A + xi*B with
      A = K R_cr ray_ref, B = K t_cr — so uniform-xi sampling is exact and
      pixel<->xi variance conversion is analytic;
    - pick a pyramid level per feature so the searched arc is ~1 sample per
      level-pixel (coarse level while the prior is loose, level 0 once
      converged) — the classic coarse-to-fine trick, done with index math
      instead of control flow;
    - score NS candidate inverse depths by SSD of a P-tap intensity profile;
      each candidate patch is the exact warp of the reference patch rays at
      that inverse depth (correspondence, orientation and foreshortening are
      baked in — no epipolar-tangent sign bookkeeping);
    - subpixel-refine by parabola fit in xi; censored boundary matches walk
      the posterior mean without collapsing variance;
    - gate failures after the reference's taxonomy: num_fail_ref_patch_grad,
      num_fail_ambiguous_match, num_fail_max_cost, num_fail_max_var,
      num_fail_max_dropouts — plus a chi-square consistency gate;
    - fuse into the per-feature Gaussian posterior (product of Gaussians)
      with an LSD-SLAM-style observation variance: photometric noise over
      profile slope plus geometric localization error, scaled by the pyramid
      level and mapped to xi units by |dp/dxi|.

Everything is static-shape: dead/failed features are masked lanes, not
control flow.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flame_ros_tpu.geometry.camera import Pinhole
from flame_ros_tpu.geometry.se3 import quat_mul, quat_conj, quat_rotate
from flame_ros_tpu.utils.precision import mmh
from flame_ros_tpu.ops.pyramid import bilinear_pyramid, bilinear_pyramid_batched

# Status codes for per-feature update outcome (debug "matches" rendering:
# green success / red failure, reference src/flame_nodelet.cc:786-791).
STATUS_SKIPPED = 0       # invalid slot or no-parallax frame
STATUS_OK = 1
STATUS_REF_GRAD = 2      # reference patch gradient too low
STATUS_AMBIGUOUS = 3     # second-best match too close (or chi-square reject)
STATUS_MAX_COST = 4      # best cost above threshold
STATUS_OOB = 5           # epipolar segment out of image bounds
STATUS_BOUNDARY = 6      # censored: best match on search-window edge


class FeatureFilterState(NamedTuple):
    """Per-feature posterior + bookkeeping. All [N]-shaped (or [N, k])."""
    uv_ref: jax.Array     # [N, 2] pixel in reference keyframe
    kf_idx: jax.Array     # [N] int32 keyframe ring slot
    mu: jax.Array         # [N] inverse-depth posterior mean (ref frame)
    var: jax.Array        # [N] posterior variance
    dropouts: jax.Array   # [N] int32 consecutive failed updates
    valid: jax.Array      # [N] bool live-slot mask
    frame_id: jax.Array   # [N] int32 frame id at creation (for age/debug)


class EpipolarResult(NamedTuple):
    state: FeatureFilterState
    status: jax.Array       # [N] int32 status codes
    xi_meas: jax.Array      # [N] measured inverse depth (where OK)
    uv_match: jax.Array     # [N, 2] matched pixel in current image (level 0)
    counts: dict            # failure-taxonomy counters (device scalars)


def relative_poses(kf_q, kf_t, cur_q, cur_t):
    """For each keyframe slot: T_cr = T_cur^-1 ∘ T_kf (ref cam -> cur cam)
    and t_rc (position of cur camera in ref frame). Leading KF axis."""
    cur_qi = quat_conj(cur_q)
    q_cr = quat_mul(cur_qi[None, :], kf_q)
    t_cr = quat_rotate(cur_qi[None, :], kf_t - cur_t[None, :])
    kf_qi = quat_conj(kf_q)
    t_rc = quat_rotate(kf_qi, cur_t[None, :] - kf_t)
    return q_cr, t_cr, t_rc


@partial(jax.jit, static_argnames=(
    "cam", "num_samples", "patch_size", "num_levels", "gather_dtype",
    "mode", "zero_mean_ssd"))
def epipolar_update(
    state: FeatureFilterState,
    kf_pyrs,            # [K, L, H, W] keyframe pyramids
    kf_q, kf_t,         # [K, 4], [K, 3] keyframe poses (camera-to-world)
    img_pyr,            # [L, H, W] current-frame pyramid
    cur_q, cur_t,       # [4], [3] current pose
    *,
    cam: Pinhole,
    num_samples: int = 32,
    patch_size: int = 5,
    num_levels: int = 3,
    sigma_window: float = 2.0,
    idepth_min: float = 1e-3,
    idepth_max: float = 4.0,
    epipolar_line_var: float = 4.0,
    min_ref_patch_grad: float = 1.0,
    ambiguous_match_ratio: float = 0.85,
    max_cost: float = 800.0,
    max_dropouts: int = 5,
    max_idepth_var: float = 1.0,
    process_noise: float = 1e-4,
    min_baseline: float = 1e-3,
    min_var_ratio: float = 0.25,
    gather_dtype: str = "float32",
    mode: str = "line",
    zero_mean_ssd: bool = False,
) -> EpipolarResult:
    N = state.mu.shape[0]
    P = patch_size
    half = P // 2
    f32 = jnp.float32
    L, H, W = img_pyr.shape
    # The candidate-patch gather ([N, S, P] bilinear samples) is the
    # hottest memory access in the engine — random HBM reads, latency/
    # bandwidth bound. gather_dtype="bfloat16" halves the gathered bytes
    # (intensity quantization <= 1 gray level at 255, far below the
    # epipolar_line_var photometric noise model); weights and SSD stay
    # f32. Wired from EngineParams.compute_dtype.
    if gather_dtype == "bfloat16":
        img_pyr = img_pyr.astype(jnp.bfloat16)
        kf_pyrs = kf_pyrs.astype(jnp.bfloat16)

    # --- per-feature relative geometry --------------------------------
    q_cr_k, t_cr_k, t_rc_k = relative_poses(kf_q, kf_t, cur_q, cur_t)
    q_cr = q_cr_k[state.kf_idx]          # [N, 4]
    t_cr = t_cr_k[state.kf_idx]          # [N, 3]
    t_rc = t_rc_k[state.kf_idx]          # [N, 3]

    ray = cam.ray(state.uv_ref)          # [N, 3]
    K = jnp.asarray(cam.K)
    A = mmh(quat_rotate(q_cr, ray), K.T)  # [N, 3]
    B = mmh(t_cr, K.T)                    # [N, 3]

    baseline = jnp.linalg.norm(t_cr, axis=-1)
    has_parallax = baseline > min_baseline

    # --- search range + pyramid level ---------------------------------
    sigma = jnp.sqrt(jnp.maximum(state.var, 1e-12))
    xi_lo = jnp.maximum(state.mu - sigma_window * sigma, idepth_min)
    xi_hi = jnp.minimum(state.mu + sigma_window * sigma, idepth_max)
    xi_hi = jnp.maximum(xi_hi, xi_lo + 1e-6)

    # |dp/dxi| at mu (level-0 pixels per unit inverse depth).
    hom_mu = A + state.mu[:, None] * B
    zmu = jnp.maximum(hom_mu[..., 2], 1e-6)
    dp_mu = (B[:, :2] * zmu[:, None]
             - hom_mu[:, :2] * B[:, 2:3]) / (zmu[:, None] ** 2)
    dpdxi = jnp.linalg.norm(dp_mu, axis=-1)               # [N]

    # Visibility gate: if the match predicted by the posterior falls outside
    # the current image, the true correspondence is not observable — any
    # "match" the search returns would be a wrong lobe poisoning the filter.
    uv_pred = hom_mu[:, :2] / zmu[:, None]
    visible = ((hom_mu[..., 2] > 1e-6)
               & (uv_pred[:, 0] >= 2) & (uv_pred[:, 0] <= cam.width - 3)
               & (uv_pred[:, 1] >= 2) & (uv_pred[:, 1] <= cam.height - 3))

    # Coarse-to-fine: level such that the full arc fits at <= 1 sample per
    # level-pixel; then cap the window to the arc the level can cover so the
    # SSD curve is always Nyquist-sampled and the true lobe can't be skipped.
    arc_px = (xi_hi - xi_lo) * dpdxi
    level = jnp.ceil(jnp.log2(jnp.maximum(arc_px / num_samples, 1.0)))
    level = jnp.clip(level, 0, num_levels - 1).astype(jnp.int32)   # [N]
    lscale = jnp.exp2(level.astype(f32))                           # 2^l
    max_halfwidth = (0.5 * num_samples * lscale) / jnp.maximum(dpdxi, 1e-3)
    center = jnp.clip(state.mu, xi_lo, xi_hi)
    capped = (center - xi_lo > max_halfwidth) | (xi_hi - center > max_halfwidth)
    xi_lo_2s, xi_hi_2s = xi_lo, xi_hi  # the +/- sigma_window*sigma range
    if mode == "line":
        # Fixed sample spacing of exactly ONE level-pixel along the
        # epipolar line (the LSD/FLaME convention): the gathered window
        # is always num_samples level-pixels of arc centered on the
        # posterior, so the sliding-line gather below is exact and the
        # tap spacing never collapses. Candidates are still SCORED only
        # inside the +/- sigma_window*sigma range (masked below) — the
        # wide gather provides tap context, not extra hypotheses.
        width = 2.0 * max_halfwidth
        xi_lo = center - 0.5 * width
        xi_hi = xi_lo + jnp.maximum(width, 1e-6)
    else:
        xi_lo = jnp.maximum(xi_lo, center - max_halfwidth)
        xi_hi = jnp.minimum(xi_hi, center + max_halfwidth)
        xi_hi = jnp.maximum(xi_hi, xi_lo + 1e-6)

    alphas = jnp.linspace(0.0, 1.0, num_samples, dtype=f32)
    xis = xi_lo[:, None] + (xi_hi - xi_lo)[:, None] * alphas[None, :]  # [N,S]

    # --- reference patch ----------------------------------------------
    # Patch direction: along the epipolar line in the ref image (from the
    # epipole through the feature); spacing is 1 pixel at the chosen level.
    e_hom = mmh(t_rc, K.T)
    # Homogeneous line direction through the feature and the epipole:
    # d ∝ uv * e_z - e_xy  (= e_z * (uv - epipole) when the epipole is
    # finite, and the correct at-infinity direction -e_xy as e_z -> 0).
    # An in-plane baseline (t_rc_z ~ 0 — e.g. a yaw pan with lateral
    # translation) puts the epipole at infinity; dividing by a guarded
    # e_z there fabricated a bogus finite epipole near the image origin
    # and rotated every ref patch tap off the epipolar direction, which
    # made the SSD profile garbage (mass max_cost failures + biased
    # matches) for ALL features. Tap sign is irrelevant (offsets are
    # symmetric).
    d_ref = state.uv_ref * e_hom[..., 2:3] - e_hom[..., :2]
    d_ref = d_ref / jnp.maximum(
        jnp.linalg.norm(d_ref, axis=-1, keepdims=True), 1e-12)

    offs = (jnp.arange(P, dtype=f32) - half)              # [P]
    dxi_step = (xi_hi - xi_lo) / (num_samples - 1)        # [N]
    # Both modes: ref taps at one level-pixel spacing (in line mode the
    # candidate samples are one level-pixel apart by construction, so
    # the sliding windows compare the same physical spacing).
    tap_step = lscale[:, None, None] * d_ref[:, None, :]  # [N, 1, 2]
    ref_uv = state.uv_ref[:, None, :] + offs[None, :, None] * tap_step  # [N,P,2]

    kf_flat = kf_pyrs.reshape(kf_pyrs.shape[0], -1)
    ref_patch, ref_ok = bilinear_pyramid_batched(
        kf_flat, state.kf_idx, (L, H, W), ref_uv, level[:, None])
    ref_grad = jnp.abs(jnp.diff(ref_patch, axis=-1)).mean(axis=-1)
    ref_grad_ok = (ref_grad >= min_ref_patch_grad) & ref_ok.all(axis=-1)

    if mode == "line":
        # --- sliding line sweep -----------------------------------------
        # Adjacent candidates share P-1 of their P taps (spacing is one
        # xi step on both axes), so ONE gather of S+P-1 points along the
        # epipolar curve replaces the [S, P] patch grid — 1/P the random
        # HBM reads, which dominate this op. The SSD then reduces over
        # static shifted slices of the gathered profile (pure VPU work).
        S = num_samples
        ext = jnp.arange(S + P - 1, dtype=f32) - half       # [S+P-1]
        xi_ext = xis[:, :1] + ext[None, :] * dxi_step[:, None]
        hom = A[:, None, :] + xi_ext[..., None] * B[:, None, :]
        in_front = hom[..., 2] > 1e-6                       # [N, S+P-1]
        zc = jnp.where(in_front, hom[..., 2], 1.0)
        uv_ext = hom[..., :2] / zc[..., None]               # [N, S+P-1, 2]
        line_vals, line_ok = bilinear_pyramid(
            img_pyr, uv_ext, level[:, None])
        lok = line_ok & in_front
        cand_vals = jnp.stack(
            [line_vals[:, p:p + S] for p in range(P)], -1)  # [N, S, P]
        # Taps beyond the idepth range are legitimate line context, but a
        # hypothesis is scored only if its xi is inside the idepth range
        # AND the posterior's +/- sigma_window*sigma band (half a step of
        # slack keeps the nearest-to-center candidate always scorable).
        allow = ((xis >= idepth_min) & (xis <= idepth_max)
                 & (xis >= (xi_lo_2s - 0.5 * dxi_step)[:, None])
                 & (xis <= (xi_hi_2s + 0.5 * dxi_step)[:, None]))
        cand_ok = jnp.stack(
            [lok[:, p:p + S] for p in range(P)], -1).all(-1) & allow
        cand_uv_center = uv_ext[:, half:half + S, :]        # [N, S, 2]
    else:
        # --- candidate patches: exact warp of ref-patch rays ------------
        ray_taps = cam.ray(ref_uv)                             # [N, P, 3]
        A_taps = mmh(quat_rotate(q_cr[:, None, :], ray_taps), K.T)  # [N,P,3]
        hom = (A_taps[:, None, :, :]
               + xis[:, :, None, None] * B[:, None, None, :])  # [N, S, P, 3]
        in_front = hom[..., 2] > 1e-6
        zc = jnp.where(in_front, hom[..., 2], 1.0)
        cand_uv = hom[..., :2] / zc[..., None]                 # [N, S, P, 2]
        cand_vals, cand_ok = bilinear_pyramid(
            img_pyr, cand_uv, level[:, None, None])
        cand_ok = (cand_ok & in_front).all(axis=-1)            # [N, S]
        cand_uv_center = cand_uv[:, :, half, :]
        allow = jnp.ones_like(cand_ok)

    if zero_mean_ssd:
        # Brightness-offset-invariant matching (auto-exposure cameras):
        # remove each window's mean before the SSD. Costs two means over
        # values already in registers; the profile-slope observation
        # model below is gradient-based and unaffected.
        ref_patch_c = ref_patch - ref_patch.mean(-1, keepdims=True)
        diff = (cand_vals - cand_vals.mean(-1, keepdims=True)
                - ref_patch_c[:, None, :])
    else:
        diff = cand_vals - ref_patch[:, None, :]
    cost = jnp.sum(diff * diff, axis=-1)                   # [N, S]
    BIG = f32(1e12)
    cost = jnp.where(cand_ok, cost, BIG)

    any_ok = cand_ok.any(axis=-1)
    best = jnp.argmin(cost, axis=-1)
    best_cost = jnp.take_along_axis(cost, best[:, None], 1)[:, 0]

    # Second-best outside a 2-level-pixel exclusion radius of the best.
    px_per_step = dxi_step * jnp.maximum(dpdxi, 1e-3)       # level-0 px
    s_idx = jax.lax.broadcasted_iota(jnp.int32, cost.shape, 1)
    dist_px = jnp.abs(s_idx - best[:, None]).astype(f32) * px_per_step[:, None]
    nearby = dist_px <= 2.0 * lscale[:, None]
    cost2 = jnp.where(nearby, BIG, cost)
    second_cost = jnp.min(cost2, axis=-1)
    has_second = second_cost < BIG
    ambiguous = has_second & (second_cost * ambiguous_match_ratio < best_cost)

    # --- subpixel refinement (parabola in xi) -------------------------
    bm1 = jnp.clip(best - 1, 0, num_samples - 1)
    bp1 = jnp.clip(best + 1, 0, num_samples - 1)
    cm = jnp.take_along_axis(cost, bm1[:, None], 1)[:, 0]
    cp = jnp.take_along_axis(cost, bp1[:, None], 1)[:, 0]
    c0 = best_cost
    denom = cm - 2 * c0 + cp
    interior = (best > 0) & (best < num_samples - 1) & (cm < BIG) & (cp < BIG)
    delta = jnp.where((denom > 1e-9) & interior,
                      0.5 * (cm - cp) / jnp.maximum(denom, 1e-9), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    xi_hat = (jnp.take_along_axis(xis, best[:, None], 1)[:, 0]
              + delta * dxi_step)
    xi_hat = jnp.clip(xi_hat, idepth_min, idepth_max)

    uv_match = jnp.take_along_axis(
        cand_uv_center, best[:, None, None].repeat(2, -1), 1)[:, 0, :]

    # --- observation variance -----------------------------------------
    # Photometric localization error in level pixels: noise / profile slope.
    g_along = jnp.abs(jnp.diff(cand_vals, axis=-1)).mean(axis=-1)  # [N,S]
    g_best = jnp.take_along_axis(g_along, best[:, None], 1)[:, 0]
    sigma_px2 = epipolar_line_var / jnp.maximum(g_best * g_best, 1e-2) + 0.25
    sigma_px2 = sigma_px2 * lscale * lscale     # level px -> level-0 px
    var_obs = sigma_px2 / jnp.maximum(dpdxi * dpdxi, 1e-8)
    var_obs = jnp.maximum(var_obs, 1e-8)

    # --- gates + taxonomy ---------------------------------------------
    attempted = state.valid & has_parallax & visible
    fail_ref_grad = attempted & ~ref_grad_ok
    searched = attempted & ref_grad_ok
    fail_oob = searched & ~any_ok
    matched = searched & any_ok
    # Best on the edge of the SCORED set: index edge, or (line mode) the
    # neighbor hypothesis fell outside the scored band.
    at_boundary = ((best == 0) | (best == num_samples - 1)
                   | ~jnp.take_along_axis(allow, bm1[:, None], 1)[:, 0]
                   | ~jnp.take_along_axis(allow, bp1[:, None], 1)[:, 0])
    fail_cost = matched & (best_cost > max_cost)
    good_cost = matched & (best_cost <= max_cost)
    # Censored match: best on the edge of a *truncated* window means the
    # true minimum may lie outside. Walk the mean there without collapsing
    # variance; the window recenters next frame. Edge matches of an
    # untruncated (full +/- w*sigma) window are just weak measurements and
    # go through normal fusion.
    boundary = good_cost & at_boundary & capped
    fail_amb = good_cost & ~boundary & ambiguous
    success = good_cost & ~boundary & ~ambiguous
    # Chi-square consistency: measurements wildly inconsistent with the
    # posterior are outliers (wrong-lobe matches), not updates.
    var_pred = state.var + process_noise
    consistent = ((xi_hat - state.mu) ** 2) <= 9.0 * (var_pred + var_obs)
    fail_amb = fail_amb | (success & ~consistent)
    success = success & consistent

    # --- posterior fusion ---------------------------------------------
    denom_f = var_pred + var_obs
    mu_new = jnp.where(success,
                       (var_obs * state.mu + var_pred * xi_hat) / denom_f,
                       jnp.where(boundary, xi_hat, state.mu))
    # Cap the per-update information gain: a single (possibly wrong-lobe)
    # observation must not collapse the posterior — convergence requires
    # several mutually consistent observations across baselines, during
    # which the chi-square gate + dropout counter kill bad tracks.
    var_fused = jnp.maximum(var_pred * var_obs / denom_f,
                            var_pred * min_var_ratio)
    var_new = jnp.where(success, var_fused,
                        jnp.where(attempted, var_pred, state.var))
    mu_new = jnp.clip(mu_new, idepth_min, idepth_max)

    hard_fail = fail_oob | fail_cost | fail_amb
    dropouts = jnp.where(success | boundary, 0,
                         jnp.where(hard_fail, state.dropouts + 1,
                                   state.dropouts))
    kill_dropout = state.valid & (dropouts > max_dropouts)
    kill_var = state.valid & (var_new > max_idepth_var)
    valid_new = state.valid & ~kill_dropout & ~kill_var

    status = jnp.full((N,), STATUS_SKIPPED, jnp.int32)
    status = jnp.where(fail_ref_grad, STATUS_REF_GRAD, status)
    status = jnp.where(fail_oob, STATUS_OOB, status)
    status = jnp.where(fail_cost, STATUS_MAX_COST, status)
    status = jnp.where(fail_amb, STATUS_AMBIGUOUS, status)
    status = jnp.where(boundary, STATUS_BOUNDARY, status)
    status = jnp.where(success, STATUS_OK, status)

    counts = {
        "num_idepth_updates": jnp.sum(success.astype(jnp.int32)),
        "num_fail_ref_patch_grad": jnp.sum(fail_ref_grad.astype(jnp.int32)),
        "num_fail_ambiguous_match": jnp.sum(fail_amb.astype(jnp.int32)),
        "num_fail_max_cost": jnp.sum(fail_cost.astype(jnp.int32)),
        "num_fail_max_dropouts": jnp.sum(kill_dropout.astype(jnp.int32)),
        "num_fail_max_var": jnp.sum(kill_var.astype(jnp.int32)),
    }

    new_state = FeatureFilterState(
        uv_ref=state.uv_ref, kf_idx=state.kf_idx,
        mu=mu_new, var=var_new, dropouts=dropouts, valid=valid_new,
        frame_id=state.frame_id)
    return EpipolarResult(state=new_state, status=status, xi_meas=xi_hat,
                          uv_match=uv_match, counts=counts)


def project_features(state: FeatureFilterState, kf_q, kf_t, cur_q, cur_t,
                     cam: Pinhole):
    """Project features (ref pixel + posterior idepth) into the current
    frame (reference `project_features` stage). Returns (uv_cur [N,2],
    idepth_cur [N], in_bounds [N])."""
    q_cr_k, t_cr_k, _ = relative_poses(kf_q, kf_t, cur_q, cur_t)
    q_cr = q_cr_k[state.kf_idx]
    t_cr = t_cr_k[state.kf_idx]
    ray = cam.ray(state.uv_ref)
    mu = jnp.maximum(state.mu, 1e-6)
    X_cur = quat_rotate(q_cr, ray) / mu[:, None] + t_cr
    z = X_cur[..., 2]
    ok = z > 1e-6
    uv = cam.project(jnp.where(ok[:, None], X_cur,
                               jnp.array([0.0, 0.0, 1.0])))
    idepth_cur = jnp.where(ok, 1.0 / jnp.maximum(z, 1e-6), 0.0)
    inb = ok & cam.in_bounds(uv)
    return uv, idepth_cur, inb

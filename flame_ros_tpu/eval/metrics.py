"""Ground-truth evaluation: confusion matrix + stats.txt protocol.

Bit-compatible reimplementation of the reference evaluation so numbers are
directly comparable (reference: getDepthConfusionMatrix src/utils.cc:326-368,
getTruthStats + stats.txt column schema src/flame_offline_tum.cc:320-398):

- detection = strictly positive GT depth; estimate valid = non-NaN idepth;
- true_pos: both valid -> error |xi_est - 1/depth_gt| accumulates;
- false_pos: estimate without GT -> error |xi_est| accumulates (reference
  charges the full estimated idepth as error);
- false_neg: GT without estimate; true_neg: neither.

The hot reduction runs on device; the writer reproduces the reference's
stats.txt columns exactly.
"""
from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

STATS_COLUMNS = (
    "idx", "timestamp", "runtime", "num_vtx", "num_tris",
    "true_pos", "true_neg", "false_pos", "false_neg",
    "total_idepth_error", "avg_idepth_error", "precision", "recall",
    "total_photo_error", "avg_photo_error",
)


@jax.jit
def depth_confusion_matrix(idepths, depth):
    """Device confusion matrix (reference getDepthConfusionMatrix).

    idepths: [H, W] estimated inverse depth, NaN where invalid.
    depth:   [H, W] GT depth in meters, <= 0 where invalid.
    Returns dict with idepth_error map (NaN where no error defined),
    total_error, true_pos/true_neg/false_pos/false_neg.
    """
    has_gt = depth > 0
    has_est = jnp.isfinite(idepths)
    idepth_true = jnp.where(has_gt, 1.0 / jnp.maximum(depth, 1e-9), 0.0)

    tp = has_gt & has_est
    fn = has_gt & ~has_est
    fp = ~has_gt & has_est
    tn = ~has_gt & ~has_est

    err_tp = jnp.abs(jnp.nan_to_num(idepths) - idepth_true)
    err_fp = jnp.abs(jnp.nan_to_num(idepths))
    err = jnp.where(tp, err_tp, jnp.where(fp, err_fp, jnp.nan))
    total = jnp.sum(jnp.where(tp | fp, jnp.nan_to_num(err), 0.0))
    return {
        "idepth_error": err,
        "total_error": total,
        "true_pos": jnp.sum(tp.astype(jnp.int32)),
        "true_neg": jnp.sum(tn.astype(jnp.int32)),
        "false_pos": jnp.sum(fp.astype(jnp.int32)),
        "false_neg": jnp.sum(fn.astype(jnp.int32)),
    }


@jax.jit
def idepth_rmse(idepths, depth):
    """Inverse-depth RMSE over pixels with both GT and estimate (the
    BASELINE.md headline accuracy metric)."""
    has = (depth > 0) & jnp.isfinite(idepths)
    idepth_true = jnp.where(depth > 0, 1.0 / jnp.maximum(depth, 1e-9), 0.0)
    se = jnp.where(has, (jnp.nan_to_num(idepths) - idepth_true) ** 2, 0.0)
    n = jnp.maximum(jnp.sum(has.astype(jnp.float32)), 1.0)
    return jnp.sqrt(jnp.sum(se) / n)


@jax.jit
def depth_metrics(idepths, depth):
    """Standard monodepth accuracy metrics over covered GT pixels
    (beyond the reference's confusion matrix/RMSE — included so runs are
    directly comparable against the monodepth literature):
    abs_rel = mean(|d_est - d_gt| / d_gt), and the delta inlier ratios
    P(max(d_est/d_gt, d_gt/d_est) < 1.25^k) for k = 1, 2, 3.
    Depths are evaluated in METERS (estimates converted from inverse
    depth)."""
    has = (depth > 0) & jnp.isfinite(idepths) & (idepths > 1e-6)
    d_est = 1.0 / jnp.maximum(jnp.nan_to_num(idepths, nan=1.0), 1e-6)
    d_gt = jnp.maximum(depth, 1e-6)
    n = jnp.maximum(jnp.sum(has.astype(jnp.float32)), 1.0)
    abs_rel = jnp.sum(jnp.where(has, jnp.abs(d_est - d_gt) / d_gt,
                                0.0)) / n
    ratio = jnp.maximum(d_est / d_gt, d_gt / d_est)
    out = {"abs_rel": abs_rel}
    for k, thr in ((1, 1.25), (2, 1.25 ** 2), (3, 1.25 ** 3)):
        out[f"delta{k}"] = jnp.sum(
            jnp.where(has, (ratio < thr).astype(jnp.float32), 0.0)) / n
    return out


def align_trajectory(est_t: np.ndarray, gt_t: np.ndarray,
                     with_scale: bool = False):
    """Umeyama/Horn closed-form trajectory alignment.

    est_t, gt_t: [N, 3] camera positions. Returns (s, R, t) minimizing
    || gt - (s * R @ est + t) ||^2 over rotations R (and uniform scale s
    when with_scale, else s = 1 — the SE3/Horn variant).
    """
    est = np.asarray(est_t, np.float64)
    gt = np.asarray(gt_t, np.float64)
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    E = est - mu_e
    G = gt - mu_g
    C = G.T @ E / len(est)
    U, S, Vt = np.linalg.svd(C)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    if with_scale:
        var_e = (E ** 2).sum() / len(est)
        s = float(np.trace(np.diag(S) @ D) / max(var_e, 1e-12))
    else:
        s = 1.0
    t = mu_g - s * R @ mu_e
    return s, R, t


def ate_rmse(est_t: np.ndarray, gt_t: np.ndarray,
             align: str = "se3") -> float:
    """Absolute trajectory error RMSE (the tracking-mode headline metric;
    the reference's trajectory-consuming analog is its whole pose-graph
    frontend, src/flame_nodelet.cc:414-479 — it never evaluates ATE, so
    the protocol here follows the TUM RGB-D benchmark's evaluate_ate:
    Horn-align estimated positions to GT, then RMSE of the residuals).

    align: "se3" (Horn rotation+translation — scale errors COUNT, since
    the monocular scale is anchored by the bootstrap depth), "sim3"
    (+uniform scale, diagnostic: drift with scale removed), or "none"
    (origin-aligned raw residuals — both trajectories start at identity).
    """
    est = np.asarray(est_t, np.float64)
    gt = np.asarray(gt_t, np.float64)
    if align == "none":
        res = gt - est
    else:
        s, R, t = align_trajectory(est, gt, with_scale=(align == "sim3"))
        res = gt - (s * (R @ est.T).T + t)
    return float(np.sqrt(np.mean(np.sum(res ** 2, axis=1))))


def _rotmats_from_quats(q: np.ndarray) -> np.ndarray:
    """[N, 4] (w,x,y,z) unit quaternions -> [N, 3, 3] rotation matrices
    (numpy, float64 — eval-side, never traced)."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = np.empty((len(q), 3, 3))
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - w * z)
    R[:, 0, 2] = 2 * (x * z + w * y)
    R[:, 1, 0] = 2 * (x * y + w * z)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - w * x)
    R[:, 2, 0] = 2 * (x * z - w * y)
    R[:, 2, 1] = 2 * (y * z + w * x)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def rpe(est_q: np.ndarray, est_t: np.ndarray,
        gt_q: np.ndarray, gt_t: np.ndarray,
        delta: int = 1) -> dict:
    """Relative pose error over frame pairs (i, i+delta) — the TUM RGB-D
    benchmark's evaluate_rpe protocol, the standard complement to ATE
    for rotation-dominant paths: ATE on a short-baseline pan bounds
    almost nothing (a 0.27 m path caps position error at centimetres no
    matter how bad the rotations are), while rotational RPE sees every
    per-frame orientation mistake directly. The reference never
    evaluates trajectories (its poses are inputs); this follows the
    public TUM tool so numbers are comparable across systems.

    Per pair: E_i = (P_gt_i^-1 P_gt_{i+d})^-1 (P_est_i^-1 P_est_{i+d});
    translational error = ||trans(E_i)|| (metres), rotational error =
    angle(rot(E_i)) (degrees). Inputs: [N, 4] (w,x,y,z) quats + [N, 3]
    positions, camera-to-world, frame-aligned est/gt. Returns rmse,
    mean, and max for both error families.
    """
    est_q, est_t = np.asarray(est_q), np.asarray(est_t, np.float64)
    gt_q, gt_t = np.asarray(gt_q), np.asarray(gt_t, np.float64)
    n = len(est_t)
    if n != len(gt_t) or n < delta + 1:
        raise ValueError(f"need matched trajectories with > delta={delta} "
                         f"poses, got {n} est / {len(gt_t)} gt")
    Re, Rg = _rotmats_from_quats(est_q), _rotmats_from_quats(gt_q)
    i, j = np.arange(n - delta), np.arange(delta, n)
    # Relative motions P_i^-1 P_j: R_rel = R_i^T R_j, t_rel = R_i^T (t_j - t_i)
    Re_rel = np.einsum("nba,nbc->nac", Re[i], Re[j])
    te_rel = np.einsum("nba,nb->na", Re[i], est_t[j] - est_t[i])
    Rg_rel = np.einsum("nba,nbc->nac", Rg[i], Rg[j])
    tg_rel = np.einsum("nba,nb->na", Rg[i], gt_t[j] - gt_t[i])
    # Error transform E = rel_gt^-1 rel_est
    RE = np.einsum("nba,nbc->nac", Rg_rel, Re_rel)
    tE = np.einsum("nba,nb->na", Rg_rel, te_rel - tg_rel)
    t_err = np.linalg.norm(tE, axis=1)
    cos = np.clip((np.trace(RE, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    r_err = np.degrees(np.arccos(cos))
    rms = lambda v: float(np.sqrt(np.mean(v ** 2)))
    return {"trans_rmse": rms(t_err), "trans_mean": float(t_err.mean()),
            "trans_max": float(t_err.max()),
            "rot_rmse_deg": rms(r_err), "rot_mean_deg": float(r_err.mean()),
            "rot_max_deg": float(r_err.max()), "delta": int(delta),
            "pairs": int(n - delta)}


@dataclass
class TruthStats:
    true_pos: int
    true_neg: int
    false_pos: int
    false_neg: int
    total_error: float
    avg_error: float
    precision: float
    recall: float
    rmse: float
    idepth_error: np.ndarray = None

    @staticmethod
    def from_record(rec: dict) -> "TruthStats":
        """Build from the engine's packed device stats (the GT block of
        DEVICE_STATS_KEYS; avoids pulling the dense error map)."""
        tp = int(rec["true_pos"])
        fp = int(rec["false_pos"])
        fn = int(rec["false_neg"])
        total = float(rec["total_idepth_error"])
        return TruthStats(
            true_pos=tp, true_neg=int(rec["true_neg"]), false_pos=fp,
            false_neg=fn, total_error=total,
            avg_error=total / (tp + fp) if tp + fp else float("nan"),
            precision=tp / (tp + fp) if tp + fp else float("nan"),
            recall=tp / (tp + fn) if tp + fn else float("nan"),
            rmse=float(rec["idepth_rmse"]))


def truth_stats(idepths: np.ndarray, depth: np.ndarray) -> TruthStats:
    """Host-facing wrapper (reference getTruthStats computation block)."""
    cm = depth_confusion_matrix(jnp.asarray(idepths, jnp.float32),
                                jnp.asarray(depth, jnp.float32))
    rmse = float(idepth_rmse(jnp.asarray(idepths, jnp.float32),
                             jnp.asarray(depth, jnp.float32)))
    tp = int(cm["true_pos"])
    tn = int(cm["true_neg"])
    fp = int(cm["false_pos"])
    fn = int(cm["false_neg"])
    total = float(cm["total_error"])
    denom_p = tp + fp
    denom_r = tp + fn
    return TruthStats(
        true_pos=tp, true_neg=tn, false_pos=fp, false_neg=fn,
        total_error=total,
        avg_error=total / denom_p if denom_p else float("nan"),
        precision=tp / denom_p if denom_p else float("nan"),
        recall=tp / denom_r if denom_r else float("nan"),
        rmse=rmse,
        idepth_error=np.asarray(cm["idepth_error"]),
    )


class StatsFileWriter:
    """Appends the reference's stats.txt rows (exact column schema,
    src/flame_offline_tum.cc:360-396)."""

    def __init__(self, output_dir: str, fname: str = "stats.txt"):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, fname)
        self._wrote_header = os.path.exists(self.path) and \
            os.path.getsize(self.path) > 0

    def append(self, idx: int, timestamp: float, runtime_ms: float,
               num_vtx: int, num_tris: int, ts: TruthStats,
               total_photo_error: float, avg_photo_error: float):
        with open(self.path, "a") as f:
            if not self._wrote_header:
                f.write(" ".join(STATS_COLUMNS) + "\n")
                self._wrote_header = True
            f.write(f"{idx} {timestamp:.6f} {runtime_ms:.6f} "
                    f"{num_vtx} {num_tris} "
                    f"{ts.true_pos} {ts.true_neg} {ts.false_pos} "
                    f"{ts.false_neg} "
                    f"{ts.total_error:.6f} {ts.avg_error:.6f} "
                    f"{ts.precision:.6f} {ts.recall:.6f} "
                    f"{total_photo_error:.6f} {avg_photo_error:.6f}\n")


def load_stats_file(path: str) -> dict:
    """Parse a stats.txt back into column arrays."""
    with open(path) as f:
        header = f.readline().split()
        rows = [[float(x) for x in line.split()] for line in f if line.strip()]
    arr = np.asarray(rows)
    return {c: arr[:, i] for i, c in enumerate(header)} if len(rows) else \
        {c: np.zeros(0) for c in header}

"""Grid-based feature detection, fully on device.

Reference behavior (README.md:204-210, cfg features/detection, engine stage
timings `detection`/`detection_loop`): partition the image into
win_size x win_size cells and select the best trackable pixel per cell —
highest gradient magnitude above `min_grad_mag` — skipping cells already
covered by live features. `do_letterbox` restricts detection to the middle
third of image rows (cfg features/do_letterbox).

TPU design: the per-cell argmax is a reshape to [nCy, win, nCx, win] and a
batched argmax — no loops; output is a fixed-shape [n_cells] candidate set
with a validity mask, which the engine merges into free feature slots.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from flame_ros_tpu.ops.gradients import gradient_magnitude


def cell_grid_shape(height: int, width: int, win_size: int) -> tuple[int, int]:
    return height // win_size, width // win_size


@partial(jax.jit, static_argnames=("win_size", "do_letterbox"))
def detect_features(img, occupied_cells, *, win_size: int,
                    min_grad_mag: float, do_letterbox: bool = False):
    """Detect one candidate feature per free grid cell.

    Args:
      img: [H, W] grayscale float32.
      occupied_cells: [nCy, nCx] bool — cells already covered by live
        features (computed by the engine from projected feature positions).
      win_size: detection cell size.
      min_grad_mag: min gradient magnitude for a valid detection.
      do_letterbox: restrict to middle third of rows.

    Returns:
      uv: [n_cells, 2] float32 pixel coords of per-cell best pixel.
      score: [n_cells] gradient magnitude of that pixel.
      valid: [n_cells] bool (cell free, score above threshold, in letterbox).
    """
    H, W = img.shape
    nCy, nCx = cell_grid_shape(H, W, win_size)
    Hc, Wc = nCy * win_size, nCx * win_size

    mag = gradient_magnitude(img)
    # Never detect on the outermost pixels (patch sampling needs margin).
    border = 2
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = ((row >= border) & (row < H - border)
                & (col >= border) & (col < W - border))
    mag = jnp.where(interior, mag, -1.0)

    cells = mag[:Hc, :Wc].reshape(nCy, win_size, nCx, win_size)
    cells = cells.transpose(0, 2, 1, 3).reshape(nCy, nCx, win_size * win_size)
    best = jnp.argmax(cells, axis=-1)
    score = jnp.take_along_axis(cells, best[..., None], axis=-1)[..., 0]
    dy = best // win_size
    dx = best % win_size
    cy = jax.lax.broadcasted_iota(jnp.int32, (nCy, nCx), 0)
    cx = jax.lax.broadcasted_iota(jnp.int32, (nCy, nCx), 1)
    u = (cx * win_size + dx).astype(jnp.float32)
    v = (cy * win_size + dy).astype(jnp.float32)

    valid = (score >= min_grad_mag) & ~occupied_cells
    if do_letterbox:
        letter = (cy >= nCy // 3) & (cy < (2 * nCy) // 3)
        valid = valid & letter

    uv = jnp.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
    return uv, score.reshape(-1), valid.reshape(-1)


def occupancy_from_features(feat_uv, feat_valid, height: int, width: int,
                            win_size: int):
    """Mark cells containing a live feature as occupied.

    feat_uv: [N, 2] current-frame positions; feat_valid: [N] bool.
    Returns [nCy, nCx] bool.
    """
    nCy, nCx = cell_grid_shape(height, width, win_size)
    cx = jnp.clip((feat_uv[:, 0] // win_size).astype(jnp.int32), 0, nCx - 1)
    cy = jnp.clip((feat_uv[:, 1] // win_size).astype(jnp.int32), 0, nCy - 1)
    # One-hot matmul instead of a scatter-max: TPU scatters with runtime
    # indices serialize (~µs per element — the 2048-lane scatter measured
    # ~6 ms inside the poseframe dispatch), while the one-hot product
    # fuses into a single MXU op.
    cell = cy * nCx + cx
    C = nCy * nCx
    oh = (cell[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None])
    cnt = jnp.dot(oh.astype(jnp.bfloat16),
                  feat_valid.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    return (cnt > 0).reshape(nCy, nCx)

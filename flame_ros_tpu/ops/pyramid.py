"""Image pyramids stored as a single padded [L, H, W] tensor.

Level l is a 2^l-downsampled (2x2 mean-pooled) image stored ROW-MAJOR
FLAT at the start of plane l: plane l's first (H>>l)*(W>>l) elements are
the level image raveled with its own row stride W>>l (zero padding
after). Keeping all levels in one fixed-shape array makes per-feature
level selection a pure index computation — one gather serves every
scale, which is what lets the epipolar search pick its scale per feature
without data-dependent shapes (SURVEY §7: "epipolar search ... over the
image pyramid").

The flat-row layout (rather than each level occupying the top-left 2D
corner of its plane) exists for TPU packing speed: writing a small level
into a 2D corner of a padded plane costs a strided relayout (~5 ms/frame
at VGA, measured), while a raveled level packs with one contiguous 1D
pad. Level 0 fills its whole plane, so `pyr[0]` is still the full-res
image; other levels must be read through the samplers below or
`level_view`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _down_mat(n: int):
    """[n/2, n] banded 2-tap averaging matrix (rows sum to 1)."""
    i = jnp.arange(n // 2, dtype=jnp.int32)[:, None]
    j = jnp.arange(n, dtype=jnp.int32)[None, :]
    return 0.5 * ((j == 2 * i) | (j == 2 * i + 1)).astype(jnp.float32)


@partial(jax.jit, static_argnames=("num_levels",))
def build_pyramid(img, num_levels: int = 3):
    """img [H, W] -> [L, H, W] padded pyramid (2x2 mean pooling).

    The downsample runs as two banded-matrix contractions (D_h @ img @
    D_w^T) instead of stride-2 slicing: strided lane access forces
    cross-lane relayouts on TPU (measured 7.2 ms at VGA), while the
    contractions ride the MXU (<1 ms). HIGHEST precision keeps the
    result an exact f32 4-tap mean."""
    H, W = img.shape
    assert H % (1 << (num_levels - 1)) == 0
    assert W % (1 << (num_levels - 1)) == 0
    rows = [img.ravel()]
    cur = img
    for l in range(1, num_levels):
        Dh = _down_mat(H >> (l - 1))
        Dw = _down_mat(W >> (l - 1))
        cur = jnp.dot(jnp.dot(Dh, cur, precision=jax.lax.Precision.HIGHEST),
                      Dw.T, precision=jax.lax.Precision.HIGHEST)
        rows.append(jax.lax.pad(cur.ravel(), jnp.array(0, img.dtype),
                                [(0, H * W - cur.size, 0)]))
    return jnp.stack(rows).reshape(num_levels, H, W)


def level_view(pyr, l: int):
    """2D [H>>l, W>>l] view of level l (host/debug use)."""
    L, H, W = pyr.shape
    h, w = H >> l, W >> l
    return pyr[l].reshape(-1)[:h * w].reshape(h, w)


def _level_coords(uv, level_f):
    """Level-0 pixel coords -> level-l coords (pixel-center aligned)."""
    scale = jnp.exp2(-level_f)
    u = (uv[..., 0] + 0.5) * scale - 0.5
    v = (uv[..., 1] + 0.5) * scale - 0.5
    return u, v, scale


def bilinear_pyramid(pyr, uv, level, *, out_of_bounds: float = 0.0):
    """Bilinear sample pyramid at level-0 coords `uv` from `level` (int32,
    broadcastable to uv[..., 0]). Returns (values, valid)."""
    L, H, W = pyr.shape
    level = jnp.broadcast_to(level, uv[..., 0].shape)
    level_f = level.astype(jnp.float32)
    u, v, scale = _level_coords(uv, level_f)
    Wl = W * scale
    Hl = H * scale
    valid = (u >= 0) & (u <= Wl - 1) & (v >= 0) & (v <= Hl - 1)
    u = jnp.clip(u, 0.0, jnp.maximum(Wl - 1.000001, 0.0))
    v = jnp.clip(v, 0.0, jnp.maximum(Hl - 1.000001, 0.0))
    u0 = jnp.minimum(jnp.floor(u).astype(jnp.int32),
                     (Wl - 2).astype(jnp.int32))
    v0 = jnp.minimum(jnp.floor(v).astype(jnp.int32),
                     (Hl - 2).astype(jnp.int32))
    u0 = jnp.maximum(u0, 0)
    v0 = jnp.maximum(v0, 0)
    au = u - u0
    av = v - v0
    flat = pyr.reshape(-1)
    # Levels are raveled with their OWN row stride W>>l (see module doc).
    Wl_i = jnp.round(Wl).astype(jnp.int32)
    idx = level * (H * W) + v0 * Wl_i + u0
    i00 = jnp.take(flat, idx, mode="clip")
    i01 = jnp.take(flat, idx + 1, mode="clip")
    i10 = jnp.take(flat, idx + Wl_i, mode="clip")
    i11 = jnp.take(flat, idx + Wl_i + 1, mode="clip")
    val = ((i00 * (1 - au) + i01 * au) * (1 - av)
           + (i10 * (1 - au) + i11 * au) * av)
    return jnp.where(valid, val, out_of_bounds), valid


def bilinear_pyramid_batched(pyrs_flat, row_idx, shape, uv, level,
                             *, out_of_bounds: float = 0.0):
    """Like bilinear_pyramid but over a batch of pyramids.

    pyrs_flat: [K, L*H*W] flattened pyramids; row_idx: [N] int32 selecting a
    pyramid per leading element of uv [N, ..., 2]; shape: (L, H, W).
    """
    L, H, W = shape
    level = jnp.broadcast_to(level, uv[..., 0].shape)
    level_f = level.astype(jnp.float32)
    u, v, scale = _level_coords(uv, level_f)
    Wl = W * scale
    Hl = H * scale
    valid = (u >= 0) & (u <= Wl - 1) & (v >= 0) & (v <= Hl - 1)
    u = jnp.clip(u, 0.0, jnp.maximum(Wl - 1.000001, 0.0))
    v = jnp.clip(v, 0.0, jnp.maximum(Hl - 1.000001, 0.0))
    u0 = jnp.maximum(jnp.minimum(jnp.floor(u).astype(jnp.int32),
                                 (Wl - 2).astype(jnp.int32)), 0)
    v0 = jnp.maximum(jnp.minimum(jnp.floor(v).astype(jnp.int32),
                                 (Hl - 2).astype(jnp.int32)), 0)
    au = u - u0
    av = v - v0
    # Single flat gather: fold the pyramid id into the index instead of
    # materializing per-feature pyramid rows (a [N, L*H*W] gather would be
    # gigabytes).
    plane = L * H * W
    shape_suffix = (1,) * (uv.ndim - 2)
    base = (row_idx.reshape(row_idx.shape + shape_suffix) * plane)
    Wl_i = jnp.round(Wl).astype(jnp.int32)
    idx = base + level * (H * W) + v0 * Wl_i + u0
    flat = pyrs_flat.reshape(-1)

    def take(i):
        return jnp.take(flat, i, mode="clip")

    i00, i01 = take(idx), take(idx + 1)
    i10, i11 = take(idx + Wl_i), take(idx + Wl_i + 1)
    val = ((i00 * (1 - au) + i01 * au) * (1 - av)
           + (i10 * (1 - au) + i11 * au) * av)
    return jnp.where(valid, val, out_of_bounds), valid

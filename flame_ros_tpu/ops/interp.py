"""Device-side bilinear image sampling.

The workhorse gather primitive behind epipolar patch matching and dense
warping (the reference does per-pixel interpolation inside its C++ engine's
`interpolate` stage, reference timing key msg/FlameStats.msg:34). XLA lowers
these gathers onto the TPU's vector units; all call sites keep shapes static
and batched so the op stays one fused gather.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear(img, uv, *, out_of_bounds: float = 0.0):
    """Sample img [H, W] at uv [..., 2] (u=x=col, v=y=row), bilinear.

    Out-of-bounds samples return `out_of_bounds` and are flagged in the
    returned mask. Returns (values [...], valid [...]).
    """
    H, W = img.shape
    u = uv[..., 0]
    v = uv[..., 1]
    valid = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)
    u = jnp.clip(u, 0.0, W - 1.000001)
    v = jnp.clip(v, 0.0, H - 1.000001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u0 = jnp.minimum(u0, W - 2)
    v0 = jnp.minimum(v0, H - 2)
    au = u - u0
    av = v - v0
    flat = img.reshape(-1)
    idx = v0 * W + u0
    i00 = jnp.take(flat, idx, mode="clip")
    i01 = jnp.take(flat, idx + 1, mode="clip")
    i10 = jnp.take(flat, idx + W, mode="clip")
    i11 = jnp.take(flat, idx + W + 1, mode="clip")
    val = ((i00 * (1 - au) + i01 * au) * (1 - av)
           + (i10 * (1 - au) + i11 * au) * av)
    return jnp.where(valid, val, out_of_bounds), valid


def nearest(img, uv, *, out_of_bounds: float = 0.0):
    """Nearest-neighbor sample img [H, W] at uv [..., 2]."""
    H, W = img.shape
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    valid = (u >= 0) & (u < W) & (v >= 0) & (v < H)
    idx = jnp.clip(v, 0, H - 1) * W + jnp.clip(u, 0, W - 1)
    val = jnp.take(img.reshape(-1), idx, mode="clip")
    return jnp.where(valid, val, out_of_bounds), valid

"""Exact-f32 contraction helpers for geometry-critical math.

On TPU, ``jnp.dot`` / ``@`` / ``jnp.einsum`` with float32 inputs and
DEFAULT precision truncate the operands to bfloat16 (8 mantissa bits)
before the MXU. For geometry that is catastrophic: a pixel coordinate
u in [512, 640) quantizes to a 4-px grid, an epipolar direction picks
up ~0.2% error, and GN normal equations lose the curvature the solve
needs. Measured on the VGA/120 rotation acceptance protocol (identical
code + inputs): idepth rmse 0.029 on CPU, 0.100 on TPU at DEFAULT
matmul precision, 0.028 on TPU at HIGHEST — the entire chip-accuracy
delta was matmul input truncation (BENCH_NOTES §round-4 TPU numerics).

Every geometry-critical contraction in the package goes through these
helpers (or passes precision=HIGHEST explicitly). Hot image-path ops
DESIGNED for bf16 (ops/nltgv2.py dual reduction, ops/detection.py cell
counts) cast to bfloat16 explicitly and are exempt — their bf16 cost
is already part of the recorded CPU accuracy numbers, since the
explicit cast truncates on every backend. The reference computes all
of this in full f32 on CPU (e.g. flame/stereo/inverse_depth_filter.h,
flame/stereo/epipolar_geometry.h), so precision parity on TPU requires
HIGHEST here, not DEFAULT. These contractions are tiny (3-wide or
6-wide inner dimensions); HIGHEST costs nothing measurable next to the
image-path work.
"""
import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def mmh(a, b):
    """``jnp.matmul`` with f32-exact (HIGHEST) precision."""
    return jnp.matmul(a, b, precision=HIGHEST)


def einsumh(subscripts, *operands):
    """``jnp.einsum`` with f32-exact (HIGHEST) precision."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)

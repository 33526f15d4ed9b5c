"""Image gradients on device.

Central-difference gradients + magnitude, the trackability signal behind
feature detection (reference behavior: best-gradient pixel per detection
cell gated by min_grad_mag — README.md:204-210, cfg features/detection).
Expressed as shifts/subtractions so XLA fuses it into one VPU pass.
"""
from __future__ import annotations

import jax.numpy as jnp


def central_gradients(img):
    """Central differences. img [H, W] -> (gx, gy) each [H, W].

    Border pixels use one-sided differences.
    """
    gx_mid = 0.5 * (img[:, 2:] - img[:, :-2])
    gx = jnp.concatenate([
        (img[:, 1:2] - img[:, 0:1]), gx_mid, (img[:, -1:] - img[:, -2:-1])
    ], axis=1)
    gy_mid = 0.5 * (img[2:, :] - img[:-2, :])
    gy = jnp.concatenate([
        (img[1:2, :] - img[0:1, :]), gy_mid, (img[-1:, :] - img[-2:-1, :])
    ], axis=0)
    return gx, gy


def gradient_magnitude(img):
    gx, gy = central_gradients(img)
    return jnp.sqrt(gx * gx + gy * gy)

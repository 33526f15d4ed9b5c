"""Pallas TPU kernel for triangle-id rasterization.

Same math as ops/raster.rasterize_tri_ids (MXU edge-function matmuls with
per-block y-culling) but as a hand-scheduled kernel: the full edge
coefficient matrix (~150 KB at T=4096) and triangle metadata are pinned in
VMEM across the whole pixel-tile grid, each grid program owns one
row-tile of the id buffer, and the block loop runs entirely on-chip — no
HBM round-trips between blocks, no per-tile re-fetch of coefficients.

Used on TPU backends; tests exercise it in interpreter mode on CPU and
check bit-equality with the XLA formulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(C_ref, tvalid_ref, ymin_ref, ymax_ref, out_ref, *,
            row_tile: int, width: int, tri_block: int, n_blocks: int,
            big: int):
    i = pl.program_id(0)
    y_lo = (i * row_tile).astype(jnp.float32)
    px = row_tile * width
    ux = jax.lax.broadcasted_iota(jnp.float32, (row_tile, width), 1)
    uy = jax.lax.broadcasted_iota(jnp.float32, (row_tile, width), 0) + y_lo
    P = jnp.stack([ux.reshape(px), uy.reshape(px),
                   jnp.ones((px,), jnp.float32)], axis=-1)   # [px, 3]
    eps = jnp.float32(-1e-3)

    def body(k, best):
        def do(best):
            Cb = C_ref[:, pl.ds(k * (tri_block * 3), tri_block * 3)]
            E = jnp.dot(P, Cb, preferred_element_type=jnp.float32)
            E = E.reshape(px, tri_block, 3)
            tv = tvalid_ref[pl.ds(k * tri_block, tri_block)] > 0
            inside = (E >= eps).all(-1) & tv[None, :]
            ids = (k * tri_block
                   + jax.lax.broadcasted_iota(jnp.int32, (px, tri_block), 1))
            cand = jnp.where(inside, ids, big).min(-1)
            return jnp.minimum(best, cand)

        overlap = ((ymax_ref[k, 0] >= y_lo)
                   & (ymin_ref[k, 0] < y_lo + row_tile))
        return jax.lax.cond(overlap, do, lambda b: b, best)

    best = jax.lax.fori_loop(0, n_blocks, body,
                             jnp.full((px,), big, jnp.int32))
    out_ref[:, :] = jnp.where(best < big, best, -1).reshape(row_tile, width)


@functools.partial(jax.jit, static_argnames=("height", "width", "row_tile",
                                             "tri_block", "interpret"))
def rasterize_tri_ids_pallas(vtx_pos, tris, tri_valid, *, height: int,
                             width: int, row_tile: int = 8,
                             tri_block: int = 256,
                             interpret: bool = False):
    """Drop-in Pallas equivalent of raster.rasterize_tri_ids."""
    T = tris.shape[0]
    B = min(tri_block, T)
    if T % B:
        B = T
    n_blocks = T // B
    a = vtx_pos[tris[:, 0]]
    b = vtx_pos[tris[:, 1]]
    c = vtx_pos[tris[:, 2]]

    def edge_coeffs(p0, p1):
        dy = p1[:, 1] - p0[:, 1]
        dx = p1[:, 0] - p0[:, 0]
        return jnp.stack([-dy, dx, dy * p0[:, 0] - dx * p0[:, 1]], -1)

    C = jnp.stack([edge_coeffs(a, b), edge_coeffs(b, c),
                   edge_coeffs(c, a)], -1)
    C = C.transpose(1, 0, 2).reshape(3, T * 3)
    ys = jnp.stack([a[:, 1], b[:, 1], c[:, 1]], -1)
    y_min = jnp.where(tri_valid, ys.min(-1), jnp.inf).reshape(n_blocks, B)
    y_max = jnp.where(tri_valid, ys.max(-1), -jnp.inf).reshape(n_blocks, B)
    blk_ymin = y_min.min(-1).reshape(n_blocks, 1)
    blk_ymax = y_max.max(-1).reshape(n_blocks, 1)

    n_tiles = height // row_tile
    kernel = functools.partial(
        _kernel, row_tile=row_tile, width=width, tri_block=B,
        n_blocks=n_blocks, big=T + 1)
    return pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, T * 3), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_blocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.int32),
        interpret=interpret,
    )(C, tri_valid.astype(jnp.float32), blk_ymin, blk_ymax)

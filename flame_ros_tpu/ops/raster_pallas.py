"""Pallas TPU kernel for triangle-id rasterization.

Same math as ops/raster.rasterize_tri_ids (CCW edge-function inside tests
with per-block y-culling) as a hand-scheduled kernel: triangle edge
coefficients stay pinned in VMEM across the whole pixel grid, each grid
program owns a tile of pixels, and the triangle-block loop runs on-chip.

Mosaic-friendly layout notes: no cross-lane reshapes — pixels are indexed
as a flat [px, 1] column (iota / div / mod), edge functions are evaluated
as broadcasted outer products `ux*A + uy*B + C` ([px,1]*[1,B] -> [px,B])
on the VPU, and the output is a [H*W, 1] column reshaped outside the
kernel.

Used on TPU backends (EngineParams.use_pallas_raster); tests exercise
interpreter mode on CPU and check bit-equality with the XLA formulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bounds_ref, A_ref, Bc_ref, Cc_ref, tvalid_ref,
            out_ref, *, px_tile: int, width: int, tri_block: int,
            big: int):
    i = pl.program_id(0)
    idx = jax.lax.broadcasted_iota(jnp.int32, (px_tile, 1), 0) \
        + i * px_tile
    ux = (idx % width).astype(jnp.float32)
    uy = (idx // width).astype(jnp.float32)
    eps = jnp.float32(-1e-3)
    BIG = jnp.int32(big)

    def body(k, best):
        sl = pl.ds(k * tri_block, tri_block)
        inside = None
        for e_ref in (A_ref, Bc_ref, Cc_ref):
            a = e_ref[0:1, sl]       # [1, B] x-coeff
            b = e_ref[1:2, sl]       # [1, B] y-coeff
            c = e_ref[2:3, sl]       # [1, B] const
            E = ux * a + uy * b + c  # [px, B]
            cond = E >= eps
            inside = cond if inside is None else (inside & cond)
        tv = tvalid_ref[0:1, sl] > 0
        inside = inside & tv
        ids = (k * tri_block
               + jax.lax.broadcasted_iota(jnp.int32,
                                          (px_tile, tri_block), 1))
        cand = jnp.min(jnp.where(inside, ids, BIG), axis=1,
                       keepdims=True)
        return jnp.minimum(best, cand)

    # Triangles are y-sorted, so the blocks touching this tile form a
    # CONTIGUOUS range precomputed per tile — the loop does exactly the
    # needed work with no in-kernel branching. bounds lives whole in SMEM
    # (a blocked SMEM spec is rejected by Mosaic); index by program id.
    lo = bounds_ref[i, 0]
    hi = bounds_ref[i, 1]
    best = jax.lax.fori_loop(lo, hi, body,
                             jnp.full((px_tile, 1), BIG, jnp.int32))
    out_ref[:, :] = jnp.where(best < BIG, best, -1)


@functools.partial(jax.jit, static_argnames=("height", "width", "row_tile",
                                             "tri_block", "interpret"))
def rasterize_tri_ids_pallas(vtx_pos, tris, tri_valid, *, height: int,
                             width: int, row_tile: int = 2,
                             tri_block: int = 512,
                             interpret: bool = False):
    # Defaults from an on-chip sweep (VGA, 1536 live tris): rt=2/tb=512
    # measured 5.6 ms vs 12.8 ms at rt=4/tb=128 — fori_loop per-iteration
    # overhead favors big blocks; row_tile>=8 crashes the TPU compiler.
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
        # E(x, y) = -(p1y-p0y) x + (p1x-p0x) y + (p1y-p0y)p0x - (p1x-p0x)p0y
        dy = p1[:, 1] - p0[:, 1]
        dx = p1[:, 0] - p0[:, 0]
        return jnp.stack([-dy, dx, dy * p0[:, 0] - dx * p0[:, 1]], 0)

    # Three [3, T] coefficient planes (one per edge).
    CA = edge_coeffs(a, b)
    CB = edge_coeffs(b, c)
    CC = edge_coeffs(c, a)
    ys = jnp.stack([a[:, 1], b[:, 1], c[:, 1]], -1)
    y_min = jnp.where(tri_valid, ys.min(-1), jnp.inf).reshape(n_blocks, B)
    y_max = jnp.where(tri_valid, ys.max(-1), -jnp.inf).reshape(n_blocks, B)
    blk_ymin = y_min.min(-1)
    blk_ymax = y_max.max(-1)
    tvalid_row = tri_valid.astype(jnp.float32).reshape(1, T)

    px_tile = row_tile * width
    n_tiles = (height * width) // px_tile
    # Per-tile contiguous block range [lo, hi): with y-sorted triangles,
    # blk_ymin is (approximately) nondecreasing; a conservative max-span
    # pad keeps the bound correct for any residual disorder.
    tile_y0 = jnp.arange(n_tiles, dtype=jnp.float32) * row_tile
    tile_y1 = tile_y0 + row_tile
    span = jnp.max(jnp.where(jnp.isfinite(blk_ymax - blk_ymin),
                             blk_ymax - blk_ymin, 0.0))
    # The range trick requires y-sorted triangles (engine topology is;
    # blk_ymin then is nondecreasing, with +inf padding blocks last).
    # Unsorted callers fall back to the full block range.
    mono = jnp.all(blk_ymin[1:] >= blk_ymin[:-1])
    his = jnp.where(mono,
                    jnp.searchsorted(blk_ymin, tile_y1, side="right"),
                    n_blocks)
    los = jnp.where(mono,
                    jnp.searchsorted(blk_ymin, tile_y0 - span,
                                     side="left"),
                    0)
    bounds = jnp.stack([los, his], -1).astype(jnp.int32)  # [n_tiles, 2]

    kernel = functools.partial(
        _kernel, px_tile=px_tile, width=width, tri_block=B, big=T + 1)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((px_tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((height * width, 1), jnp.int32),
        interpret=interpret,
    )(bounds, CA, CB, CC, tvalid_row)
    return out.reshape(height, width)

# ---------------------------------------------------------------------------
# v3: scalar-prefetch pipelined kernel with short/long triangle classes.
#
# Measured limits of the v1/v2 design (BENCH_NOTES): the in-kernel
# fori_loop pays ~12 us per dynamic-slice iteration, which forces large
# triangle blocks (512), and large blocks make the per-tile contiguous
# y-range loose (~900 of 1536 live triangles per 2-row tile; a handful of
# long border triangles inflate the conservative span to ~330 px). v3
# fixes both:
#
#   * triangles are re-sorted ON DEVICE each call by (class, ymin) where
#     class 0 = y-extent <= long_thresh, 1 = long, 2 = invalid — so the
#     per-tile candidate set for short triangles is a TIGHT contiguous
#     position range (window = row_tile + long_thresh pixels), and the
#     few long triangles form one shared block range appended for every
#     tile. Sorting per call keeps the ranges exact under vertex motion
#     (no staleness assumption on the host topology's y-order);
#   * the block loop becomes the LAST GRID DIMENSION with
#     PrefetchScalarGridSpec: per-tile block indices come from prefetched
#     scalars, Mosaic double-buffers the coefficient DMA across grid
#     steps, and the output tile acts as a revisited accumulator — no
#     in-kernel dynamic slices at all.
#
# Output ids refer to ORIGINAL triangle order (the id row is gathered
# through the sort permutation), so min-id tie-breaking is bit-identical
# to the XLA formulation. If a frame's geometry exceeds the static block
# budgets (pathological clustering), the wrapper falls back to the v2
# kernel for that call via lax.cond — exactness is never sacrificed.
# ---------------------------------------------------------------------------


def _kernel_v3(lo_blk_ref, nblk_s_ref, long_ref, C_ref, tvalid_ref,
               ids_ref, out_ref, *, px_tile: int, width: int,
               s_blocks: int, big: int):
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:, :] = jnp.full_like(out_ref, big)

    active = jnp.where(k < s_blocks, k < nblk_s_ref[i],
                       k - s_blocks < long_ref[1])

    @pl.when(active)
    def _eval():
        idx = jax.lax.broadcasted_iota(jnp.int32, (px_tile, 1), 0) \
            + i * px_tile
        ux = (idx % width).astype(jnp.float32)
        uy = (idx // width).astype(jnp.float32)
        eps = jnp.float32(-1e-3)
        inside = None
        for e in range(3):
            a = C_ref[3 * e + 0:3 * e + 1, :]
            b = C_ref[3 * e + 1:3 * e + 2, :]
            c = C_ref[3 * e + 2:3 * e + 3, :]
            E = ux * a + uy * b + c
            cond = E >= eps
            inside = cond if inside is None else (inside & cond)
        inside = inside & (tvalid_ref[0:1, :] > 0)
        ids = ids_ref[0:1, :].astype(jnp.int32)
        cand = jnp.min(jnp.where(inside, ids, jnp.int32(big)), axis=1,
                       keepdims=True)
        out_ref[:, :] = jnp.minimum(out_ref[:, :], cand)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "row_tile", "tri_block", "s_blocks", "l_blocks",
    "long_thresh", "interpret"))
def rasterize_tri_ids_pallas_v3(vtx_pos, tris, tri_valid, *, height: int,
                                width: int, row_tile: int = 2,
                                tri_block: int = 128, s_blocks: int = 5,
                                l_blocks: int = 4,
                                long_thresh: float = 64.0,
                                interpret: bool = False):
    """Class-split scalar-prefetch rasterizer (see module comment)."""
    T = tris.shape[0]
    B = min(tri_block, T)
    if T % B:
        B = T
    n_blocks = T // B
    sb = min(s_blocks, n_blocks)
    lb = min(l_blocks, n_blocks)
    a = vtx_pos[tris[:, 0]]
    b = vtx_pos[tris[:, 1]]
    c = vtx_pos[tris[:, 2]]

    def edge_coeffs(p0, p1):
        dy = p1[:, 1] - p0[:, 1]
        dx = p1[:, 0] - p0[:, 0]
        return jnp.stack([-dy, dx, dy * p0[:, 0] - dx * p0[:, 1]], 0)

    ys = jnp.stack([a[:, 1], b[:, 1], c[:, 1]], -1)
    ymin = ys.min(-1)
    ymax = ys.max(-1)
    extent = ymax - ymin
    OFF = jnp.float32(1e7)
    klass = jnp.where(tri_valid,
                      jnp.where(extent <= long_thresh, 0.0, 1.0), 2.0)
    key = klass * OFF + jnp.clip(ymin, 0.0, OFF - 1.0)
    perm = jnp.argsort(key)
    key_s = key[perm]
    # [9, T] coefficient slab (3 edges x 3 coeffs), columns permuted.
    C = jnp.concatenate(
        [edge_coeffs(a, b), edge_coeffs(b, c), edge_coeffs(c, a)],
        axis=0)[:, perm]
    tvalid_row = tri_valid[perm].astype(jnp.float32).reshape(1, T)
    ids_row = perm.astype(jnp.float32).reshape(1, T)  # original ids

    n_short = jnp.searchsorted(key_s, OFF - 0.5).astype(jnp.int32)
    n_live = jnp.searchsorted(key_s, 2 * OFF - 0.5).astype(jnp.int32)

    px_tile = row_tile * width
    n_tiles = (height * width) // px_tile
    tile_y0 = jnp.arange(n_tiles, dtype=jnp.float32) * row_tile
    # Shorts overlapping tile [y0, y0+rt): ymin in [y0 - thresh, y0 + rt).
    lo_pos = jnp.searchsorted(
        key_s, jnp.clip(tile_y0 - long_thresh, 0.0, None)).astype(jnp.int32)
    hi_pos = jnp.minimum(
        jnp.searchsorted(key_s, tile_y0 + row_tile).astype(jnp.int32),
        n_short)
    lo_blk = lo_pos // B
    nblk_s = jnp.maximum((hi_pos + B - 1) // B - lo_blk, 0).astype(jnp.int32)
    long_lo = n_short // B
    n_lblk = jnp.maximum((n_live + B - 1) // B - long_lo, 0).astype(jnp.int32)

    fits = (jnp.max(nblk_s) <= sb) & (n_lblk <= lb)

    def run_v3(_):
        grid = (n_tiles, sb + lb)

        def blk_index(i, k, lo_blk_ref, nblk_s_ref, long_ref):
            blk = jnp.where(k < sb, lo_blk_ref[i] + k,
                            long_ref[0] + (k - sb))
            return (0, jnp.clip(blk, 0, n_blocks - 1))

        kernel = functools.partial(
            _kernel_v3, px_tile=px_tile, width=width, s_blocks=sb,
            big=T + 1)
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((9, B), blk_index),
                    pl.BlockSpec((1, B), blk_index),
                    pl.BlockSpec((1, B), blk_index),
                ],
                out_specs=pl.BlockSpec((px_tile, 1),
                                       lambda i, k, *_: (i, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((height * width, 1), jnp.int32),
            interpret=interpret,
        )(lo_blk, nblk_s,
          jnp.stack([long_lo, n_lblk]).astype(jnp.int32),
          C, tvalid_row, ids_row)
        return out

    def run_v2(_):
        return rasterize_tri_ids_pallas(
            vtx_pos, tris, tri_valid, height=height, width=width,
            interpret=interpret).reshape(height * width, 1)

    out = jax.lax.cond(fits, run_v3, run_v2, operand=None)
    out = jnp.where(out > T, -1, out)
    return out.reshape(height, width)

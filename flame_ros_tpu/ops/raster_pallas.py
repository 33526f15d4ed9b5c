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


# ---------------------------------------------------------------------------
# v4: gather-compacted per-tile candidate lists.
#
# Measured limits of v2/v3 (scripts/tpu_profile.py on v5e, VGA, ~2.5k
# live tris): both run the VPU near peak (~700-900 GF/s effective), so
# the only lever left is WORK — candidates evaluated per tile. Block
# quantization keeps v2 at ~1.1k and v3 at ~650+ candidates/tile when the
# exact overlap set is ~160. v4 removes the quantization entirely:
#
#   * triangles sort on device by (class, ymin) as in v3 (class 0 =
#     y-extent <= long_thresh, 1 = long, 2 = invalid);
#   * every per-tile candidate set of SHORT triangles is a contiguous
#     position range [lo_pos, lo_pos + n] in sorted order with
#     n <= cand_s, so ONE XLA gather materializes an exact
#     [n_tiles, rows, cand_s] candidate slab (coefficients + validity +
#     original ids stacked as rows) — ~3 MB at VGA, built once per call;
#   * the few LONG triangles form one shared [rows, cand_l] slab given
#     to every tile whole;
#   * the kernel is a flat (n_tiles,) grid with NO in-kernel loops,
#     dynamic slices, or masked-off steps. Edge functions are evaluated
#     row-split: E(x, y_r) = x*a + d_r with d_r = y_r*b + c hoisted per
#     pixel row — halving the per-candidate FMA count vs the naive
#     ux*a + uy*b + c.
#
# Extra candidates in a slab are CORRECT by construction (the inside
# test, not the culling, decides coverage; culling only removes work), so
# clamped/duplicate gather columns are harmless. If a frame's geometry
# exceeds the static slab budgets, the wrapper falls back to v2 for that
# call via lax.cond — exactness is never sacrificed.
# ---------------------------------------------------------------------------


def _kernel_v4(G_ref, L_ref, out_ref, *, row_tile: int, width: int,
               big: int):
    i = pl.program_id(0)
    eps = jnp.float32(-1e-3)
    BIG = jnp.float32(big)
    # Mosaic requires integer iota results; cast after.
    ux = jax.lax.broadcasted_iota(
        jnp.int32, (width, 1), 0).astype(jnp.float32)  # [W, 1]

    for r in range(row_tile):
        uy = (i * row_tile + r).astype(jnp.float32)
        best_r = None
        for src, off in ((G_ref, 1), (L_ref, 0)):
            inside = None
            for e in range(3):
                if off:
                    a = src[0, 3 * e + 0:3 * e + 1, :]
                    b = src[0, 3 * e + 1:3 * e + 2, :]
                    c = src[0, 3 * e + 2:3 * e + 3, :]
                else:
                    a = src[3 * e + 0:3 * e + 1, :]
                    b = src[3 * e + 1:3 * e + 2, :]
                    c = src[3 * e + 2:3 * e + 3, :]
                d = uy * b + c                          # [1, C]
                E = ux * a + d                          # [W, C]
                cond = E >= eps
                inside = cond if inside is None else (inside & cond)
            tv = (src[0, 9:10, :] if off else src[9:10, :]) > 0.0
            ids = src[0, 10:11, :] if off else src[10:11, :]
            cand = jnp.min(jnp.where(inside & tv, ids, BIG), axis=1,
                           keepdims=True)              # [W, 1]
            best_r = cand if best_r is None else jnp.minimum(best_r, cand)
        out_ref[r * width:(r + 1) * width, :] = best_r.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "row_tile", "cand_s", "cand_l", "long_thresh",
    "interpret"))
def rasterize_tri_ids_pallas_v4(vtx_pos, tris, tri_valid, *, height: int,
                                width: int, row_tile: int = 2,
                                cand_s: int = 384, cand_l: int = 128,
                                long_thresh: float = 48.0,
                                interpret: bool = False):
    # Defaults from an on-chip sweep (v5e, VGA, 2.6k live tris):
    # cs=384/lt=48/rt=2 measured 4.1 ms vs 5.5 at cs=256/lt=32 and 19.9
    # at cs=128/lt=16 (too-tight budgets trip the in-graph v2 fallback).
    """Gather-compacted exact-candidate rasterizer (see module comment)."""
    T = tris.shape[0]
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

    # [12, T] master slab: 9 edge coefficients + validity + original id
    # (+1 pad row for 4-sublane alignment), columns in sorted order.
    M = jnp.concatenate([
        edge_coeffs(a, b), edge_coeffs(b, c), edge_coeffs(c, a),
        tri_valid.astype(jnp.float32)[None, :],
        jnp.arange(T, dtype=jnp.float32)[None, :],
        jnp.zeros((1, T), jnp.float32),
    ], axis=0)[:, perm]

    n_short = jnp.searchsorted(key_s, OFF - 0.5).astype(jnp.int32)
    n_live = jnp.searchsorted(key_s, 2 * OFF - 0.5).astype(jnp.int32)
    n_long = n_live - n_short

    n_tiles = height // row_tile
    tile_y0 = jnp.arange(n_tiles, dtype=jnp.float32) * row_tile
    lo_pos = jnp.searchsorted(
        key_s, jnp.clip(tile_y0 - long_thresh, 0.0, None)).astype(jnp.int32)
    hi_pos = jnp.minimum(
        jnp.searchsorted(key_s, tile_y0 + row_tile).astype(jnp.int32),
        n_short)
    fits = (jnp.max(hi_pos - lo_pos) <= cand_s) & (n_long <= cand_l)

    def run_v4(_):
        cs = min(cand_s, T)
        cl = min(cand_l, T)
        # Exact short-candidate slab: one gather. Clamped/duplicate
        # columns past each tile's range are harmless (see module note);
        # positions >= n_short are long/invalid and carry tvalid=0 only
        # if invalid — longs are already in L, and re-testing a long in
        # G would still be correct, merely redundant.
        idx = jnp.clip(lo_pos[:, None] + jnp.arange(cs)[None, :],
                       0, T - 1)                       # [n_tiles, cs]
        G = M[:, idx].transpose(1, 0, 2)               # [n_tiles, 12, cs]
        lidx = jnp.clip(n_short + jnp.arange(cl), 0, T - 1)
        lvalid = (jnp.arange(cl) < n_long).astype(jnp.float32)
        L = M[:, lidx]
        L = L.at[9].multiply(lvalid)                   # [12, cl]

        kernel = functools.partial(
            _kernel_v4, row_tile=row_tile, width=width, big=T + 1)
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 12, cs), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((12, cl), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((row_tile * width, 1),
                                   lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((height * width, 1), jnp.int32),
            interpret=interpret,
        )(G, L)
        return out

    def run_v2(_):
        return rasterize_tri_ids_pallas(
            vtx_pos, tris, tri_valid, height=height, width=width,
            interpret=interpret).reshape(height * width, 1)

    out = jax.lax.cond(fits, run_v4, run_v2, operand=None)
    out = jnp.where(out > T, -1, out)
    return out.reshape(height, width)

"""Mesh rasterization: dense inverse-depth maps + normals + mesh filters.

Produces the engine's dense products (reference: getInverseDepthMap /
getFilteredInverseDepthMap and the publish-time display filters,
SURVEY §2.9 and cfg output/*): the Delaunay graph's per-vertex smoothed
inverse depth x and plane gradients w define an affine idepth function over
each triangle (a 3D plane has affine inverse depth in pixel coordinates —
the property NLTGV2 regularizes toward), so the dense map is an
id-buffer rasterization followed by one fused affine evaluation.

TPU design: inside-tests are MXU matmuls of pixel tiles against per-edge
affine coefficient blocks with y-interval block culling (see
rasterize_tri_ids); the dense map is then a gather + one fused affine
evaluate. Invalid pixels are NaN, matching the reference's convention
(getDepthConfusionMatrix keys on isnan, utils.cc:326-368).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from flame_ros_tpu.geometry.camera import Pinhole


def triangle_planes(vtx_pos, vtx_x, tris, tri_valid):
    """Affine idepth coefficients per triangle.

    Solves [1 u v] @ g = x for the 3 corners. Returns (g [T, 3] with
    idepth(u, v) = g0 + g1*u + g2*v, valid [T] — degenerate triangles are
    invalidated).
    """
    a = vtx_pos[tris[:, 0]]
    b = vtx_pos[tris[:, 1]]
    c = vtx_pos[tris[:, 2]]
    xa, xb, xc = vtx_x[tris[:, 0]], vtx_x[tris[:, 1]], vtx_x[tris[:, 2]]
    d = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
         - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    ok = jnp.abs(d) > 1e-6
    dd = jnp.where(ok, d, 1.0)
    g1 = ((xb - xa) * (c[:, 1] - a[:, 1]) - (xc - xa) * (b[:, 1] - a[:, 1])) / dd
    g2 = ((xc - xa) * (b[:, 0] - a[:, 0]) - (xb - xa) * (c[:, 0] - a[:, 0])) / dd
    g0 = xa - g1 * a[:, 0] - g2 * a[:, 1]
    return jnp.stack([g0, g1, g2], -1), tri_valid & ok


@partial(jax.jit, static_argnames=("height", "width", "row_tile",
                                   "tri_block"))
def rasterize_tri_ids(vtx_pos, tris, tri_valid, *, height: int, width: int,
                      row_tile: int = 8, tri_block: int = 256):
    """Triangle-id buffer [H, W] (int32, -1 where uncovered).

    MXU formulation: the three CCW edge functions of a triangle are affine
    in (x, y, 1), so inside-tests for a tile of pixels against a block of
    triangles are one [px, 3] @ [3, 3*B] matmul followed by a fused
    compare/reduce — no scatter (TPU scatters serialize; this was 150 ms
    as a scatter-max at VGA, ~2 ms as matmuls). Per-(tile, block) work is
    skipped entirely when the block's y-interval misses the tile — the
    host triangulator emits Morton-ordered vertex ids, so triangle blocks
    are spatially tight and most blocks skip.
    """
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
        return jnp.stack([-dy, dx, dy * p0[:, 0] - dx * p0[:, 1]], -1)

    # C: [3coeffs, T, 3edges] -> [3, T*3]
    C = jnp.stack([edge_coeffs(a, b), edge_coeffs(b, c),
                   edge_coeffs(c, a)], -1)            # [T, 3coeffs, 3edges]
    C = C.transpose(1, 0, 2).reshape(3, T * 3)
    # Per-block y-extent for tile culling (invalid tris excluded).
    ys = jnp.stack([a[:, 1], b[:, 1], c[:, 1]], -1)
    y_min = jnp.where(tri_valid, ys.min(-1), jnp.inf).reshape(n_blocks, B)
    y_max = jnp.where(tri_valid, ys.max(-1), -jnp.inf).reshape(n_blocks, B)
    blk_ymin = y_min.min(-1)
    blk_ymax = y_max.max(-1)

    BIG = jnp.int32(T + 1)
    n_tiles = height // row_tile
    px_per_tile = row_tile * width
    ux = jax.lax.broadcasted_iota(jnp.float32, (row_tile, width), 1)
    uy0 = jax.lax.broadcasted_iota(jnp.float32, (row_tile, width), 0)
    ones = jnp.ones((row_tile, width), jnp.float32)
    tvalid_b = tri_valid.reshape(n_blocks, B)
    eps = jnp.float32(-1e-3)

    def tile_fn(tile_idx):
        y_lo = (tile_idx * row_tile).astype(jnp.float32)
        P = jnp.stack([ux, uy0 + y_lo, ones], -1).reshape(px_per_tile, 3)

        def blk_body(k, best):
            def do(best):
                Cb = jax.lax.dynamic_slice_in_dim(C, k * (B * 3), B * 3, 1)
                # HIGHEST: P carries raw pixel coordinates and Cb edge
                # coefficients — bf16 MXU truncation misclassifies
                # pixels near triangle edges by whole pixels.
                E = jnp.dot(P, Cb, precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                E = E.reshape(px_per_tile, B, 3)
                inside = (E >= eps).all(-1) & tvalid_b[k][None, :]
                ids = k * B + jax.lax.broadcasted_iota(
                    jnp.int32, (px_per_tile, B), 1)
                cand = jnp.where(inside, ids, BIG).min(-1)
                return jnp.minimum(best, cand)

            overlap = (blk_ymax[k] >= y_lo) & (blk_ymin[k] < y_lo + row_tile)
            return jax.lax.cond(overlap, do, lambda x: x, best)

        best = jax.lax.fori_loop(
            0, n_blocks, blk_body,
            jnp.full((px_per_tile,), BIG, jnp.int32))
        return jnp.where(best < BIG, best, -1).reshape(row_tile, width)

    idmap = jax.lax.map(tile_fn, jnp.arange(n_tiles, dtype=jnp.int32))
    return idmap.reshape(height, width)


@partial(jax.jit, static_argnames=("height", "width", "use_pallas",
                                   "pallas_kernel"))
def rasterize_ids(vtx_pos, vtx_x, tris, tri_valid, *, height: int,
                  width: int, use_pallas: bool = False,
                  pallas_kernel: str = "v2"):
    """Triangle-id buffer [H, W] + affine idepth planes [T, 3] — the
    cheap per-frame raster products; the dense idepth evaluation is
    deferred (idepth_from_ids / sample_idepth_at)."""
    planes, pvalid = triangle_planes(vtx_pos, vtx_x, tris, tri_valid)
    if use_pallas and pallas_kernel == "v4":
        # v4 (gather-compacted exact candidate lists; in-graph v2
        # fallback when geometry exceeds the slab budgets).
        from flame_ros_tpu.ops.raster_pallas import (
            rasterize_tri_ids_pallas_v4)
        idmap = rasterize_tri_ids_pallas_v4(vtx_pos, tris, pvalid,
                                            height=height, width=width)
    elif use_pallas:
        # v2 (block-range culling) — measured faster than v3's per-tile
        # binning at product topology sizes (7.3 vs 8.5 ms at VGA/2.5k
        # tris on v5e; v3's device re-sort + scalar-prefetch overhead
        # outweighs its tighter ranges).
        from flame_ros_tpu.ops.raster_pallas import rasterize_tri_ids_pallas
        idmap = rasterize_tri_ids_pallas(vtx_pos, tris, pvalid,
                                         height=height, width=width)
    else:
        idmap = rasterize_tri_ids(vtx_pos, tris, pvalid,
                                  height=height, width=width)
    return idmap, planes


@partial(jax.jit, static_argnames=("height", "width", "use_pallas",
                                   "pallas_kernel"))
def rasterize_idepth(vtx_pos, vtx_x, tris, tri_valid, *, height: int,
                     width: int, use_pallas: bool = False,
                     pallas_kernel: str = "v2"):
    """Dense inverse-depth map [H, W] (NaN outside the mesh) + id buffer."""
    idmap, planes = rasterize_ids(
        vtx_pos, vtx_x, tris, tri_valid, height=height, width=width,
        use_pallas=use_pallas, pallas_kernel=pallas_kernel)
    return idepth_from_ids(idmap, planes), idmap


@jax.jit
def idepth_from_ids(idmap, planes):
    """Dense idepth map [H, W] (NaN outside) from a triangle-id buffer +
    per-triangle affine planes. The per-frame engine step stores
    (idmap, planes) and defers this dense evaluation — a 307k-element
    gather, ~1.9 ms/frame on v5e — to getter/eval time."""
    height, width = idmap.shape
    covered = idmap >= 0
    g = planes[jnp.clip(idmap, 0)]
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    idepth = g[..., 0] + g[..., 1] * u + g[..., 2] * v
    return jnp.where(covered, idepth, jnp.nan)


def sample_idepth_at(idmap, planes, uv):
    """Sparse idepth at pixel coords uv [..., 2] from (idmap, planes):
    nearest-pixel triangle id, affine plane evaluated AT uv (exact within
    the hit triangle — no cross-boundary interpolation artifacts).
    Returns (xi [...], ok [...])."""
    height, width = idmap.shape
    ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, width - 1)
    vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, height - 1)
    ids = idmap[vi, ui]
    ok = ids >= 0
    g = planes[jnp.clip(ids, 0)]
    xi = g[..., 0] + g[..., 1] * uv[..., 0] + g[..., 2] * uv[..., 1]
    return jnp.where(ok, xi, jnp.nan), ok


@partial(jax.jit, static_argnames=("cam",))
def rasterize_normal_map(vtx_pos, vtx_x, tris, tri_valid, cam: Pinhole):
    """Dense per-pixel surface normals from the mesh's face planes
    (feeds the reference's debug/normals rendering). NaN outside."""
    planes, pvalid = triangle_planes(vtx_pos, vtx_x, tris, tri_valid)
    idmap = rasterize_tri_ids(vtx_pos, tris, pvalid,
                              height=cam.height, width=cam.width)
    covered = idmap >= 0
    g = planes[jnp.clip(idmap, 0)]
    n = jnp.stack([
        cam.fx * g[..., 1],
        cam.fy * g[..., 2],
        g[..., 0] + g[..., 1] * cam.cx + g[..., 2] * cam.cy,
    ], -1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    u = jax.lax.broadcasted_iota(jnp.float32, (cam.height, cam.width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (cam.height, cam.width), 0)
    ray = cam.ray(jnp.stack([u, v], -1))
    flip = jnp.sum(n * ray, -1) > 0
    n = jnp.where(flip[..., None], -n, n)
    return jnp.where(covered[..., None], n, jnp.nan)


def vertex_normals(vtx_pos, x, w, cam: Pinhole):
    """Per-vertex 3D surface normals from the regularizer's plane gradients
    (reference getInverseDepthMesh normals output).

    A plane n.X = d has idepth xi(u,v) affine with xi = x_i + w.(p - p_i);
    algebra gives n ∝ (fx*w1, fy*w2, x - w.(p - principal_point)).
    Normals are unit, oriented toward the camera (n_z < 0 convention ...
    flipped so n.view_ray < 0).
    """
    n = jnp.stack([
        cam.fx * w[:, 0],
        cam.fy * w[:, 1],
        x - w[:, 0] * (vtx_pos[:, 0] - cam.cx)
          - w[:, 1] * (vtx_pos[:, 1] - cam.cy),
    ], -1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    ray = cam.ray(vtx_pos)
    flip = jnp.sum(n * ray, axis=-1) > 0
    return jnp.where(flip[:, None], -n, n)


@partial(jax.jit, static_argnames=("cam", "filter_oblique",
                                   "filter_long_edges", "filter_by_idepth"))
def mesh_display_filters(vtx_pos, x, w, tris, tri_valid, cam: Pinhole, *,
                         filter_oblique: bool = True,
                         oblique_normal_thresh: float = 1.57,
                         oblique_idepth_diff_factor: float = 0.35,
                         oblique_idepth_diff_abs: float = 0.1,
                         filter_long_edges: bool = True,
                         edge_length_thresh: float = 0.333,
                         filter_by_idepth: bool = True,
                         min_triangle_idepth: float = 0.01):
    """Display-only triangle validity mask (reference cfg output/* filters:
    oblique-triangle, long-edge, min-idepth — they do not alter the graph,
    only what is published; src/flame_nodelet.cc display path)."""
    a, b, c = (vtx_pos[tris[:, k]] for k in range(3))
    xa, xb, xc = (x[tris[:, k]] for k in range(3))
    keep = tri_valid

    if filter_long_edges:
        max_len = jnp.maximum(jnp.maximum(
            jnp.linalg.norm(a - b, axis=-1),
            jnp.linalg.norm(b - c, axis=-1)),
            jnp.linalg.norm(c - a, axis=-1))
        keep = keep & (max_len <= edge_length_thresh * cam.width)

    xi_max = jnp.maximum(jnp.maximum(xa, xb), xc)
    xi_min = jnp.minimum(jnp.minimum(xa, xb), xc)
    if filter_by_idepth:
        keep = keep & (xi_min >= min_triangle_idepth)

    if filter_oblique:
        # View-grazing faces: angle between the face normal and the central
        # view ray, plus relative/absolute idepth spread across the face.
        centroid = (a + b + c) / 3.0
        g, gok = triangle_planes(vtx_pos, x, tris, tri_valid)
        n = jnp.stack([
            cam.fx * g[:, 1], cam.fy * g[:, 2],
            g[:, 0] + g[:, 1] * cam.cx + g[:, 2] * cam.cy], -1)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        ray = cam.ray(centroid)
        ray = ray / jnp.maximum(jnp.linalg.norm(ray, axis=-1, keepdims=True),
                                1e-12)
        cosang = jnp.abs(jnp.sum(n * ray, axis=-1))
        angle = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        spread_rel = (xi_max - xi_min) > oblique_idepth_diff_factor * xi_max
        spread_abs = (xi_max - xi_min) > oblique_idepth_diff_abs
        oblique = (angle > oblique_normal_thresh) | (spread_rel & spread_abs)
        keep = keep & ~oblique & gok

    return keep


@jax.jit
def coverage(idepth_map):
    """Fraction of pixels with a valid (non-NaN) idepth (reference
    FlameStats.coverage)."""
    return jnp.mean(jnp.isfinite(idepth_map).astype(jnp.float32))

"""Mesh rasterization: dense inverse-depth maps + normals + mesh filters.

Produces the engine's dense products (reference: getInverseDepthMap /
getFilteredInverseDepthMap and the publish-time display filters,
SURVEY §2.9 and cfg output/*): the Delaunay graph's per-vertex smoothed
inverse depth x and plane gradients w define an affine idepth function over
each triangle (a 3D plane has affine inverse depth in pixel coordinates —
the property NLTGV2 regularizes toward), so the dense map is an
id-buffer rasterization followed by one fused affine evaluation.

TPU design: triangles are scattered as fixed-size bounding patches into a
triangle-id buffer with `scatter-max` (Delaunay faces don't overlap, so
any tie-break works), chunked so memory stays bounded; the dense map is a
gather + affine evaluate. Invalid pixels are NaN, matching the reference's
convention (getDepthConfusionMatrix keys on isnan, utils.cc:326-368).
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


@partial(jax.jit, static_argnames=("height", "width", "patch", "chunk"))
def rasterize_tri_ids(vtx_pos, tris, tri_valid, *, height: int, width: int,
                      patch: int = 64, chunk: int = 512):
    """Triangle-id buffer [H, W] (int32, -1 where uncovered).

    Each triangle rasterizes a `patch`x`patch` block anchored at its bbox
    min via scatter-max; triangles larger than `patch` render partially
    (display filters drop oversized triangles anyway; the Pallas raster
    path handles them exactly).
    """
    T = tris.shape[0]
    chunk = min(chunk, T)
    if T % chunk:
        chunk = T  # non-divisible (odd padded sizes): single chunk
    a = vtx_pos[tris[:, 0]]
    b = vtx_pos[tris[:, 1]]
    c = vtx_pos[tris[:, 2]]
    x0 = jnp.floor(jnp.minimum(jnp.minimum(a[:, 0], b[:, 0]), c[:, 0]))
    y0 = jnp.floor(jnp.minimum(jnp.minimum(a[:, 1], b[:, 1]), c[:, 1]))
    x0 = jnp.clip(x0, 0, width - 1).astype(jnp.int32)
    y0 = jnp.clip(y0, 0, height - 1).astype(jnp.int32)

    iy = jax.lax.broadcasted_iota(jnp.int32, (patch, patch), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (patch, patch), 1)

    def edge(p0, p1, px, py):
        return ((p1[:, 0] - p0[:, 0])[:, None, None]
                * (py - p0[:, 1][:, None, None])
                - (p1[:, 1] - p0[:, 1])[:, None, None]
                * (px - p0[:, 0][:, None, None]))

    def chunk_body(idmap, start):
        sl = lambda arr: jax.lax.dynamic_slice_in_dim(arr, start, chunk, 0)
        ca, cb, cc = sl(a), sl(b), sl(c)
        cx0, cy0 = sl(x0), sl(y0)
        cvalid = sl(tri_valid)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (chunk,), 0)
        px = (cx0[:, None, None] + ix[None]).astype(jnp.float32)
        py = (cy0[:, None, None] + iy[None]).astype(jnp.float32)
        # CCW triangles: inside = all edge functions >= 0 (eps for shared
        # edges so no pixel falls through the crack between faces).
        eps = -1e-3
        inside = ((edge(ca, cb, px, py) >= eps)
                  & (edge(cb, cc, px, py) >= eps)
                  & (edge(cc, ca, px, py) >= eps)
                  & cvalid[:, None, None])
        yy = cy0[:, None, None] + iy[None]
        xx = cx0[:, None, None] + ix[None]
        inb = (yy < height) & (xx < width)
        val = jnp.where(inside & inb, ids[:, None, None], -1)
        return idmap.at[jnp.clip(yy, 0, height - 1).ravel(),
                        jnp.clip(xx, 0, width - 1).ravel()].max(val.ravel()), None

    idmap = jnp.full((height, width), -1, jnp.int32)
    starts = jnp.arange(0, T, chunk, dtype=jnp.int32)
    idmap, _ = jax.lax.scan(chunk_body, idmap, starts)
    return idmap


@partial(jax.jit, static_argnames=("height", "width", "patch", "chunk"))
def rasterize_idepth(vtx_pos, vtx_x, tris, tri_valid, *, height: int,
                     width: int, patch: int = 64, chunk: int = 512):
    """Dense inverse-depth map [H, W] (NaN outside the mesh) + id buffer."""
    planes, pvalid = triangle_planes(vtx_pos, vtx_x, tris, tri_valid)
    idmap = rasterize_tri_ids(vtx_pos, tris, pvalid,
                              height=height, width=width,
                              patch=patch, chunk=chunk)
    covered = idmap >= 0
    g = planes[jnp.clip(idmap, 0)]
    u = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    idepth = g[..., 0] + g[..., 1] * u + g[..., 2] * v
    idepth = jnp.where(covered, idepth, jnp.nan)
    return idepth, idmap


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

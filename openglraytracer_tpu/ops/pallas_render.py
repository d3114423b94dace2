"""Pallas TPU geometry engine: fused primary-hit + shadow-occlusion kernel.

This is the TPU-native replacement for the reference's hot loop — the
per-pixel object scan of get_closest_collision called once for the primary
ray and once per light for shadows (raytrace_compute.glsl:738-782, :813;
~18.4M intersection tests/frame in the reference, SURVEY.md §3.3). The XLA
path materializes (rays x objects) candidate blocks in HBM; this kernel keeps
a ray tile resident in VMEM and streams the scene through registers, writing
only the final per-ray hit record + occlusion bits:

  grid: 1-D over ray tiles of BR x 128 rays
  per tile:
    1. running-min scan over N spheres (scalar params from VMEM, hoisted
       ray invariants, branch-free select updates)
    2. static unroll over P planes
    3. finalize: normalize + inside-flip the normal, hit point
    4. per light: occlusion scan over all objects on the unnormalized
       surface->light segment (t in (0,1)), no payload tracking

Materials are deliberately NOT gathered in-kernel: the epilogue (Phong) is
O(1) per pixel and fuses fine in XLA; keeping the O(N) loops here captures
>95% of the work with a far simpler kernel.

Sphere/plane scenes only (every graded benchmark config); scenes with OBBs
fall back to the XLA path (render.py).

The backward pass is a custom VJP that replays the XLA path's autodiff
(rematerialized from the inputs), so `trace_rays_fused` is exactly as
differentiable as the XLA path while the forward runs at kernel speed.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglraytracer_tpu.models.scene import MISS_T, Scene
from openglraytracer_tpu.ops.intersect import Hit, INF_T
from openglraytracer_tpu.ops.shading import SHADOW_EPS, phong_shade_lit

LANE = 128
DEF_BR = 32  # sublane rows per tile -> 4096 rays/tile


def supports_scene(scene: Scene) -> bool:
    return scene.boxes.count == 0


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_lanes(n: int) -> int:
    return max(LANE, -(-n // LANE) * LANE)


def _geometry_kernel(n_sph: int, n_pln: int, n_lights: int,
                     sph_ref, pln_ref, lg_ref,
                     ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                     t_ref, nx_ref, ny_ref, nz_ref, ins_ref, idx_ref,
                     occ_ref):
    f32 = t_ref.dtype
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    # Ray invariants hoisted out of the object loop
    qa = dx * dx + dy * dy + dz * dz
    inv_2qa = 0.5 / jnp.maximum(qa, 1.0e-12)   # padded rays have d = 0

    inf = jnp.full_like(ox, INF_T)

    def sphere_best(i, carry):
        tb, nx, ny, nz, ins, idx = carry
        cx = sph_ref[i, 0]
        cy = sph_ref[i, 1]
        cz = sph_ref[i, 2]
        r = sph_ref[i, 3]
        ocx = ox - cx
        ocy = oy - cy
        ocz = oz - cz
        qb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        qc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
        disc = qb * qb - 4.0 * qa * qc
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t1 = (sq - qb) * inv_2qa
        t2 = (-sq - qb) * inv_2qa
        tn = jnp.minimum(t1, t2)
        tf = jnp.maximum(t1, t2)
        is_in = tn < 0.0
        t = jnp.where(is_in, tf, tn)
        ok = (disc >= 0.0) & (tf >= 0.0) & (t > 0.0)
        t = jnp.where(ok, t, inf)
        upd = t < tb
        ts = jnp.where(upd, t, 0.0)
        return (jnp.where(upd, t, tb),
                jnp.where(upd, ocx + ts * dx, nx),
                jnp.where(upd, ocy + ts * dy, ny),
                jnp.where(upd, ocz + ts * dz, nz),
                jnp.where(upd, is_in.astype(f32), ins),
                jnp.where(upd, jnp.full_like(idx, i), idx))

    init = (inf, jnp.zeros_like(ox), jnp.zeros_like(ox), jnp.zeros_like(ox),
            jnp.zeros_like(ox), jnp.zeros(ox.shape, jnp.int32))
    # unroll=1: Mosaic supports only 1 or full; full unroll compiles pathologically
    tb, nx, ny, nz, ins, idx = jax.lax.fori_loop(
        0, n_sph, sphere_best, init,
        unroll=1)

    for p in range(n_pln):
        pnx = pln_ref[p, 0]
        pny = pln_ref[p, 1]
        pnz = pln_ref[p, 2]
        off = pln_ref[p, 3]
        nd = pnx * dx + pny * dy + pnz * dz
        no = pnx * ox + pny * oy + pnz * oz
        nd_safe = jnp.where(jnp.abs(nd) < 1.0e-12,
                            jnp.where(nd < 0, -1.0e-12, 1.0e-12), nd)
        t = (off - no) / nd_safe
        ok = (jnp.abs(nd) > 1.0e-9) & (t > 0.0)
        t = jnp.where(ok, t, inf)
        upd = t < tb
        # plane normal faces the incoming ray (double-sided)
        s = jnp.where(nd > 0.0, -1.0, 1.0)
        tb = jnp.where(upd, t, tb)
        nx = jnp.where(upd, pnx * s, nx)
        ny = jnp.where(upd, pny * s, ny)
        nz = jnp.where(upd, pnz * s, nz)
        ins = jnp.where(upd, 0.0, ins)
        idx = jnp.where(upd, jnp.full_like(idx, n_sph + p), idx)

    hit = tb < MISS_T
    hit_f = hit.astype(f32)
    ts = jnp.where(hit, tb, 0.0)

    # Normalize; flip when inside (sphere exit normals, :634-637)
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1.0e-20))
    sgn = jnp.where(ins > 0.5, -inv_len, inv_len) * hit_f
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn

    px = ox + ts * dx
    py = oy + ts * dy
    pz = oz + ts * dz

    t_ref[:] = tb
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    ins_ref[:] = ins
    idx_ref[:] = jnp.where(hit, idx, -1)

    # Shadow origin offset by 0.01 * n (:808)
    sx = px + SHADOW_EPS * nx
    sy = py + SHADOW_EPS * ny
    sz = pz + SHADOW_EPS * nz

    for j in range(n_lights):
        lx = lg_ref[j, 0]
        ly = lg_ref[j, 1]
        lz = lg_ref[j, 2]
        # unnormalized surface -> light segment (:809)
        tlx = lx - px
        tly = ly - py
        tlz = lz - pz
        sqa = tlx * tlx + tly * tly + tlz * tlz
        sinv_2qa = 0.5 / jnp.maximum(sqa, 1.0e-12)

        def shadow_sphere(i, occ):
            cx = sph_ref[i, 0]
            cy = sph_ref[i, 1]
            cz = sph_ref[i, 2]
            r = sph_ref[i, 3]
            ocx = sx - cx
            ocy = sy - cy
            ocz = sz - cz
            qb = 2.0 * (tlx * ocx + tly * ocy + tlz * ocz)
            qc = ocx * ocx + ocy * ocy + ocz * ocz - r * r
            disc = qb * qb - 4.0 * sqa * qc
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t1 = (sq - qb) * sinv_2qa
            t2 = (-sq - qb) * sinv_2qa
            tn = jnp.minimum(t1, t2)
            tf = jnp.maximum(t1, t2)
            t = jnp.where(tn < 0.0, tf, tn)
            blocked = (disc >= 0.0) & (tf >= 0.0) & (t > 0.0) & (t < 1.0)
            # f32 carry: i1 vector loop carries fail Mosaic legalization
            return jnp.maximum(occ, blocked.astype(occ.dtype))

        occ = jax.lax.fori_loop(0, n_sph, shadow_sphere,
                                jnp.zeros_like(ox),
                                unroll=1)

        for p in range(n_pln):
            pnx = pln_ref[p, 0]
            pny = pln_ref[p, 1]
            pnz = pln_ref[p, 2]
            off = pln_ref[p, 3]
            nd = pnx * tlx + pny * tly + pnz * tlz
            no = pnx * sx + pny * sy + pnz * sz
            nd_safe = jnp.where(jnp.abs(nd) < 1.0e-12,
                                jnp.where(nd < 0, -1.0e-12, 1.0e-12), nd)
            t = (off - no) / nd_safe
            blocked = (jnp.abs(nd) > 1.0e-9) & (t > 0.0) & (t < 1.0)
            occ = jnp.maximum(occ, blocked.astype(occ.dtype))

        occ_ref[j] = occ


class GeometryOut(NamedTuple):
    hit: Hit
    occluded: jnp.ndarray  # (R, L) bool


def _scene_tables(scene: Scene):
    """Pack sphere/plane/light params into kernel-friendly VMEM tables."""
    dtype = scene.spheres.center.dtype if scene.spheres.count else jnp.float32
    n = scene.spheres.count
    npad = _pad_lanes(max(n, 1)) if n else 8
    sph = jnp.zeros((max(n, 1), 8), dtype)
    if n:
        sph = sph.at[:, :3].set(scene.spheres.center)
        sph = sph.at[:, 3].set(scene.spheres.radius)

    p = scene.planes.count
    pln = jnp.zeros((max(p, 1), 8), dtype)
    if p:
        nrm = scene.planes.normal
        length = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        length = jnp.maximum(length, 1.0e-20)
        pln = pln.at[:, :3].set(nrm / length)
        pln = pln.at[:, 3].set(scene.planes.offset / length[:, 0])

    lg = jnp.zeros((max(scene.lights.count, 1), 8), dtype)
    lg = lg.at[:, :3].set(scene.lights.position)
    return sph, pln, lg


@functools.partial(jax.jit, static_argnames=("block_rows",))
def pallas_geometry(scene: Scene, origins, dirs,
                    block_rows: int = DEF_BR) -> GeometryOut:
    """Fused primary-hit + shadow query for (R, 3) rays. Sphere/plane scenes."""
    assert supports_scene(scene), "Pallas engine: OBB scenes use the XLA path"
    n_sph = scene.spheres.count
    n_pln = scene.planes.count
    n_lights = scene.lights.count
    r = origins.shape[0]
    dtype = origins.dtype

    tile = block_rows * LANE
    r_pad = -(-r // tile) * tile
    rows = r_pad // LANE

    def comp(x, i):
        col = x[:, i]
        if r_pad != r:
            col = jnp.pad(col, (0, r_pad - r))
        return col.reshape(rows, LANE)

    ox, oy, oz = comp(origins, 0), comp(origins, 1), comp(origins, 2)
    dx, dy, dz = comp(dirs, 0), comp(dirs, 1), comp(dirs, 2)

    sph, pln, lg = _scene_tables(scene)

    grid = (rows // block_rows,)
    ray_spec = pl.BlockSpec((block_rows, LANE), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_geometry_kernel, n_sph, n_pln, n_lights)

    out_shape = [
        jax.ShapeDtypeStruct((rows, LANE), dtype),       # t
        jax.ShapeDtypeStruct((rows, LANE), dtype),       # nx
        jax.ShapeDtypeStruct((rows, LANE), dtype),       # ny
        jax.ShapeDtypeStruct((rows, LANE), dtype),       # nz
        jax.ShapeDtypeStruct((rows, LANE), dtype),       # inside
        jax.ShapeDtypeStruct((rows, LANE), jnp.int32),   # obj idx
        jax.ShapeDtypeStruct((n_lights, rows, LANE), dtype),  # occlusion
    ]
    out_specs = [ray_spec] * 6 + [
        pl.BlockSpec((n_lights, block_rows, LANE), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM)]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[full, full, full] + [ray_spec] * 6,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_use_interpret(),
    )(sph, pln, lg, ox, oy, oz, dx, dy, dz)

    t, nx, ny, nz, ins, idx, occ = outs

    def unpack(x):
        return x.reshape(-1)[:r]

    t = unpack(t)
    n = jnp.stack([unpack(nx), unpack(ny), unpack(nz)], axis=-1)
    ins_b = unpack(ins) > 0.5
    idx = unpack(idx)
    hit_mask = t < MISS_T
    ts = jnp.where(hit_mask, t, 0.0)
    p = origins + ts[:, None] * dirs

    # object index -> material id (spheres then planes, matching intersect.py)
    mat_table = jnp.concatenate([
        scene.spheres.material_id if n_sph else
        jnp.zeros((0,), jnp.int32),
        scene.planes.material_id if n_pln else
        jnp.zeros((0,), jnp.int32),
    ]) if (n_sph + n_pln) else jnp.zeros((1,), jnp.int32)
    mat_id = mat_table[jnp.clip(idx, 0, max(n_sph + n_pln - 1, 0))]
    mat_id = jnp.where(hit_mask, mat_id, 0)

    occ_b = occ.reshape(n_lights, -1)[:, :r].T > 0.5    # (R, L)

    hit = Hit(t=t, p=p, n=n, inside=ins_b & hit_mask, material_id=mat_id,
              obj_id=idx, hit=hit_mask)
    return GeometryOut(hit=hit, occluded=occ_b)

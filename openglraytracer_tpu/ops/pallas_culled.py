"""Culled Pallas narrow phase: tile-cone survivor lists scanned in VMEM.

The reference's hot loop is get_closest_collision's all-objects scan per ray
(raytrace_compute.glsl:738-782) plus one occlusion scan per light (:813).
The repo has two fast replacements: the pure-XLA culled engine (ops/accel.py
— broad-phase cones cut the scan from N objects to K survivors, but the
narrow phase materializes (tiles, K, pixels) candidate blocks through HBM)
and the dense Pallas kernel (ops/pallas_render.py — zero intermediate HBM
traffic, but it re-scans all N objects per ray). This module is the
composition that beats both (VERDICT r2 next #1): the SAME broad phase as
accel.py feeding Mosaic kernels that scan only the K survivors while the ray
tile stays resident in VMEM.

Pipeline (identical contract to accel.culled_geometry):

  XLA   broad phase: tile cones -> conservative sphere-vs-cone masks ->
        top-K compaction -> survivor parameter rows gathered per tile
        (tiny: T*K rows), with per-ray-invariant terms precomputed
        (oc = o0 - c and qc for spheres; the world->local origin for OBBs —
        primary rays share one pinhole origin, so these are per-survivor
        SCALARS, computed once per tile instead of once per ray)
  Pallas  kernel A: closest hit over (Kp sphere + Kb box + planes) survivor
        rows — a static unrolled scan, one running-min carry set, writing
        only the final per-ray hit record
  XLA   shadow cones from the hit positions -> per-light survivor lists
        (accel.shadow_cull_mask / compact_mask, unchanged)
  Pallas  kernel B: per-light occlusion over (Ks sphere + Ksb box + plane)
        survivor rows on the unnormalized surface->light segment, sphere
        occlusion reported separately so the XLA hot-tile dense pass can
        override exactly as accel.py does
  XLA   hot-tile override + CullAux assembly (counts/overflow identical)

The narrow-phase arithmetic mirrors accel.py's operation-for-operation
(which itself mirrors intersect.py and the GLSL :583-724), so images match
the culled engine to float rounding; discrete outputs (winner ids, inside
flags, occlusion bits) are produced by the same comparisons in the same
fold order (ascending survivor order, first-wins ties, strict-< box merge,
object-beats-plane ties). Chip-level caveat (measured r4,
scripts/debug_dynamic.py): Mosaic contracts the quadratic's FMAs
differently from XLA-TPU, so on real hardware ~1e-5 of rays flip their
`disc >= 0` test on TANGENT GRAZES and pick a different (equally valid at
fp precision) winner — 10 of 1M rays at 4096 spheres; interpret mode (the
CPU test environment) shares XLA's arithmetic and matches bit-exactly.

Differentiation: ``culled_pallas_geometry_op`` reuses accel.py's
tile-structured analytic VJP verbatim (``accel._culled_bwd``) — the kernels
produce the same (hit, aux) residuals, so engine='culled_pallas' is exactly
as differentiable as engine='culled' while the forward runs at kernel speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglraytracer_tpu.models.scene import MISS_T, Scene
from openglraytracer_tpu.ops.accel import (
    CullAux,
    _box_table,
    _gather_tile_rows,
    _segment_occluded,
    _sphere_table,
    _dense_compact,
    bounce_cones,
    box_bounding_spheres,
    compact_mask,
    shadow_tile_cones,
    sphere_vs_cone,
    tile_cones,
)
from openglraytracer_tpu.ops.intersect import INF_T, Hit, _DIV_EPS, _SQRT_EPS
from openglraytracer_tpu.ops.shading import SHADOW_EPS

LANE = 128
# static-unroll limit for survivor scans: Kp/Ks are small by construction
# (the broad phase exists to make them so); beyond this fall back to a
# fori_loop like the dense kernel
_UNROLL_LIMIT = 256
# total statically-scanned rows (kp + kb + per-light ks/ksb) above which the
# kernels switch to DYNAMIC trip counts: each tile scans only its measured
# survivor count (r4, VERDICT r3 next #3). Survivor-count distributions are
# heavily skewed — c5's shadow lists have p50 = 0 vs max = 159 — so a static
# K scan wastes >10x the work of the mean tile; dynamic bounds make the
# median tile nearly free while the static K only sizes the (cheap) lists.
_DYNAMIC_THRESHOLD = 96
_DYN_UNROLL = 8


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _inv_safe(x):
    """Sign-preserving 1/x, |x| clamped away from 0 (intersect._safe_div)."""
    xs = jnp.where(jnp.abs(x) < _DIV_EPS,
                   jnp.where(x < 0, -_DIV_EPS, _DIV_EPS), x)
    return 1.0 / xs


def _loop(k: int, body, carry, count=None):
    """Survivor scan driver. count=None: static unroll for small k (lets
    Mosaic software-pipeline the scalar loads), fori_loop beyond the limit.
    count (traced int32 scalar): DYNAMIC trip count — scan
    ceil(count / _DYN_UNROLL) chunks of _DYN_UNROLL unrolled steps; the
    caller guarantees count <= k and that the row array is padded to a
    multiple of _DYN_UNROLL with valid=0 rows, so the result is identical to
    the full static scan (invalid rows never update the carry)."""
    if count is None:
        if k <= _UNROLL_LIMIT:
            for j in range(k):
                carry = body(j, carry)
            return carry
        return jax.lax.fori_loop(0, k, body, carry, unroll=1)
    u = _DYN_UNROLL
    nchunks = jax.lax.div(count + (u - 1), u)

    def chunk(c, carry):
        for i in range(u):
            carry = body(c * u + i, carry)
        return carry

    return jax.lax.fori_loop(0, nchunks, chunk, carry)


def _pad_rows(rows, axis: int, u: int = _DYN_UNROLL):
    """Zero-pad the survivor axis to a multiple of u (padding rows carry
    valid=0, so scanning into them is a no-op)."""
    k = rows.shape[axis]
    pad = (-k) % u
    if not pad:
        return rows
    widths = [(0, 0)] * rows.ndim
    widths[axis] = (0, pad)
    return jnp.pad(rows, widths)


# ---------------------------------------------------------------------------
# Kernel A: primary closest hit over survivor rows
# ---------------------------------------------------------------------------
# sphere row (8):  [ocx ocy ocz qc mat gid valid pad]   oc = o0 - c (scalar
#                  per survivor: pinhole origin), qc = oc.oc - r^2
# box row (24):    [mins(3) maxs(3) ro(3) rot(9) mat gid valid ...] with
#                  ro = R^T (o0 - pos) precomputed
# plane row (16):  [nx ny nz off unx uny unz off-n.o0 mat gid ...]

def _primary_kernel(n_kp: int, n_kb: int, n_pln: int, dynamic: bool,
                    per_ray: bool, *refs):
    if dynamic:
        # cnt_ref (2T,) full-array SMEM, FLAT 1-D (SMEM pads the minor dim
        # to 128 lanes — a (T, 2) layout would cost 64x the bytes and
        # overflow the 1 MB SMEM at c5's T=4096): per tile
        # [min(p_count, kp), min(b_count, kb)] — the dynamic trip counts
        cnt_ref, *refs = refs
    if per_ray:
        # SECONDARY-RAY mode (VERDICT r4 next #4): bounce children have no
        # shared pinhole, so the per-survivor scalars (oc/qc for spheres,
        # the local-space origin for boxes, off - n.o for planes) become
        # per-ray vector math from these origin blocks; survivor rows carry
        # raw geometry instead of precomputed origin-relative terms.
        (sph_ref, box_ref, pln_ref,
         dx_ref, dy_ref, dz_ref, ox_ref, oy_ref, oz_ref,
         t_ref, nx_ref, ny_ref, nz_ref,
         ins_ref, mat_ref, gid_ref, slot_ref) = refs
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
    else:
        (sph_ref, box_ref, pln_ref,
         dx_ref, dy_ref, dz_ref,
         t_ref, nx_ref, ny_ref, nz_ref,
         ins_ref, mat_ref, gid_ref, slot_ref) = refs
    ti = pl.program_id(0)
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    f32 = dx.dtype

    qa = dx * dx + dy * dy + dz * dz
    qa_ok = qa > _DIV_EPS
    inv_2qa = 0.5 / jnp.where(qa < _DIV_EPS, _DIV_EPS, qa)  # _safe_div, qa>=0

    inf = jnp.full_like(dx, INF_T)
    zero = jnp.zeros_like(dx)

    def sphere_best(j, carry):
        tb, nx, ny, nz, ins, flp, mat, gid, slot = carry
        if per_ray:
            # row: [cx cy cz r2 mat gid valid pad]
            ocx = ox - sph_ref[0, j, 0]
            ocy = oy - sph_ref[0, j, 1]
            ocz = oz - sph_ref[0, j, 2]
            qc = ocx * ocx + ocy * ocy + ocz * ocz - sph_ref[0, j, 3]
        else:
            # row: [ocx ocy ocz qc mat gid valid pad] (pinhole-precomputed)
            ocx = sph_ref[0, j, 0]
            ocy = sph_ref[0, j, 1]
            ocz = sph_ref[0, j, 2]
            qc = sph_ref[0, j, 3]
        qb = 2.0 * (dx * ocx + dy * ocy + dz * ocz)
        qd = qb * qb - 4.0 * qa * qc
        ok = (qd >= 0.0) & qa_ok & (sph_ref[0, j, 6] > 0.5)
        sq = jnp.where(ok, jnp.sqrt(jnp.maximum(qd, _SQRT_EPS)), 0.0)
        t1 = (-qb + sq) * inv_2qa
        t2 = (-qb - sq) * inv_2qa
        t_near = jnp.minimum(t1, t2)
        t_far = jnp.maximum(t1, t2)
        ok = ok & (t_far >= 0.0)
        is_in = ok & (t_near < 0.0)
        t = jnp.where(is_in, t_far, t_near)
        ok = ok & (t > 0.0)
        t = jnp.where(ok, t, inf)
        upd = t < tb
        in_f = is_in.astype(f32)
        jf = jnp.asarray(j, f32)
        return (jnp.where(upd, t, tb),
                jnp.where(upd, ocx + t * dx, nx),   # u = (o0-c) + t d = p - c
                jnp.where(upd, ocy + t * dy, ny),
                jnp.where(upd, ocz + t * dz, nz),
                jnp.where(upd, in_f, ins),
                jnp.where(upd, in_f, flp),
                jnp.where(upd, sph_ref[0, j, 4], mat),
                jnp.where(upd, sph_ref[0, j, 5], gid),
                jnp.where(upd, jf, slot))

    carry = (inf, zero, zero, zero, zero, zero, zero,
             jnp.full_like(dx, -1.0), zero)
    if n_kp:
        carry = _loop(n_kp, sphere_best, carry,
                      count=cnt_ref[2 * ti] if dynamic else None)

    def box_best(j, carry):
        tb, nx, ny, nz, ins, flp, mat, gid, slot = carry
        bm0 = box_ref[0, j, 0]
        bm1 = box_ref[0, j, 1]
        bm2 = box_ref[0, j, 2]
        bx0 = box_ref[0, j, 3]
        bx1 = box_ref[0, j, 4]
        bx2 = box_ref[0, j, 5]
        r00, r01, r02 = box_ref[0, j, 9], box_ref[0, j, 10], box_ref[0, j, 11]
        r10, r11, r12 = box_ref[0, j, 12], box_ref[0, j, 13], box_ref[0, j, 14]
        r20, r21, r22 = box_ref[0, j, 15], box_ref[0, j, 16], box_ref[0, j, 17]
        if per_ray:
            # slots 6:9 hold the box POSITION; world->local origin per ray:
            # ro = R^T (o - pos)
            wx = ox - box_ref[0, j, 6]
            wy = oy - box_ref[0, j, 7]
            wz = oz - box_ref[0, j, 8]
            rox = r00 * wx + r10 * wy + r20 * wz
            roy = r01 * wx + r11 * wy + r21 * wz
            roz = r02 * wx + r12 * wy + r22 * wz
        else:
            # slots 6:9 hold ro = R^T (o0 - pos), precomputed per survivor
            rox = box_ref[0, j, 6]
            roy = box_ref[0, j, 7]
            roz = box_ref[0, j, 8]
        # world -> local direction: R^T d
        rdx = r00 * dx + r10 * dy + r20 * dz
        rdy = r01 * dx + r11 * dy + r21 * dz
        rdz = r02 * dx + r12 * dy + r22 * dz
        ix, iy, iz = _inv_safe(rdx), _inv_safe(rdy), _inv_safe(rdz)
        tax, tbx = (bm0 - rox) * ix, (bx0 - rox) * ix
        tay, tby = (bm1 - roy) * iy, (bx1 - roy) * iy
        taz, tbz = (bm2 - roz) * iz, (bx2 - roz) * iz
        t1x, t2x = jnp.minimum(tax, tbx), jnp.maximum(tax, tbx)
        t1y, t2y = jnp.minimum(tay, tby), jnp.maximum(tay, tby)
        t1z, t2z = jnp.minimum(taz, tbz), jnp.maximum(taz, tbz)
        t_near = jnp.maximum(t1x, jnp.maximum(t1y, t1z))
        t_far = jnp.minimum(t2x, jnp.minimum(t2y, t2z))
        ok = (t_near < t_far) & (t_far > 0.0) & (box_ref[0, j, 20] > 0.5)
        is_in = ok & (t_near < 0.0)
        t = jnp.where(is_in, t_far, t_near)
        ok = ok & (t > 0.0)
        t = jnp.where(ok, t, inf)
        upd = t < tb
        # face pick: exact equality with the winning slab boundary,
        # y-before-z priority (accel._box_narrow / reference :699-708)
        by = jnp.where(is_in, t2y, t1y)
        bz = jnp.where(is_in, t2z, t1z)
        face_y = t == by
        face_z = (~face_y) & (t == bz)
        face_x = ~(face_y | face_z)
        rd_face = jnp.where(face_y, rdy, jnp.where(face_z, rdz, rdx))
        sgn = jnp.where(rd_face > 0.0, -1.0, 1.0)
        nlx = jnp.where(face_x, sgn, 0.0)
        nly = jnp.where(face_y, sgn, 0.0)
        nlz = jnp.where(face_z, sgn, 0.0)
        nwx = r00 * nlx + r01 * nly + r02 * nlz
        nwy = r10 * nlx + r11 * nly + r12 * nlz
        nwz = r20 * nlx + r21 * nly + r22 * nlz
        jf = jnp.asarray(j, f32)
        return (jnp.where(upd, t, tb),
                jnp.where(upd, nwx, nx),
                jnp.where(upd, nwy, ny),
                jnp.where(upd, nwz, nz),
                jnp.where(upd, is_in.astype(f32), ins),
                jnp.where(upd, 0.0, flp),
                jnp.where(upd, box_ref[0, j, 18], mat),
                jnp.where(upd, box_ref[0, j, 19], gid),
                jnp.where(upd, jf, slot))

    if n_kb:
        carry = _loop(n_kb, box_best, carry,
                      count=cnt_ref[2 * ti + 1] if dynamic else None)

    tb, nx, ny, nz, ins, flp, mat, gid, slot = carry
    for p in range(n_pln):
        pnx = pln_ref[p, 0]
        pny = pln_ref[p, 1]
        pnz = pln_ref[p, 2]
        off_no = pln_ref[p, 7]      # off - n.o0 (per-ray mode: just off)
        if per_ray:
            off_no = off_no - (pnx * ox + pny * oy + pnz * oz)
        nd = pnx * dx + pny * dy + pnz * dz
        t = off_no * _inv_safe(nd)
        ok = (jnp.abs(nd) > 1.0e-9) & (t > 0.0)
        t = jnp.where(ok, t, inf)
        upd = t < tb          # strict: objects beat planes at equal t
        s = jnp.where(nd > 0.0, -1.0, 1.0)
        tb = jnp.where(upd, t, tb)
        nx = jnp.where(upd, pln_ref[p, 4] * s, nx)
        ny = jnp.where(upd, pln_ref[p, 5] * s, ny)
        nz = jnp.where(upd, pln_ref[p, 6] * s, nz)
        ins = jnp.where(upd, 0.0, ins)
        flp = jnp.where(upd, 0.0, flp)
        mat = jnp.where(upd, pln_ref[p, 8], mat)
        gid = jnp.where(upd, pln_ref[p, 9], gid)
        slot = jnp.where(upd, -1.0, slot)

    hit_f = (tb < MISS_T).astype(f32)
    inv_len = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz,
                                        _SQRT_EPS))
    sgn = jnp.where(flp > 0.5, -inv_len, inv_len) * hit_f
    t_ref[0] = tb
    nx_ref[0] = nx * sgn
    ny_ref[0] = ny * sgn
    nz_ref[0] = nz * sgn
    ins_ref[0] = ins
    mat_ref[0] = mat
    gid_ref[0] = gid
    slot_ref[0] = slot


# ---------------------------------------------------------------------------
# Kernel B: per-light shadow occlusion over survivor rows
# ---------------------------------------------------------------------------
# sphere shadow row (8):  [cx cy cz r valid ...]
# box shadow row (24):    [mins(3) maxs(3) pos(3) rot(9) valid ...]
# occlusion semantics mirror accel._segment_occluded / _box_segment_occluded:
# the cast origin is the offset shadow origin, the segment is light - p.

def _shadow_kernel(n_lights: int, light_on: tuple, n_ks: int, n_ksb: int,
                   n_pln: int, dynamic: bool, *refs):
    if dynamic:
        # cnt_ref (2L*T,) full-array SMEM, FLAT 1-D (see _primary_kernel's
        # SMEM padding note): per (tile, light) [min(s_count, ks) (0 for hot
        # tiles — their occlusion is overridden by the dense pass anyway),
        # min(sb_count, ksb)]
        cnt_ref, *refs = refs
    (lg_ref, ssph_ref, sbox_ref, pln_ref,
     sx_ref, sy_ref, sz_ref, px_ref, py_ref, pz_ref,
     occ_s_ref, occ_o_ref) = refs
    ti = pl.program_id(0)
    sx, sy, sz = sx_ref[0], sy_ref[0], sz_ref[0]
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]
    f32 = sx.dtype
    zero = jnp.zeros_like(sx)

    for li in range(n_lights):
        if not light_on[li]:
            occ_s_ref[0, li] = zero
            occ_o_ref[0, li] = zero
            continue
        tlx = lg_ref[li, 0] - px
        tly = lg_ref[li, 1] - py
        tlz = lg_ref[li, 2] - pz
        qa = tlx * tlx + tly * tly + tlz * tlz
        qa_ok = qa > _DIV_EPS

        def shadow_sphere(j, occ):
            scx = ssph_ref[0, li, j, 0]
            scy = ssph_ref[0, li, j, 1]
            scz = ssph_ref[0, li, j, 2]
            r = ssph_ref[0, li, j, 3]
            socx = sx - scx
            socy = sy - scy
            socz = sz - scz
            qb = 2.0 * (tlx * socx + tly * socy + tlz * socz)
            qcs = socx * socx + socy * socy + socz * socz - r * r
            f_end = qa + qb + qcs
            # all-float select chain: Mosaic can't truncate a (BR, 128) i8
            # vector to i1, so the bool jnp.where(inside_src, ...) used by
            # accel._segment_occluded is expressed as a lerp on {0, 1}
            inside_f = (qcs < 0.0).astype(f32)
            blocked_in = (f_end > 0.0).astype(f32)
            disc_ok = (qb * qb >= 4.0 * qa * qcs).astype(f32)
            vertex_in = ((qb < 0.0) & (-qb < 2.0 * qa)).astype(f32)
            blocked_out = jnp.maximum((f_end < 0.0).astype(f32),
                                      disc_ok * vertex_in)
            blocked = inside_f * blocked_in + (1.0 - inside_f) * blocked_out
            blocked = blocked * qa_ok.astype(f32) \
                * (ssph_ref[0, li, j, 4] > 0.5).astype(f32)
            return jnp.maximum(occ, blocked)

        occ_s = _loop(
            n_ks, shadow_sphere, zero,
            count=cnt_ref[2 * n_lights * ti + 2 * li] if dynamic else None) \
            if n_ks else zero

        def shadow_box(j, occ):
            bm0 = sbox_ref[0, li, j, 0]
            bm1 = sbox_ref[0, li, j, 1]
            bm2 = sbox_ref[0, li, j, 2]
            bx0 = sbox_ref[0, li, j, 3]
            bx1 = sbox_ref[0, li, j, 4]
            bx2 = sbox_ref[0, li, j, 5]
            cx = sbox_ref[0, li, j, 6]
            cy = sbox_ref[0, li, j, 7]
            cz = sbox_ref[0, li, j, 8]
            r00 = sbox_ref[0, li, j, 9]
            r01 = sbox_ref[0, li, j, 10]
            r02 = sbox_ref[0, li, j, 11]
            r10 = sbox_ref[0, li, j, 12]
            r11 = sbox_ref[0, li, j, 13]
            r12 = sbox_ref[0, li, j, 14]
            r20 = sbox_ref[0, li, j, 15]
            r21 = sbox_ref[0, li, j, 16]
            r22 = sbox_ref[0, li, j, 17]
            wx = sx - cx
            wy = sy - cy
            wz = sz - cz
            rox = r00 * wx + r10 * wy + r20 * wz
            roy = r01 * wx + r11 * wy + r21 * wz
            roz = r02 * wx + r12 * wy + r22 * wz
            rdx = r00 * tlx + r10 * tly + r20 * tlz
            rdy = r01 * tlx + r11 * tly + r21 * tlz
            rdz = r02 * tlx + r12 * tly + r22 * tlz
            ix, iy, iz = _inv_safe(rdx), _inv_safe(rdy), _inv_safe(rdz)
            tax, tbx = (bm0 - rox) * ix, (bx0 - rox) * ix
            tay, tby = (bm1 - roy) * iy, (bx1 - roy) * iy
            taz, tbz = (bm2 - roz) * iz, (bx2 - roz) * iz
            t1 = jnp.maximum(jnp.minimum(tax, tbx),
                             jnp.maximum(jnp.minimum(tay, tby),
                                         jnp.minimum(taz, tbz)))
            t2 = jnp.minimum(jnp.maximum(tax, tbx),
                             jnp.minimum(jnp.maximum(tay, tby),
                                         jnp.maximum(taz, tbz)))
            ok = (t1 < t2) & (t2 > 0.0) & (sbox_ref[0, li, j, 18] > 0.5)
            t = jnp.where(ok & (t1 < 0.0), t2, t1)
            blocked = ok & (t > 0.0) & (t < 1.0)
            return jnp.maximum(occ, blocked.astype(f32))

        occ_o = _loop(
            n_ksb, shadow_box, zero,
            count=cnt_ref[2 * n_lights * ti + 2 * li + 1] if dynamic
            else None) if n_ksb else zero

        for p in range(n_pln):
            pnx = pln_ref[p, 0]
            pny = pln_ref[p, 1]
            pnz = pln_ref[p, 2]
            off = pln_ref[p, 3]
            nd = pnx * tlx + pny * tly + pnz * tlz
            no = pnx * sx + pny * sy + pnz * sz
            t = (off - no) * _inv_safe(nd)
            blocked = (jnp.abs(nd) > 1.0e-9) & (t > 0.0) & (t < 1.0)
            occ_o = jnp.maximum(occ_o, blocked.astype(f32))

        occ_s_ref[0, li] = occ_s
        occ_o_ref[0, li] = occ_o


# ---------------------------------------------------------------------------
# Row packing (XLA, tiny)
# ---------------------------------------------------------------------------

def _pad_cols(x, width: int):
    return jnp.pad(x, ((0, 0), (0, 0), (0, width - x.shape[-1])))


def _primary_sphere_rows(scene: Scene, o0, p_idx, p_valid):
    """(T, Kp, 8) kernel rows from the survivor lists: oc, qc precomputed."""
    rows = _gather_tile_rows(_sphere_table(scene), p_idx)   # (T, Kp, 6)
    oc = o0[None, None, :] - rows[..., 0:3]
    qc = jnp.sum(oc * oc, axis=-1) - rows[..., 3] * rows[..., 3]
    return jnp.concatenate([
        oc, qc[..., None], rows[..., 4:6],
        p_valid.astype(rows.dtype)[..., None],
        jnp.zeros_like(qc)[..., None]], axis=-1)


def _primary_box_rows(scene: Scene, o0, b_idx, b_valid):
    """(T, Kb, 24) kernel rows: mins/maxs, local-space origin, rot, ids."""
    rows = _gather_tile_rows(_box_table(scene), b_idx)      # (T, Kb, 20)
    w = o0[None, None, :] - rows[..., 6:9]                  # o0 - pos
    rot = rows[..., 9:18].reshape(rows.shape[:2] + (3, 3))
    ro = jnp.einsum("tkij,tki->tkj", rot, w)                # R^T w
    out = jnp.concatenate([
        rows[..., 0:6], ro, rows[..., 9:18], rows[..., 18:20],
        b_valid.astype(rows.dtype)[..., None]], axis=-1)    # (T, Kb, 21)
    return _pad_cols(out, 24)


def _secondary_sphere_rows(scene: Scene, p_idx, p_valid):
    """(T, Kp, 8) [cx cy cz r^2 mat gid valid pad] — raw geometry for the
    per-ray-origin kernel (no shared pinhole to precompute oc/qc against)."""
    rows = _gather_tile_rows(_sphere_table(scene), p_idx)   # (T, Kp, 6)
    r2 = rows[..., 3] * rows[..., 3]
    return jnp.concatenate([
        rows[..., 0:3], r2[..., None], rows[..., 4:6],
        p_valid.astype(rows.dtype)[..., None],
        jnp.zeros_like(r2)[..., None]], axis=-1)


def _secondary_box_rows(scene: Scene, b_idx, b_valid):
    """(T, Kb, 24) [mins maxs pos rot9 mat gid valid ...] — box POSITION in
    slots 6:9 (the per-ray kernel computes R^T (o - pos) itself)."""
    rows = _gather_tile_rows(_box_table(scene), b_idx)      # (T, Kb, 20)
    out = jnp.concatenate([rows,
                           b_valid.astype(rows.dtype)[..., None]], axis=-1)
    return _pad_cols(out, 24)


def _plane_table(scene: Scene, o0, n_sph: int, n_box: int):
    """(P, 16) [n(3) off un(3) off-n.o0 mat gid ...]; raw normal for the
    candidate t (bit-matching accel's plane_candidates), unit for the
    output normal."""
    pln = scene.planes
    p = pln.count
    dtype = pln.normal.dtype if p else jnp.float32
    tab = jnp.zeros((max(p, 1), 16), dtype)
    if p:
        nrm = pln.normal
        length = jnp.sqrt(jnp.maximum(
            jnp.sum(nrm * nrm, axis=-1, keepdims=True), _SQRT_EPS))
        no = jnp.sum(nrm * o0[None, :], axis=-1)
        tab = tab.at[:, 0:3].set(nrm)
        tab = tab.at[:, 3].set(pln.offset)
        tab = tab.at[:, 4:7].set(nrm / length)
        tab = tab.at[:, 7].set(pln.offset - no)
        tab = tab.at[:, 8].set(pln.material_id.astype(dtype))
        tab = tab.at[:, 9].set(n_sph + n_box
                               + jnp.arange(p, dtype=dtype))
    return tab


def _shadow_sphere_rows(scene: Scene, s_idx, s_valid):
    """(T, Ks, 8) [c(3) r valid ...]."""
    tab = jnp.concatenate([scene.spheres.center,
                           scene.spheres.radius[:, None]], axis=-1)
    rows = _gather_tile_rows(tab, s_idx)                    # (T, Ks, 4)
    out = jnp.concatenate([rows, s_valid.astype(rows.dtype)[..., None]],
                          axis=-1)
    return _pad_cols(out, 8)


def _shadow_box_rows(scene: Scene, sb_idx, sb_valid):
    """(T, Ksb, 24) [mins maxs pos rot9 valid ...]."""
    rows = _gather_tile_rows(_box_table(scene), sb_idx)     # (T, Ksb, 20)
    out = jnp.concatenate([rows[..., 0:18],
                           sb_valid.astype(rows.dtype)[..., None]], axis=-1)
    return _pad_cols(out, 24)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _ray_blocks(x, t_tiles: int, br: int):
    """(R, 3) tile-major -> three (T, BR, LANE) component arrays."""
    comps = x.reshape(t_tiles, br, LANE, 3)
    return comps[..., 0], comps[..., 1], comps[..., 2]


def culled_geometry_pallas(scene: Scene, origins, dirs, tile_p: int, kp: int,
                           ks: int, shadow_lights: tuple | None = None,
                           hot_m: int = 0, kb: int = 0, ksb: int = 0,
                           active=None, hot_p: int = 0):
    """accel.culled_geometry with the narrow phases as Mosaic kernels.

    Same arguments, same return contract: (Hit (R,), occluded (R, L),
    CullAux). Requires tile_p % 128 == 0 (the ray tile maps onto
    (tile_p/128, 128) vregs).

    active (R,) bool switches on SECONDARY-RAY mode exactly as in
    accel.culled_geometry (VERDICT r4 next #4 — previously only the XLA
    culled path had it, so bounce children never reached the Mosaic narrow
    phase): per-ray origins, bounce-cone broad phase (origin-bbox apex +
    Minkowski-expanded spheres), inactive rays forced to miss. The kernels
    run in per_ray mode — survivor rows carry raw geometry and the
    origin-relative terms are computed per ray in VMEM.

    hot_p > 0 (secondary mode only, r5): HOT-PRIMARY tiles. Bounce-cone
    survivor counts are extremely heavy-tailed on curved-mirror scenes
    (c4_mirror4096: p50 = 0 but p90 = N — a tile looking at a sphere's
    surface reflects across the whole scene), so sizing the static
    (T, Kp, 8) row gather by the max count was the measured row bottleneck
    (~100 ms/frame of gathers at Kp = 4096). With hot_p: Kp is a QUANTILE
    cap; the top-hot_p tiles whose true count exceeds it skip the gathered
    lists entirely and run a dense pass over the GLOBAL object table — one
    (N, 8) block, VMEM-resident across the grid, zero gather — which is
    EXACT (scans every object). Their per-tile survivor lists are then
    rebuilt posthoc as ascending DISTINCT-WINNER lists so
    culled_material_rows and the analytic backward work unchanged; a hot
    tile only reports overflow if its winners exceed Kp (information the
    backward would actually lose — never silent, same contract as cold
    overflow)."""
    assert tile_p % LANE == 0, \
        f"culled_pallas needs tile_p % {LANE} == 0 (got {tile_p})"
    assert hot_p == 0 or active is not None, \
        "hot_p is a secondary-mode (bounce bundle) feature"
    r_total = origins.shape[0]
    t_tiles = r_total // tile_p
    br = tile_p // LANE
    dtype = origins.dtype
    n_sph = scene.spheres.count
    n_box = scene.boxes.count
    n_pln = scene.planes.count
    n_lights = scene.lights.count
    o0 = origins[0]
    shared = active is None
    kb = min(kb, n_box) if kb > 0 else n_box
    ksb = min(ksb, n_box) if ksb > 0 else n_box
    interpret = _use_interpret()

    # dynamic trip counts (r4): when the total static scan is long, have
    # each tile scan only its measured survivor count — the count
    # distributions are skewed enough (c5 shadow p50 = 0, max = 159) that
    # this is a >2x kernel win at 4096 objects, and it caps compile time
    # (no K-length unrolls). Below the threshold the fully-unrolled static
    # scan pipelines better and stays.
    n_on = sum(1 for li in range(n_lights)
               if shadow_lights is None or shadow_lights[li])
    scan_total = min(kp, n_sph) + (kb if n_box else 0) \
        + n_on * (min(ks, n_sph) + (ksb if n_box else 0))
    hot_on = (not shared) and hot_p > 0 and (n_sph > 0 or n_box > 0)
    # the hot pass zeroes cold-kernel trip counts for hot tiles, so it
    # needs the dynamic-count machinery regardless of scan_total
    dynamic = scan_total > _DYNAMIC_THRESHOLD or hot_on

    dirs_t = dirs.reshape(t_tiles, tile_p, 3)
    if shared:
        axis, cos_half = tile_cones(dirs_t)
        apex, expand, empty_t = o0, None, None
    else:
        # secondary bundles: bbox apex + Minkowski expansion + direction
        # cone over ACTIVE rays (accel.culled_geometry's exact recipe —
        # zero-dir TIR rays excluded so they can't blow the cone open)
        origins_t = origins.reshape(t_tiles, tile_p, 3)
        act = active & (jnp.sum(dirs * dirs, -1) > _DIV_EPS)
        act_t = act.reshape(t_tiles, tile_p)
        apex, axis, cos_half, expand, empty_t = bounce_cones(
            origins_t, dirs_t, act_t)

    # ---- broad phase (identical to accel.culled_geometry: dense per-tile
    # compaction — exact; see accel.culled_geometry's note on the withdrawn
    # two-level coarse level)
    if n_sph:
        if shared:
            p_idx, p_valid, p_count = _dense_compact(
                apex, axis, cos_half, scene.spheres.center,
                scene.spheres.radius, kp)
            sph_rows = _primary_sphere_rows(scene, o0, p_idx, p_valid)
        else:
            pmask = sphere_vs_cone(apex, axis, cos_half, scene.spheres.center,
                                   scene.spheres.radius, expand=expand)
            pmask = pmask & (~empty_t)[:, None]
            p_idx, p_valid, p_count = compact_mask(pmask, kp)
            sph_rows = _secondary_sphere_rows(scene, p_idx, p_valid)
    else:
        p_idx = jnp.zeros((t_tiles, 0), jnp.int32)
        p_valid = jnp.zeros((t_tiles, 0), bool)
        p_count = jnp.zeros((t_tiles,), jnp.int32)
        sph_rows = jnp.zeros((t_tiles, 1, 8), dtype)
    kp_eff = p_idx.shape[-1]

    if n_box:
        bc_bs, br_bs = box_bounding_spheres(scene)
        if shared:
            b_idx, b_valid, b_count = _dense_compact(apex, axis, cos_half,
                                                     bc_bs, br_bs, kb)
            box_rows = _primary_box_rows(scene, o0, b_idx, b_valid)
        else:
            bmask = sphere_vs_cone(apex, axis, cos_half, bc_bs, br_bs,
                                   expand=expand)
            bmask = bmask & (~empty_t)[:, None]
            b_idx, b_valid, b_count = compact_mask(bmask, kb)
            box_rows = _secondary_box_rows(scene, b_idx, b_valid)
    else:
        b_idx = jnp.zeros((t_tiles, 0), jnp.int32)
        b_valid = jnp.zeros((t_tiles, 0), bool)
        b_count = jnp.zeros((t_tiles,), jnp.int32)
        box_rows = jnp.zeros((t_tiles, 1, 24), dtype)
    kb_eff = b_idx.shape[-1]

    pln_tab = _plane_table(scene, o0 if shared else jnp.zeros_like(o0),
                           n_sph, n_box)

    dx, dy, dz = _ray_blocks(dirs, t_tiles, br)
    if not shared:
        ox_b, oy_b, oz_b = _ray_blocks(origins, t_tiles, br)

    # ---- hot-primary tile selection (r5, secondary mode): tiles whose
    # bounce cone kept more objects than the static caps take the dense
    # global-table pass below; the cold kernel skips them (trip count 0)
    if hot_on:
        hp_m = min(hot_p, t_tiles)
        over = jnp.zeros((t_tiles,), bool)
        score = jnp.zeros((t_tiles,), jnp.int32)
        if n_sph:
            over = over | (p_count > kp_eff)
            score = score + p_count
        if n_box and kb_eff < n_box:
            over = over | (b_count > kb_eff)
        if n_box:
            score = score + b_count
        _, hotp_ids = jax.lax.top_k(jnp.where(over, score, -1), hp_m)
        hotp_real = jnp.take(over, hotp_ids)                  # (M,)
        is_hotp = jnp.zeros((t_tiles,), bool).at[hotp_ids].set(hotp_real)

    # ---- kernel A: primary narrow phase
    if dynamic:
        sph_rows = _pad_rows(sph_rows, 1)
        box_rows = _pad_rows(box_rows, 1)
        cnt_a = jnp.stack(
            [jnp.minimum(p_count, kp_eff),
             jnp.minimum(b_count, kb_eff)],
            axis=-1).astype(jnp.int32)                      # (T, 2)
        if hot_on:
            cnt_a = jnp.where(is_hotp[:, None], 0, cnt_a)
        cnt_a = cnt_a.reshape(-1)                           # flat (2T,)
    ray_spec = pl.BlockSpec((1, br, LANE), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    sph_spec = pl.BlockSpec((1,) + sph_rows.shape[1:], lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    box_spec = pl.BlockSpec((1,) + box_rows.shape[1:], lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # full-array SMEM residency (T*2 i32 = 32 KB at c5's T=4096): Mosaic
    # requires SMEM operands unblocked, the kernel indexes by program id
    cnt_a_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    rblk = functools.partial(jax.ShapeDtypeStruct, (t_tiles, br, LANE))
    outs = pl.pallas_call(
        functools.partial(_primary_kernel, kp_eff, kb_eff, n_pln, dynamic,
                          not shared),
        grid=(t_tiles,),
        in_specs=([cnt_a_spec] if dynamic else [])
        + [sph_spec, box_spec, full]
        + [ray_spec] * (3 if shared else 6),
        out_specs=[ray_spec] * 8,
        out_shape=[rblk(dtype)] * 8,
        interpret=interpret,
    )(*(((cnt_a,) if dynamic else ())
        + (sph_rows, box_rows, pln_tab, dx, dy, dz)
        + (() if shared else (ox_b, oy_b, oz_b))))
    t_b, nx_b, ny_b, nz_b, ins_b, mat_b, gid_b, slot_b = outs

    # ---- hot-primary dense pass: the same per-ray kernel over the GLOBAL
    # object tables — one (N, 8)/(Nb, 24) block with a constant index map
    # (VMEM-resident across the grid, zero gather), trip count = N on the
    # truly-hot tiles, 0 on the top-k slack. EXACT: every object scanned.
    if hot_on:
        if n_sph:
            g_sph = _pad_rows(_secondary_sphere_rows(
                scene, jnp.arange(n_sph, dtype=jnp.int32)[None, :],
                jnp.ones((1, n_sph), bool)), 1)
        else:
            g_sph = jnp.zeros((1, 1, 8), dtype)
        if n_box:
            g_box = _pad_rows(_secondary_box_rows(
                scene, jnp.arange(n_box, dtype=jnp.int32)[None, :],
                jnp.ones((1, n_box), bool)), 1)
        else:
            g_box = jnp.zeros((1, 1, 24), dtype)
        n_gp = g_sph.shape[1] if n_sph else 0
        n_gb = g_box.shape[1] if n_box else 0
        cnt_h = jnp.stack(
            [jnp.where(hotp_real, n_sph, 0),
             jnp.where(hotp_real, n_box, 0)],
            axis=-1).astype(jnp.int32).reshape(-1)          # flat (2M,)
        take_h = functools.partial(jnp.take, indices=hotp_ids, axis=0)
        hot_in = tuple(take_h(b) for b in (dx, dy, dz, ox_b, oy_b, oz_b))
        g_sph_spec = pl.BlockSpec((1,) + g_sph.shape[1:],
                                  lambda t: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
        g_box_spec = pl.BlockSpec((1,) + g_box.shape[1:],
                                  lambda t: (0, 0, 0),
                                  memory_space=pltpu.VMEM)
        hblk = functools.partial(jax.ShapeDtypeStruct, (hp_m, br, LANE))
        outs_h = pl.pallas_call(
            functools.partial(_primary_kernel, n_gp, n_gb, n_pln, True,
                              True),
            grid=(hp_m,),
            in_specs=[cnt_a_spec, g_sph_spec, g_box_spec, full]
            + [ray_spec] * 6,
            out_specs=[ray_spec] * 8,
            out_shape=[hblk(dtype)] * 8,
            interpret=interpret,
        )(cnt_h, g_sph, g_box, pln_tab, *hot_in)

        def hmerge(x_full, x_hot):
            cur = jnp.take(x_full, hotp_ids, axis=0)
            return x_full.at[hotp_ids].set(
                jnp.where(hotp_real[:, None, None], x_hot, cur))

        (t_b, nx_b, ny_b, nz_b, ins_b, mat_b, gid_b, slot_b) = tuple(
            hmerge(xf, xh) for xf, xh in
            zip((t_b, nx_b, ny_b, nz_b, ins_b, mat_b, gid_b, slot_b),
                outs_h))

    t_flat = t_b.reshape(-1)
    n = jnp.stack([nx_b.reshape(-1), ny_b.reshape(-1), nz_b.reshape(-1)],
                  axis=-1)
    if not shared:
        # inactive secondary rays are defined misses (their colors carry
        # zero bounce weight; forcing the miss keeps their garbage out of
        # the shadow-cone bboxes below) — accel.culled_geometry semantics
        t_flat = jnp.where(active, t_flat, INF_T)
    hit_mask = t_flat < MISS_T
    in_flat = (ins_b.reshape(-1) > 0.5) & hit_mask
    mat_flat = jnp.where(hit_mask, mat_b.reshape(-1).astype(jnp.int32), 0)
    gid_flat = jnp.where(hit_mask, gid_b.reshape(-1).astype(jnp.int32), -1)
    slot_flat = slot_b.reshape(t_tiles, tile_p).astype(jnp.int32)

    is_sph_w = hit_mask & (gid_flat >= 0) & (gid_flat < n_sph)
    is_box_w = hit_mask & (gid_flat >= n_sph) & (gid_flat < n_sph + n_box)
    j_local = jnp.where(is_sph_w.reshape(t_tiles, tile_p), slot_flat, -1)
    jb_local = jnp.where(is_box_w.reshape(t_tiles, tile_p), slot_flat, -1)

    # ---- posthoc winner lists for hot tiles: the dense pass reports
    # GLOBAL row ids in gid/slot; rebuild ascending distinct-winner lists
    # (idx/valid/count capped at Kp/Kb — overflow = winners the backward
    # would lose, surfaced through the count contract) and re-rank
    # j_local/jb_local into them, so culled_material_rows and _culled_bwd
    # consume hot tiles exactly like cold ones.
    if hot_on:
        gid_t = gid_flat.reshape(t_tiles, tile_p)
        hitm_h = jnp.take(hit_mask.reshape(t_tiles, tile_p), hotp_ids,
                          axis=0) & hotp_real[:, None]
        gid_h = jnp.take(gid_t, hotp_ids, axis=0)            # (M, P)
        ii = jnp.arange(hp_m, dtype=jnp.int32)[:, None]

        def splice(full, hot_rows):
            cur = jnp.take(full, hotp_ids, axis=0)
            sel = hotp_real.reshape((hp_m,) + (1,) * (cur.ndim - 1))
            return full.at[hotp_ids].set(jnp.where(sel, hot_rows, cur))

        def winner_lists(lo, n_obj, k_eff):
            win = hitm_h & (gid_h >= lo) & (gid_h < lo + n_obj)
            loc = jnp.clip(gid_h - lo, 0, n_obj - 1)
            wm = jnp.zeros((hp_m, n_obj), jnp.int32).at[ii, loc].max(
                win.astype(jnp.int32)) > 0
            w_idx, w_valid, w_cnt = compact_mask(wm, k_eff)
            pref = jnp.cumsum(wm.astype(jnp.int32), axis=1)
            rank = jnp.take_along_axis(pref, loc, axis=1) - 1
            # winner-overflow ranks (>= k_eff) fall off the list: mark -1
            # ("not this list's winner") — the tile's count > k flags it
            jl = jnp.where(win & (rank < k_eff), rank, -1)
            return w_idx, w_valid, w_cnt, jl

        if n_sph:
            w_idx, w_valid, w_cnt, jl_h = winner_lists(0, n_sph, kp_eff)
            p_idx = splice(p_idx, w_idx)
            p_valid = splice(p_valid, w_valid)
            p_count = splice(p_count, w_cnt)
            j_local = splice(j_local, jl_h)
        if n_box:
            wb_idx, wb_valid, wb_cnt, jb_h = winner_lists(n_sph, n_box,
                                                          kb_eff)
            b_idx = splice(b_idx, wb_idx)
            b_valid = splice(b_valid, wb_valid)
            b_count = splice(b_count, wb_cnt)
            jb_local = splice(jb_local, jb_h)

    t_for_p = jnp.where(hit_mask, t_flat, 0.0)
    p = origins + t_for_p[:, None] * dirs
    hit = Hit(t=t_flat, p=p, n=n, inside=in_flat,
              material_id=mat_flat, obj_id=gid_flat, hit=hit_mask)

    # ---- shadow broad phase per light (identical to accel) + kernel B
    shadow_org = hit.p + hit.n * SHADOW_EPS
    so_t = shadow_org.reshape(t_tiles, tile_p, 3)
    p_t = hit.p.reshape(t_tiles, tile_p, 3)

    light_on = tuple(
        (shadow_lights is None or shadow_lights[li]) for li in
        range(n_lights))
    s_counts = []
    s_overflow = []
    sb_counts = []
    sb_overflow = []
    ssph_rows = []   # per light (T, Ks, 8)
    sbox_rows = []   # per light (T, Ksb, 24)
    hot_infos = []   # per light (is_hot (T,), occ_full (T, P)) or None
    zero_c = jnp.zeros((t_tiles,), jnp.int32)
    zero_o = jnp.zeros((), jnp.int32)
    ks_eff = min(ks, n_sph) if n_sph else 0
    ksb_eff = ksb if n_box else 0
    if n_box:
        bc_bs, br_bs = box_bounding_spheres(scene)
    for li in range(n_lights):
        if not light_on[li]:
            s_counts.append(zero_c)
            s_overflow.append(zero_o)
            sb_counts.append(zero_c)
            sb_overflow.append(zero_o)
            ssph_rows.append(jnp.zeros((t_tiles, max(ks_eff, 1), 8), dtype))
            sbox_rows.append(jnp.zeros((t_tiles, max(ksb_eff, 1), 24), dtype))
            hot_infos.append(None)
            continue
        lpos = scene.lights.position[li]
        axis_s, cos_s, max_d, empty_s = shadow_tile_cones(
            shadow_org, hit_mask, tile_p, lpos)
        if n_sph:
            # dense shadow compaction (see accel.culled_geometry's
            # note: light-facing strips defeat any lossless coarse cap)
            s_idx, s_valid, s_count = _dense_compact(
                lpos, axis_s, cos_s, scene.spheres.center,
                scene.spheres.radius, ks, max_dist=max_d,
                tile_valid=~empty_s)
            s_counts.append(s_count)
            ssph_rows.append(_shadow_sphere_rows(scene, s_idx, s_valid))
            if hot_m > 0:
                _, hot_ids = jax.lax.top_k(s_count, hot_m)
                occ_h = _segment_occluded(
                    jnp.take(so_t, hot_ids, axis=0),
                    jnp.take(p_t, hot_ids, axis=0), lpos,
                    scene.spheres.center[None, :, 0],
                    scene.spheres.center[None, :, 1],
                    scene.spheres.center[None, :, 2],
                    scene.spheres.radius[None, :],
                    jnp.ones((1, n_sph), bool))              # (M, P)
                is_hot = jnp.zeros((t_tiles,), bool).at[hot_ids].set(True)
                occ_full = jnp.zeros((t_tiles, tile_p), bool) \
                    .at[hot_ids].set(occ_h)
                hot_infos.append((is_hot, occ_full))
                s_overflow.append(jnp.sum((s_count > ks) & ~is_hot,
                                          dtype=jnp.int32))
            else:
                hot_infos.append(None)
                s_overflow.append(jnp.sum(s_count > ks, dtype=jnp.int32))
        else:
            s_counts.append(zero_c)
            s_overflow.append(zero_o)
            ssph_rows.append(jnp.zeros((t_tiles, max(ks_eff, 1), 8), dtype))
            hot_infos.append(None)
        if n_box:
            sb_idx, sb_valid, sb_cnt = _dense_compact(
                lpos, axis_s, cos_s, bc_bs, br_bs, ksb, max_dist=max_d,
                tile_valid=~empty_s)
            sbox_rows.append(_shadow_box_rows(scene, sb_idx, sb_valid))
            sb_counts.append(sb_cnt)
            sb_overflow.append(jnp.sum(sb_cnt > ksb, dtype=jnp.int32))
        else:
            sbox_rows.append(jnp.zeros((t_tiles, max(ksb_eff, 1), 24), dtype))
            sb_counts.append(zero_c)
            sb_overflow.append(zero_o)

    if n_lights and any(light_on):
        ssph = jnp.stack(ssph_rows, axis=1)        # (T, L, Ks, 8)
        sbox = jnp.stack(sbox_rows, axis=1)        # (T, L, Ksb, 24)
        if dynamic:
            ks_pre, ksb_pre = ssph.shape[2], sbox.shape[2]
            ssph = _pad_rows(ssph, 2)
            sbox = _pad_rows(sbox, 2)
            cols = []
            for li in range(n_lights):
                sc = jnp.minimum(s_counts[li], ks_pre)
                if hot_infos[li] is not None:
                    # hot tiles' sphere occlusion is overridden by the dense
                    # XLA pass — skip their kernel scan entirely
                    sc = jnp.where(hot_infos[li][0], 0, sc)
                cols.append(sc)
                cols.append(jnp.minimum(sb_counts[li], ksb_pre))
            cnt_b = jnp.stack(cols, axis=-1).astype(jnp.int32) \
                .reshape(-1)                             # flat (2L*T,)
        lg = jnp.zeros((n_lights, 8), dtype).at[:, :3].set(
            scene.lights.position)
        sx, sy, sz = _ray_blocks(shadow_org, t_tiles, br)
        px, py, pz = _ray_blocks(hit.p, t_tiles, br)

        n_ks = ssph.shape[2] if n_sph else 0
        n_ksb = sbox.shape[2] if n_box else 0
        ssph_spec = pl.BlockSpec((1,) + ssph.shape[1:], lambda t: (t, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        sbox_spec = pl.BlockSpec((1,) + sbox.shape[1:], lambda t: (t, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        occ_spec = pl.BlockSpec((1, n_lights, br, LANE),
                                lambda t: (t, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        cnt_b_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        occ_shape = jax.ShapeDtypeStruct((t_tiles, n_lights, br, LANE), dtype)
        occ_s, occ_o = pl.pallas_call(
            functools.partial(_shadow_kernel, n_lights, light_on, n_ks,
                              n_ksb, n_pln, dynamic),
            grid=(t_tiles,),
            in_specs=([cnt_b_spec] if dynamic else [])
            + [full, ssph_spec, sbox_spec, full] + [ray_spec] * 6,
            out_specs=[occ_spec] * 2,
            out_shape=[occ_shape] * 2,
            interpret=interpret,
        )(*(((cnt_b,) if dynamic else ())
            + (lg, ssph, sbox, pln_tab, sx, sy, sz, px, py, pz)))

        occ_s = occ_s.reshape(t_tiles, n_lights, tile_p) > 0.5
        occ_o = occ_o.reshape(t_tiles, n_lights, tile_p) > 0.5
        occ_cols = []
        for li in range(n_lights):
            col_s = occ_s[:, li]
            if hot_infos[li] is not None:
                is_hot, occ_full = hot_infos[li]
                col_s = jnp.where(is_hot[:, None], occ_full, col_s)
            occ_cols.append((col_s | occ_o[:, li]).reshape(-1))
        occluded = jnp.stack(occ_cols, axis=-1)
    else:
        occluded = jnp.zeros((r_total, n_lights), bool)

    stack_or = lambda xs, shape: (jnp.stack(xs) if n_lights
                                  else jnp.zeros(shape, jnp.int32))
    aux = CullAux(p_idx=p_idx, p_valid=p_valid, p_count=p_count,
                  s_count=stack_or(s_counts, (0, t_tiles)),
                  s_overflow=stack_or(s_overflow, (0,)),
                  j_local=j_local,
                  b_idx=b_idx, b_valid=b_valid, b_count=b_count,
                  sb_count=stack_or(sb_counts, (0, t_tiles)),
                  sb_overflow=stack_or(sb_overflow, (0,)),
                  jb_local=jb_local)
    return hit, occluded, aux


# ---------------------------------------------------------------------------
# Custom VJP: accel.py's tile-structured analytic backward, reused verbatim
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def culled_pallas_geometry_op(scene: Scene, origins, dirs, tile_p: int,
                              kp: int, ks: int,
                              shadow_lights: tuple | None = None,
                              hot_m: int = 0, kb: int = 0, ksb: int = 0):
    return culled_geometry_pallas(scene, origins, dirs, tile_p, kp, ks,
                                  shadow_lights, hot_m, kb, ksb)


def _cp_fwd(scene, origins, dirs, tile_p, kp, ks, shadow_lights, hot_m,
            kb, ksb):
    hit, occ, aux = culled_geometry_pallas(scene, origins, dirs, tile_p, kp,
                                           ks, shadow_lights, hot_m, kb, ksb)
    return (hit, occ, aux), (scene, origins, dirs, hit, aux)


def _cp_bwd(tile_p, kp, ks, shadow_lights, hot_m, kb, ksb, res, g):
    from openglraytracer_tpu.ops.accel import _culled_bwd
    return _culled_bwd(tile_p, kp, ks, shadow_lights, hot_m, kb, ksb, res, g)


culled_pallas_geometry_op.defvjp(_cp_fwd, _cp_bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def bounce_culled_pallas_geometry_op(scene: Scene, origins, dirs, active,
                                     tile_p: int, kp: int, ks: int,
                                     shadow_lights: tuple | None = None,
                                     hot_m: int = 0, kb: int = 0,
                                     ksb: int = 0, hot_p: int = 0):
    """culled_geometry_pallas in SECONDARY-RAY mode with the same analytic
    VJP as accel.bounce_culled_geometry_op (the backward replays per-ray
    and never assumed a pinhole — reused verbatim, exactly as the primary
    pallas op reuses _culled_bwd). hot_p > 0 adds the dense global-table
    pass for over-cap tiles (see culled_geometry_pallas); the posthoc
    winner lists keep the shared backward exact on hot tiles too."""
    return culled_geometry_pallas(scene, origins, dirs, tile_p, kp, ks,
                                  shadow_lights, hot_m, kb, ksb,
                                  active=active, hot_p=hot_p)


def _bcp_fwd(scene, origins, dirs, active, tile_p, kp, ks, shadow_lights,
             hot_m, kb, ksb, hot_p):
    hit, occ, aux = culled_geometry_pallas(scene, origins, dirs, tile_p, kp,
                                           ks, shadow_lights, hot_m, kb, ksb,
                                           active=active, hot_p=hot_p)
    return (hit, occ, aux), (scene, origins, dirs, hit, aux, active.shape)


def _bcp_bwd(tile_p, kp, ks, shadow_lights, hot_m, kb, ksb, hot_p, res, g):
    from openglraytracer_tpu.ops.accel import _bounce_culled_bwd
    return _bounce_culled_bwd(tile_p, kp, ks, shadow_lights, hot_m, kb, ksb,
                              res, g)


bounce_culled_pallas_geometry_op.defvjp(_bcp_fwd, _bcp_bwd)

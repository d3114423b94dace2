"""Geometry stage with an analytic O(rays) custom VJP.

The forward is the closest-hit + shadow-occlusion query (either engine).
The KEY structural fact the autodiff can't see: the gradient of the hit
record w.r.t. scene geometry flows ONLY through each ray's winning object —
the argmin selection is piecewise-constant, every losing candidate's branch
is dead (and the shadow mask is binary, so occlusion carries zero gradient,
exactly as autodiff-through-booleans gives). Autodiff of the chunked scan
re-runs the whole O(rays x objects) candidate computation backward; this VJP
instead:

  1. gathers the winning object's parameters per ray — O(R),
  2. replays ONE candidate computation per ray through jax.vjp — O(R),
  3. scatter-adds the per-ray parameter cotangents into the scene gradient
     by winner index — O(R) + tiny.

For the 64-sphere 1024^2 benchmark this turns a ~60 ms backward into a few
ms, and for 4096-sphere scenes it removes an O(N) factor entirely.

All three primitive types are covered: spheres, oriented boxes (the
reference's own demo world, raytrace_compute.glsl:261-320; slab test
:647-724), and planes. The box replay mirrors intersect.box_candidates
operation-for-operation so the forward's face-equality pick (:699-708)
reproduces bit-identically; gradients w.r.t. mins/maxs/position/angles flow
through the frozen winning slab (max/min subgradients) and the rotation.

Gradient semantics are identical to jax.grad of the XLA path (verified in
tests/test_geometry_vjp.py): 'local' gradients with straight-through
visibility, the same contract the reference-free differentiable-rendering
literature uses (SURVEY.md §7 hard part (e)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from openglraytracer_tpu.models.scene import MISS_T, Scene
from openglraytracer_tpu.ops.intersect import (
    Hit,
    INF_T,
    _rot_apply,
    _rot_apply_t,
    _safe_div,
    closest_hit,
    closest_hit_sp,
    shadow_occlusion_sp,
)
from openglraytracer_tpu.ops.shading import SHADOW_EPS
from openglraytracer_tpu.ops.transforms import euler_rotation_3x3b


def _forward(scene: Scene, origins, dirs, engine: str, chunk_size: int,
             shadow_lights):
    if engine == "pallas":
        from openglraytracer_tpu.ops.pallas_render import pallas_geometry
        geo = pallas_geometry(scene, origins, dirs)
        return geo.hit, geo.occluded
    if scene.boxes.count:
        hit = closest_hit(scene, origins, dirs, chunk_size=chunk_size)
    else:
        hit = closest_hit_sp(scene, origins, dirs, chunk_size=chunk_size)
    shadow_org = hit.p + hit.n * SHADOW_EPS
    to_lights = scene.lights.position[None, :, :] - hit.p[:, None, :]
    occ = shadow_occlusion_sp(scene, shadow_org, to_lights,
                              chunk_size=chunk_size,
                              lights_mask=shadow_lights)
    return hit, occ


def _sphere_recompute(c, r, o, d, inside):
    """Winning-sphere (t, p, n) replay; frozen inside flag selects the root."""
    eps = 1.0e-12
    oc = o - c
    qa = jnp.sum(d * d, axis=-1)
    qb = 2.0 * jnp.sum(d * oc, axis=-1)
    qc = jnp.sum(oc * oc, axis=-1) - r * r
    disc = qb * qb - 4.0 * qa * qc
    disc_safe = jnp.where(disc > 0.0, disc, 1.0)
    sq = jnp.where(disc > 0.0, jnp.sqrt(disc_safe), 0.0)
    inv_2qa = _safe_div(jnp.asarray(0.5, qa.dtype), qa)
    t_near = (-qb - sq) * inv_2qa
    t_far = (-qb + sq) * inv_2qa
    t_s = jnp.where(inside, t_far, t_near)
    p_s = o + t_s[:, None] * d
    u = p_s - c
    u_len = jnp.sqrt(jnp.maximum(jnp.sum(u * u, axis=-1, keepdims=True), eps))
    n_s = u / u_len
    n_s = jnp.where(inside[:, None], -n_s, n_s)
    return t_s, p_s, n_s


def _box_recompute(bm, bx, bp, rot, o, d, inside):
    """Winning-box (t, p, n) replay — the same arithmetic as
    intersect.box_candidates restricted to one box per ray, so the slab t's
    and the face-equality pick reproduce the forward bit-for-bit. The frozen
    inside flag selects entry vs exit; the face pick and its sign are
    re-derived (piecewise-constant discrete decisions, identical by
    construction).

    rot (R, 3, 3) is the per-ray GATHERED box rotation: the angles->rotation
    chain is differentiated per BOX (tiny) in the scatter stage, not per ray
    — no per-ray trig."""
    wx = o[:, 0] - bp[:, 0]
    wy = o[:, 1] - bp[:, 1]
    wz = o[:, 2] - bp[:, 2]
    rox, roy, roz = _rot_apply_t(rot, wx, wy, wz)
    rdx, rdy, rdz = _rot_apply_t(rot, d[:, 0], d[:, 1], d[:, 2])
    ro = jnp.stack([rox, roy, roz], axis=-1)            # (R, 3)
    rd = jnp.stack([rdx, rdy, rdz], axis=-1)

    inv_d = _safe_div(jnp.ones_like(rd), rd)
    ta = (bm - ro) * inv_d
    tb = (bx - ro) * inv_d
    t1 = jnp.minimum(ta, tb)
    t2 = jnp.maximum(ta, tb)
    t_near = jnp.max(t1, axis=-1)
    t_far = jnp.min(t2, axis=-1)
    t_b = jnp.where(inside, t_far, t_near)
    p_b = o + t_b[:, None] * d

    # y-before-z face equality pick, exactly as the forward (:699-708)
    boundary = jnp.where(inside[:, None], t2, t1)       # (R, 3)
    ts = t_b[:, None]
    face = jnp.where(ts == boundary[:, 1:2], 1,
                     jnp.where(ts == boundary[:, 2:3], 2, 0))[:, 0]
    one_hot = (face[:, None] == jnp.arange(3)[None, :]).astype(t_b.dtype)
    # one-hot select, not take_along_axis (slow cross-lane gather on TPU)
    rd_face = jnp.sum(one_hot * rd, axis=-1)
    sign = jnp.where(rd_face > 0.0, -1.0, 1.0)
    n_local = one_hot * sign[:, None]
    nx, ny, nz = _rot_apply(rot, n_local[:, 0], n_local[:, 1], n_local[:, 2])
    n_b = jnp.stack([nx, ny, nz], axis=-1)
    return t_b, p_b, n_b


def _plane_recompute(pn, poff, o, d):
    eps = 1.0e-12
    nd = jnp.sum(pn * d, axis=-1)
    no = jnp.sum(pn * o, axis=-1)
    t_p = _safe_div(poff - no, nd)
    p_p = o + t_p[:, None] * d
    pn_len = jnp.sqrt(jnp.maximum(jnp.sum(pn * pn, axis=-1, keepdims=True),
                                  eps))
    n_unit = pn / pn_len
    n_p = jnp.where(nd[:, None] > 0.0, -n_unit, n_unit)
    return t_p, p_p, n_p


def _winner_recompute(c, r, pn, poff, o, d, is_sph, inside, hit_mask,
                      box_params=None, is_box=None):
    """Recompute (t, p, n) of the winning candidate from its own parameters —
    the same math as intersect.py restricted to one object per ray, with the
    forward's discrete decisions (winner id, inside flag, hit mask) frozen.

    c (R,3), r (R,), pn (R,3), poff (R,): winner sphere / plane params.
    box_params: optional (mins, maxs, position, angles), each (R, .) — winner
    box params when the scene has boxes; is_box the per-ray box-winner mask.
    Returns t (R,), p (R,3), n (R,3).
    """
    t, p, n = _sphere_recompute(c, r, o, d, inside)
    t_p, p_p, n_p = _plane_recompute(pn, poff, o, d)

    is_sph_f = is_sph[:, None]
    t = jnp.where(is_sph, t, t_p)
    p = jnp.where(is_sph_f, p, p_p)
    n = jnp.where(is_sph_f, n, n_p)

    if box_params is not None:
        bm, bx, bp, brot = box_params
        t_b, p_b, n_b = _box_recompute(bm, bx, bp, brot, o, d, inside)
        ib = is_box[:, None]
        t = jnp.where(is_box, t_b, t)
        p = jnp.where(ib, p_b, p)
        n = jnp.where(ib, n_b, n)

    hm = hit_mask
    t = jnp.where(hm, t, 0.0)
    p = jnp.where(hm[:, None], p, o)
    n = jnp.where(hm[:, None], n, 0.0)
    return t, p, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def geometry_op(scene: Scene, origins, dirs, engine: str = "xla",
                chunk_size: int = 512, shadow_lights: tuple | None = None):
    """Closest hit + per-light occlusion with the analytic backward.

    shadow_lights: static per-light bools — False skips that light's shadow
    casts (see shading.static_shadow_mask); occlusion is binary so this is
    invisible to the VJP."""
    return _forward(scene, origins, dirs, engine, chunk_size, shadow_lights)


def _geometry_fwd(scene, origins, dirs, engine, chunk_size, shadow_lights):
    hit, occ = _forward(scene, origins, dirs, engine, chunk_size,
                        shadow_lights)
    return (hit, occ), (scene, origins, dirs, hit)


def _geometry_bwd(engine, chunk_size, shadow_lights, res, g):
    scene, origins, dirs, hit = res
    g_hit, _g_occ = g                       # occlusion is binary: zero grad
    gt, gp, gn = g_hit.t, g_hit.p, g_hit.n  # float cotangents

    n_sph = scene.spheres.count
    n_box = scene.boxes.count
    n_pln = scene.planes.count
    r_total = origins.shape[0]
    dtype = origins.dtype

    from openglraytracer_tpu.ops.gathers import gather_rows, scatter_add_rows

    idx = hit.obj_id
    hm = hit.hit
    is_sph = hm & (idx < n_sph) if n_sph else jnp.zeros_like(hm)
    is_box = (hm & (idx >= n_sph) & (idx < n_sph + n_box)) if n_box \
        else jnp.zeros_like(hm)
    # Winner parameter gather (single O(R) one-hot matmuls, ops/gathers.py)
    if n_sph:
        sid = jnp.clip(idx, 0, n_sph - 1)
        sph_table = jnp.concatenate(
            [scene.spheres.center, scene.spheres.radius[:, None]], axis=-1)
        rows = gather_rows(sph_table, sid)
        c = rows[:, :3]
        r = rows[:, 3]
    else:
        sid = jnp.zeros_like(idx)
        c = jnp.zeros_like(origins)
        r = jnp.ones(r_total, dtype)
    if n_box:
        bid = jnp.clip(idx - n_sph, 0, n_box - 1)
        # rotation matrices precomputed per BOX and gathered per ray —
        # identical values to the forward's (same euler_rotation_3x3b on the
        # same (M, 3) angles), so the face-equality replay stays bit-exact
        rot_table, rot_vjp = jax.vjp(
            lambda a: euler_rotation_3x3b(a).reshape(n_box, 9),
            scene.boxes.angles)
        box_table = jnp.concatenate(
            [scene.boxes.mins, scene.boxes.maxs, scene.boxes.position,
             rot_table], axis=-1)                          # (M, 18)
        brows = gather_rows(box_table, bid)
        box_params = (brows[:, 0:3], brows[:, 3:6], brows[:, 6:9],
                      brows[:, 9:18].reshape(-1, 3, 3))
    else:
        bid = jnp.zeros_like(idx)
        box_params = None
    if n_pln:
        pid = jnp.clip(idx - n_sph - n_box, 0, n_pln - 1)
        pn = scene.planes.normal[pid]
        poff = scene.planes.offset[pid]
    else:
        pid = jnp.zeros_like(idx)
        pn = jnp.concatenate(
            [jnp.zeros((r_total, 2), dtype),
             jnp.ones((r_total, 1), dtype)], axis=-1)
        poff = jnp.zeros(r_total, dtype)

    # Mask miss cotangents: forward returned t=INF_T (const), p=origins+0,
    # n=0 for misses; the only live dependence on a miss is p = origins.
    live = hm
    gt = jnp.where(live, gt, 0.0)
    gn = jnp.where(live[:, None], gn, 0.0)
    gp_direct_o = jnp.where(live[:, None], 0.0, gp)   # p == origins on miss
    gp = jnp.where(live[:, None], gp, 0.0)

    if n_box:
        def replay(c_, r_, pn_, poff_, bm_, bx_, bp_, brot_, o_, d_):
            return _winner_recompute(c_, r_, pn_, poff_, o_, d_, is_sph,
                                     hit.inside, hm,
                                     box_params=(bm_, bx_, bp_, brot_),
                                     is_box=is_box)
        _, vjp_fn = jax.vjp(replay, c, r, pn, poff, *box_params,
                            origins, dirs)
        gc, gr, gpn, gpoff, gbm, gbx, gbp, gbrot, go, gd = \
            vjp_fn((gt, gp, gn))
    else:
        _, vjp_fn = jax.vjp(
            lambda c_, r_, pn_, poff_, o_, d_: _winner_recompute(
                c_, r_, pn_, poff_, o_, d_, is_sph, hit.inside, hm),
            c, r, pn, poff, origins, dirs)
        gc, gr, gpn, gpoff, go, gd = vjp_fn((gt, gp, gn))
    go = go + gp_direct_o

    zero_like = functools.partial(jax.tree_util.tree_map,
                                  lambda x: (jnp.zeros_like(x)
                                             if jnp.issubdtype(x.dtype,
                                                               jnp.floating)
                                             else np.zeros(x.shape,
                                                           jax.dtypes.float0)))
    g_scene = zero_like(scene)

    if n_sph:
        sph_mask = is_sph
        gc = jnp.where(sph_mask[:, None], gc, 0.0)
        gr = jnp.where(sph_mask, gr, 0.0)
        g_rows = scatter_add_rows(
            sid, jnp.concatenate([gc, gr[:, None]], axis=-1), n_sph)
        g_scene = g_scene._replace(spheres=g_scene.spheres._replace(
            center=g_rows[:, :3], radius=g_rows[:, 3]))
    if n_box:
        bmask = is_box[:, None]
        g_brow = jnp.concatenate(
            [jnp.where(bmask, g_, 0.0)
             for g_ in (gbm, gbx, gbp, gbrot.reshape(-1, 9))], axis=-1)
        g_rows = scatter_add_rows(bid, g_brow, n_box)       # (M, 18)
        # per-box angle chain: d rot / d angles via the tiny (M,)-sized vjp
        (g_angles,) = rot_vjp(g_rows[:, 9:18])
        g_scene = g_scene._replace(boxes=g_scene.boxes._replace(
            mins=g_rows[:, 0:3], maxs=g_rows[:, 3:6],
            position=g_rows[:, 6:9], angles=g_angles))
    if n_pln:
        pln_mask = hm & (~is_sph) & (~is_box)
        gpn = jnp.where(pln_mask[:, None], gpn, 0.0)
        gpoff = jnp.where(pln_mask, gpoff, 0.0)
        g_rows = scatter_add_rows(
            pid, jnp.concatenate([gpn, gpoff[:, None]], axis=-1), n_pln)
        g_scene = g_scene._replace(planes=g_scene.planes._replace(
            normal=g_rows[:, :3], offset=g_rows[:, 3]))

    return g_scene, go, gd


geometry_op.defvjp(_geometry_fwd, _geometry_bwd)

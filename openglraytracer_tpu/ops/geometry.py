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
    _safe_div,
    closest_hit_sp,
    shadow_occlusion_sp,
)
from openglraytracer_tpu.ops.shading import SHADOW_EPS


def _forward(scene: Scene, origins, dirs, engine: str, chunk_size: int,
             shadow_lights):
    if engine == "pallas":
        from openglraytracer_tpu.ops.pallas_render import pallas_geometry
        geo = pallas_geometry(scene, origins, dirs)
        return geo.hit, geo.occluded
    hit = closest_hit_sp(scene, origins, dirs, chunk_size=chunk_size)
    shadow_org = hit.p + hit.n * SHADOW_EPS
    to_lights = scene.lights.position[None, :, :] - hit.p[:, None, :]
    occ = shadow_occlusion_sp(scene, shadow_org, to_lights,
                              chunk_size=chunk_size,
                              lights_mask=shadow_lights)
    return hit, occ


def _winner_recompute(c, r, pn, poff, o, d, is_sph, inside, hit_mask):
    """Recompute (t, p, n) of the winning candidate from its own parameters —
    the same math as intersect.py restricted to one object per ray, with the
    forward's discrete decisions (winner id, inside flag, hit mask) frozen.

    c (R,3), r (R,), pn (R,3), poff (R,): winner sphere / plane params.
    Returns t (R,), p (R,3), n (R,3).
    """
    eps = 1.0e-12

    # Sphere root, selected by the forward's inside flag
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

    # Plane
    nd = jnp.sum(pn * d, axis=-1)
    no = jnp.sum(pn * o, axis=-1)
    t_p = _safe_div(poff - no, nd)
    p_p = o + t_p[:, None] * d
    pn_len = jnp.sqrt(jnp.maximum(jnp.sum(pn * pn, axis=-1, keepdims=True),
                                  eps))
    n_unit = pn / pn_len
    n_p = jnp.where(nd[:, None] > 0.0, -n_unit, n_unit)

    is_sph_f = is_sph[:, None]
    t = jnp.where(is_sph, t_s, t_p)
    p = jnp.where(is_sph_f, p_s, p_p)
    n = jnp.where(is_sph_f, n_s, n_p)

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
    n_pln = scene.planes.count
    n_box = scene.boxes.count
    if n_box:
        raise NotImplementedError(
            "analytic geometry VJP covers sphere/plane scenes; "
            "use trace_rays (full autodiff) for OBB scenes")

    from openglraytracer_tpu.ops.gathers import gather_rows, scatter_add_rows

    idx = hit.obj_id
    hm = hit.hit
    is_sph = hm & (idx < n_sph) if n_sph else jnp.zeros_like(hm)
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
        r = jnp.ones(origins.shape[0], origins.dtype)
    if n_pln:
        pid = jnp.clip(idx - n_sph, 0, n_pln - 1)
        pn = scene.planes.normal[pid]
        poff = scene.planes.offset[pid]
    else:
        pid = jnp.zeros_like(idx)
        pn = jnp.concatenate(
            [jnp.zeros((origins.shape[0], 2), origins.dtype),
             jnp.ones((origins.shape[0], 1), origins.dtype)], axis=-1)
        poff = jnp.zeros(origins.shape[0], origins.dtype)

    # Mask miss cotangents: forward returned t=INF_T (const), p=origins+0,
    # n=0 for misses; the only live dependence on a miss is p = origins.
    live = hm
    gt = jnp.where(live, gt, 0.0)
    gn = jnp.where(live[:, None], gn, 0.0)
    gp_direct_o = jnp.where(live[:, None], 0.0, gp)   # p == origins on miss
    gp = jnp.where(live[:, None], gp, 0.0)

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
    if n_pln:
        pln_mask = hm & (~is_sph)
        gpn = jnp.where(pln_mask[:, None], gpn, 0.0)
        gpoff = jnp.where(pln_mask, gpoff, 0.0)
        g_rows = scatter_add_rows(
            pid, jnp.concatenate([gpn, gpoff[:, None]], axis=-1), n_pln)
        g_scene = g_scene._replace(planes=g_scene.planes._replace(
            normal=g_rows[:, :3], offset=g_rows[:, 3]))

    return g_scene, go, gd


geometry_op.defvjp(_geometry_fwd, _geometry_bwd)

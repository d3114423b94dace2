"""Fused Mosaic Phong shading kernel (r4).

The XLA shading stage (per-ray material-row routing + the multi-light ADS
chain, reference raytrace_compute.glsl:789-840) measured ~11.7 ms of the c5
frame (scripts/profile_culled.py) — mostly HBM traffic on (R, 4) per-light
intermediates that XLA materializes between fusions. This kernel streams
each ray tile once: material row, hit normal/point, ray dir and per-light
occlusion bits enter VMEM, the full ambient+diffuse+specular chain runs
in-register, and only the final RGB leaves.

Forward-only kernel with a custom VJP: the backward replays
``shading.phong_core`` (the single source of the lighting math) under
``jax.vjp``, so gradients are the XLA path's gradients exactly — the kernel
can never silently change the fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglraytracer_tpu.ops.intersect import _SQRT_EPS
from openglraytracer_tpu.ops.shading import _POW_EPS, phong_core

LANE = 128


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shade_kernel(n_lights: int, lg_ref, mat_ref,
                  dx_ref, dy_ref, dz_ref, px_ref, py_ref, pz_ref,
                  nx_ref, ny_ref, nz_ref, occ_ref,
                  r_ref, g_ref, b_ref):
    # mat_ref (1, 20, BR, LANE): material_table columns per ray
    # lg_ref (L, 16) [pos(3) pad amb(4) diff(4) spec(4)]
    # occ_ref (1, L, BR, LANE): 1.0 = occluded
    dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
    px, py, pz = px_ref[0], py_ref[0], pz_ref[0]
    nx, ny, nz = nx_ref[0], ny_ref[0], nz_ref[0]
    f32 = dx.dtype

    # view = normalize(-d) (:827); _safe_normalize semantics
    inv_d = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz,
                                      _SQRT_EPS))
    vx, vy, vz = -dx * inv_d, -dy * inv_d, -dz * inv_d

    amb = [jnp.zeros_like(dx) for _ in range(4)]
    dif = [jnp.zeros_like(dx) for _ in range(4)]
    spe = [jnp.zeros_like(dx) for _ in range(4)]
    m_amb = [mat_ref[0, c] for c in range(4)]
    m_dif = [mat_ref[0, 4 + c] for c in range(4)]
    m_spe = [mat_ref[0, 8 + c] for c in range(4)]
    m_emi = [mat_ref[0, 12 + c] for c in range(4)]
    m_shin = mat_ref[0, 16]

    for j in range(n_lights):
        for c in range(4):
            amb[c] = amb[c] + lg_ref[j, 4 + c] * m_amb[c]

        tlx = lg_ref[j, 0] - px
        tly = lg_ref[j, 1] - py
        tlz = lg_ref[j, 2] - pz
        inv_tl = jax.lax.rsqrt(jnp.maximum(
            tlx * tlx + tly * tly + tlz * tlz, _SQRT_EPS))
        ldx, ldy, ldz = tlx * inv_tl, tly * inv_tl, tlz * inv_tl
        lit = 1.0 - occ_ref[0, j]

        # reflect(-ld, n) then _safe_normalize
        dn = -(ldx * nx + ldy * ny + ldz * nz)
        rx = -ldx - 2.0 * dn * nx
        ry = -ldy - 2.0 * dn * ny
        rz = -ldz - 2.0 * dn * nz
        inv_r = jax.lax.rsqrt(jnp.maximum(rx * rx + ry * ry + rz * rz,
                                          _SQRT_EPS))
        rx, ry, rz = rx * inv_r, ry * inv_r, rz * inv_r

        cos_theta = jnp.maximum(ldx * nx + ldy * ny + ldz * nz, 0.0)
        cos_phi = vx * rx + vy * ry + vz * rz
        # _safe_pow: pow(max(base, eps), e) gated at base <= 0
        safe_base = jnp.maximum(cos_phi, _POW_EPS)
        powv = jnp.where(cos_phi > 0.0,
                         jnp.exp(m_shin * jnp.log(safe_base)), 0.0)

        lit_ct = lit * cos_theta
        lit_pw = lit * powv
        for c in range(4):
            dif[c] = dif[c] + lg_ref[j, 8 + c] * m_dif[c] * lit_ct
            spe[c] = spe[c] + lg_ref[j, 12 + c] * m_spe[c] * lit_pw

    ph = [amb[c] + dif[c] + spe[c] + m_emi[c] for c in range(4)]
    r_ref[0] = ph[0] * ph[3]
    g_ref[0] = ph[1] * ph[3]
    b_ref[0] = ph[2] * ph[3]


def _shade_pallas(mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n, occ_f,
                  tile_p: int):
    r_total = dirs.shape[0]
    t_tiles = r_total // tile_p
    br = tile_p // LANE
    dtype = dirs.dtype
    n_lights = lpos.shape[0]

    lg = jnp.zeros((n_lights, 16), dtype)
    lg = lg.at[:, 0:3].set(lpos)
    lg = lg.at[:, 4:8].set(lamb)
    lg = lg.at[:, 8:12].set(ldiff)
    lg = lg.at[:, 12:16].set(lspec)

    mat_b = mat_rows.reshape(t_tiles, br, LANE, 20).transpose(0, 3, 1, 2)
    occ_b = occ_f.reshape(t_tiles, br, LANE, n_lights).transpose(0, 3, 1, 2)

    def blocks(x):
        c = x.reshape(t_tiles, br, LANE, 3)
        return c[..., 0], c[..., 1], c[..., 2]

    dx, dy, dz = blocks(dirs)
    px, py, pz = blocks(p)
    nx, ny, nz = blocks(n)

    ray_spec = pl.BlockSpec((1, br, LANE), lambda t: (t, 0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((1, 20, br, LANE), lambda t: (t, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    occ_spec = pl.BlockSpec((1, n_lights, br, LANE), lambda t: (t, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rblk = jax.ShapeDtypeStruct((t_tiles, br, LANE), dtype)

    r, g, b = pl.pallas_call(
        functools.partial(_shade_kernel, n_lights),
        grid=(t_tiles,),
        in_specs=[full, mat_spec] + [ray_spec] * 9 + [occ_spec],
        out_specs=[ray_spec] * 3,
        out_shape=[rblk] * 3,
        interpret=_use_interpret(),
    )(lg, mat_b, dx, dy, dz, px, py, pz, nx, ny, nz, occ_b)
    return jnp.stack([r.reshape(-1), g.reshape(-1), b.reshape(-1)], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def phong_fused(mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n, occ_f,
                tile_p: int):
    """Fused Phong shade: forward = Mosaic kernel, backward = jax.vjp of
    shading.phong_core (gradient-identical to the XLA path by construction).
    occ_f: (R, L) float (1.0 = occluded) — gradients do not flow into it
    (occlusion is binary, as in the XLA path)."""
    return _shade_pallas(mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n,
                         occ_f, tile_p)


def _phong_xla(mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n, occ_f):
    return phong_core(mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n,
                      occ_f > 0.5)


def _pf_fwd(mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n, occ_f, tile_p):
    out = _shade_pallas(mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n,
                        occ_f, tile_p)
    return out, (mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n, occ_f)


def _pf_bwd(tile_p, res, g):
    mat_rows, lpos, lamb, ldiff, lspec, dirs, p, n, occ_f = res
    _, vjp = jax.vjp(_phong_xla, mat_rows, lpos, lamb, ldiff, lspec,
                     dirs, p, n, occ_f)
    grads = vjp(g)
    return grads


phong_fused.defvjp(_pf_fwd, _pf_bwd)


def shade_fused(scene, dirs, hit, occluded, mat_rows, tile_p: int):
    """Drop-in for shading.phong_shade_lit on the culled_pallas path:
    requires mat_rows (R, 20) and tile-major rays with tile_p % 128 == 0."""
    lights = scene.lights
    occ_f = occluded.astype(dirs.dtype)
    return phong_fused(mat_rows, lights.position, lights.ambient,
                       lights.diffuse, lights.specular, dirs, hit.p, hit.n,
                       occ_f, tile_p)

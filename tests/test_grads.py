"""Gradient correctness: autodiff through the renderer vs central finite
differences in float64 (BASELINE.json north star: pixel gradients w.r.t.
sphere centers/radii, plane params, material colors, and lights allclose).

Visibility discontinuities make raytracer gradients 'local' (RayTracer.jl
semantics): FD probes are taken at eps small enough that silhouette pixel
flips are improbable; tolerances allow for residual flip noise.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openglraytracer_tpu.models import builders
from openglraytracer_tpu.ops.render import trace_rays
from openglraytracer_tpu.ops.raygen import generate_rays

H = W = 24


def _loss_fn(scene, cam, depth=0):
    # weighted pixel sum -> scalar, smooth away from silhouettes
    o, d = generate_rays(cam, H, W)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    w = jnp.linspace(0.3, 1.7, H * W * 3).reshape(H * W, 3)

    def loss(s):
        img = trace_rays(s, o, d, depth=depth)
        return jnp.sum(img * w)

    return loss


def _fd_check(loss, scene, get, put, eps=1e-5, rtol=2e-2, atol=1e-6):
    """Central-difference check of d loss / d scalar for one scene leaf."""
    g_auto = get(jax.grad(loss, allow_int=True)(scene))
    x0 = float(get(scene))
    lp = loss(put(scene, x0 + eps))
    lm = loss(put(scene, x0 - eps))
    g_fd = (float(lp) - float(lm)) / (2 * eps)
    assert np.isfinite(g_auto) and np.isfinite(g_fd)
    np.testing.assert_allclose(g_auto, g_fd, rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def f64_scene():
    with jax.enable_x64(True):
        scene, cam = builders.eight_sphere_scene(dtype=jnp.float64)
        yield scene, cam


def _run_param_checks(scene, cam, depth, params):
    loss = _loss_fn(scene, cam, depth=depth)
    for name, get, put in params:
        _fd_check(loss, scene, get, put)


@pytest.mark.smoke
def test_grads_sphere_params(f64_scene):
    with jax.enable_x64(True):
        scene, cam = f64_scene
        params = [
            ("center_x", lambda s: s.spheres.center[2, 0],
             lambda s, v: s._replace(spheres=s.spheres._replace(
                 center=s.spheres.center.at[2, 0].set(v)))),
            ("center_z", lambda s: s.spheres.center[5, 2],
             lambda s, v: s._replace(spheres=s.spheres._replace(
                 center=s.spheres.center.at[5, 2].set(v)))),
            ("radius", lambda s: s.spheres.radius[1],
             lambda s, v: s._replace(spheres=s.spheres._replace(
                 radius=s.spheres.radius.at[1].set(v)))),
        ]
        _run_param_checks(scene, cam, 0, params)


def test_grads_plane_and_lights(f64_scene):
    with jax.enable_x64(True):
        scene, cam = f64_scene
        params = [
            ("plane_offset", lambda s: s.planes.offset[0],
             lambda s, v: s._replace(planes=s.planes._replace(
                 offset=s.planes.offset.at[0].set(v)))),
            ("plane_normal_x", lambda s: s.planes.normal[0, 0],
             lambda s, v: s._replace(planes=s.planes._replace(
                 normal=s.planes.normal.at[0, 0].set(v)))),
            ("light_pos", lambda s: s.lights.position[0, 2],
             lambda s, v: s._replace(lights=s.lights._replace(
                 position=s.lights.position.at[0, 2].set(v)))),
            ("light_diffuse", lambda s: s.lights.diffuse[1, 0],
             lambda s, v: s._replace(lights=s.lights._replace(
                 diffuse=s.lights.diffuse.at[1, 0].set(v)))),
        ]
        _run_param_checks(scene, cam, 0, params)


def test_grads_materials(f64_scene):
    with jax.enable_x64(True):
        scene, cam = f64_scene
        params = [
            ("diffuse", lambda s: s.materials.diffuse[3, 1],
             lambda s, v: s._replace(materials=s.materials._replace(
                 diffuse=s.materials.diffuse.at[3, 1].set(v)))),
            ("specular", lambda s: s.materials.specular[0, 0],
             lambda s, v: s._replace(materials=s.materials._replace(
                 specular=s.materials.specular.at[0, 0].set(v)))),
            ("shininess", lambda s: s.materials.shininess[0],
             lambda s, v: s._replace(materials=s.materials._replace(
                 shininess=s.materials.shininess.at[0].set(v)))),
            ("ambient", lambda s: s.materials.ambient[2, 2],
             lambda s, v: s._replace(materials=s.materials._replace(
                 ambient=s.materials.ambient.at[2, 2].set(v)))),
        ]
        _run_param_checks(scene, cam, 0, params)


def test_grads_through_bounces():
    """Gradient flows through the reflection tree (depth=1 mirror scene)."""
    with jax.enable_x64(True):
        scene, cam = builders.mirror_scene(dtype=jnp.float64)
        loss = _loss_fn(scene, cam, depth=1)
        params = [
            ("reflectivity", lambda s: s.materials.reflectivity[4],
             lambda s, v: s._replace(materials=s.materials._replace(
                 reflectivity=s.materials.reflectivity.at[4].set(v)))),
            ("center_refl", lambda s: s.spheres.center[10, 0],
             lambda s, v: s._replace(spheres=s.spheres._replace(
                 center=s.spheres.center.at[10, 0].set(v)))),
        ]
        for name, get, put in params:
            _fd_check(loss, scene, get, put)


def test_grads_no_nan_f32():
    """Full-scene f32 gradients (incl. OBBs and refraction tree) are finite."""
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(1.1)
    loss = _loss_fn(scene, cam, depth=2)
    g = jax.grad(loss, allow_int=True)(scene)
    for leaf in jax.tree_util.tree_leaves(g):
        if np.issubdtype(np.asarray(leaf).dtype, np.floating):
            assert np.isfinite(np.asarray(leaf)).all()


def test_grads_remat_matches():
    """jax.checkpoint'ed chunks produce identical gradients."""
    scene, cam = builders.eight_sphere_scene()
    o, d = generate_rays(cam, 16, 16)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    def loss(s, remat):
        return jnp.sum(trace_rays(s, o, d, chunk_size=3, remat=remat))

    g0 = jax.grad(lambda s: loss(s, False), allow_int=True)(scene)
    g1 = jax.grad(lambda s: loss(s, True), allow_int=True)(scene)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, atol=1e-6)

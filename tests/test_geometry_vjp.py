"""The analytic O(rays) geometry VJP must produce the same gradients as full
autodiff through the chunked object scan (trace_rays), including through
bounce recursion and for every parameter family."""

import numpy as np
import jax
import jax.numpy as jnp

from openglraytracer_tpu.models.builders import (
    eight_sphere_scene,
    mirror_scene,
    single_sphere_scene,
)
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.render import trace_rays, trace_rays_fast


def _grads(trace_fn, scene, cam, h=24, w=24, depth=0):
    o, d = generate_rays(cam, h, w)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    weights = jnp.linspace(0.2, 1.3, h * w * 3).reshape(h * w, 3)

    def loss(s):
        return jnp.sum(trace_fn(s, o, d, depth) * weights)

    return jax.grad(loss, allow_int=True)(scene)


def _assert_tree_close(g1, g2, atol=5e-5, rtol=1e-4):
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, atol=atol, rtol=rtol)


def test_analytic_vjp_matches_autodiff_depth0():
    scene, cam = eight_sphere_scene()
    g_auto = _grads(trace_rays, scene, cam)
    g_fast = _grads(trace_rays_fast, scene, cam)
    _assert_tree_close(g_auto, g_fast)


def test_analytic_vjp_matches_autodiff_single_sphere():
    scene, cam = single_sphere_scene()
    g_auto = _grads(trace_rays, scene, cam)
    g_fast = _grads(trace_rays_fast, scene, cam)
    _assert_tree_close(g_auto, g_fast)


def test_analytic_vjp_matches_autodiff_bounces():
    scene, cam = mirror_scene()
    g_auto = _grads(trace_rays, scene, cam, depth=1)
    g_fast = _grads(trace_rays_fast, scene, cam, depth=1)
    _assert_tree_close(g_auto, g_fast, atol=1e-4)


def test_analytic_vjp_matches_autodiff_obb_scene():
    """The reference's own animated demo world (4 OBBs + 1 sphere, incl. the
    wall cube the camera sits INSIDE) must get the same gradients from the
    analytic winner-replay VJP as from full autodiff — boxes included
    (VERDICT r1 #1)."""
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(0.7)
    g_auto = _grads(trace_rays, scene, cam)
    g_fast = _grads(trace_rays_fast, scene, cam)
    _assert_tree_close(g_auto, g_fast, atol=2e-4)
    # box gradients are real, not accidental zeros
    assert np.abs(np.asarray(g_fast.boxes.position)).max() > 0
    assert np.abs(np.asarray(g_fast.boxes.angles)).max() > 0
    assert np.abs(np.asarray(g_fast.boxes.mins)).max() > 0


def test_obb_forward_identical():
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(1.3)
    o, d = generate_rays(cam, 32, 32)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    a = np.asarray(trace_rays(scene, o, d))
    b = np.asarray(trace_rays_fast(scene, o, d))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_analytic_vjp_matches_autodiff_obb_bounces():
    """Depth-1 bounces through the glass/mirror OBB scene: reflection AND
    refraction children (inside-flag IOR flip) with the analytic VJP."""
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(0.2)
    g_auto = _grads(trace_rays, scene, cam, h=16, w=16, depth=1)
    g_fast = _grads(trace_rays_fast, scene, cam, h=16, w=16, depth=1)
    _assert_tree_close(g_auto, g_fast, atol=5e-4)


def test_forward_identical():
    scene, cam = eight_sphere_scene()
    o, d = generate_rays(cam, 32, 32)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)
    a = np.asarray(trace_rays(scene, o, d))
    b = np.asarray(trace_rays_fast(scene, o, d))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_ray_cotangents_match():
    """d loss / d (origins, dirs) must also match (bounce chain correctness)."""
    scene, cam = eight_sphere_scene()
    o, d = generate_rays(cam, 16, 16)
    o, d = o.reshape(-1, 3), d.reshape(-1, 3)

    def loss(fn, o, d):
        return jnp.sum(fn(scene, o, d, 0))

    go_a, gd_a = jax.grad(lambda o, d: loss(trace_rays, o, d),
                          argnums=(0, 1))(o, d)
    go_f, gd_f = jax.grad(lambda o, d: loss(trace_rays_fast, o, d),
                          argnums=(0, 1))(o, d)
    # f32 roundoff between two algebraically equal formulations
    np.testing.assert_allclose(np.asarray(go_a), np.asarray(go_f), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gd_a), np.asarray(gd_f), atol=1e-3)

"""Fused Mosaic shade kernel (ops/pallas_shade.py): forward must match
shading.phong_core to fp tolerance; gradients must be IDENTICAL to the XLA
path (the VJP replays phong_core, so this checks the custom_vjp plumbing)."""

import jax
import jax.numpy as jnp
import numpy as np

from openglraytracer_tpu.models.builders import sphere_grid_scene
from openglraytracer_tpu.ops.accel import (suggest_cull_config, tile_image,
                                           parse_cull_spec)
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.render import render, trace_rays_fast
from openglraytracer_tpu.train.inverse import apply_params, extract_params

TILE = (16, 16)
H = W = 64


def test_fused_shade_image_matches_culled():
    scene, cam = sphere_grid_scene(8)
    spec = suggest_cull_config(scene, cam, H, W, TILE)
    a = render(scene, cam, H, W, engine="culled", cull=spec)
    b = render(scene, cam, H, W, engine="culled_pallas", cull=spec)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_fused_shade_obb_scene():
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(1.2)
    spec = suggest_cull_config(scene, cam, H, W, TILE)
    a = render(scene, cam, H, W, engine="culled", cull=spec)
    b = render(scene, cam, H, W, engine="culled_pallas", cull=spec)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_fused_shade_gradients_match():
    """Materials + lights gradients through the fused path: the kernel's VJP
    replays phong_core, so grads must equal the culled engine's within the
    geometry fp noise."""
    scene, cam = sphere_grid_scene(4)
    from openglraytracer_tpu.ops.accel import suggest_cull_sizes
    kp, ks = suggest_cull_sizes(scene, cam, H, W, TILE)
    origins, dirs = generate_rays(cam, H, W)
    o = tile_image(origins, *TILE).reshape(-1, 3)
    d = tile_image(dirs, *TILE).reshape(-1, 3)
    target = jnp.zeros((H * W, 3), jnp.float32)
    trainable = ("spheres.center", "materials.diffuse", "materials.specular",
                 "lights.position", "lights.diffuse")
    params = extract_params(scene, trainable)
    cull = (TILE[0] * TILE[1], kp, ks)

    def loss(params, engine):
        s = apply_params(scene, params)
        img = trace_rays_fast(s, o, d, 0, engine=engine, cull=cull)
        return jnp.mean(jnp.square(img - target))

    g_c = jax.grad(loss)(params, "culled")
    g_p = jax.grad(loss)(params, "culled_pallas")
    for k in params:
        a, b = np.asarray(g_c[k]), np.asarray(g_p[k])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=3e-4 * scale,
                                   err_msg=f"grad mismatch for {k}")

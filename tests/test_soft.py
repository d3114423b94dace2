"""Soft-coverage forward (ops/soft.py): the silhouette-aware fit path.

Covers the four claims the module makes:
  1. hard limit — tiny (bw, gamma) converges to the exact shadowless
     nearest-hit render;
  2. smoothness — the soft loss agrees with finite differences THROUGH a
     silhouette displacement (the thing straight-through gradients cannot
     do), via jax.test_util.check_grads;
  3. culled == dense under the expanded-radius broad phase;
  4. overflow is counted, never silent;
plus the integration claim: a FitConfig(soft=...) curriculum recovers a
displaced sphere center that the hard fit provably stalls on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglraytracer_tpu.models.builders import (single_sphere_scene,
                                                 sphere_grid_scene)
from openglraytracer_tpu.ops.intersect import closest_hit
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.shading import phong_shade_lit
from openglraytracer_tpu.ops.soft import (expand_factor, soft_render,
                                          soft_render_rays,
                                          suggest_soft_cull)


def _hard_shadowless(scene, cam, h, w):
    """Exact nearest-hit + Phong with all shadow masks off: the hard limit
    of the (shadowless) soft forward."""
    o, d = generate_rays(cam, h, w)
    o = o.reshape(-1, 3)
    d = d.reshape(-1, 3)
    hit = closest_hit(scene, o, d)
    occ = jnp.zeros((o.shape[0], scene.lights.count), bool)
    col = phong_shade_lit(scene, d, hit, occ)
    col = jnp.where(hit.hit[:, None], col, 0.0)
    return col.reshape(h, w, 3)


def test_hard_limit_matches_shadowless_render():
    scene, cam = single_sphere_scene()
    want = np.asarray(_hard_shadowless(scene, cam, 48, 48))
    got = np.asarray(soft_render(scene, cam, 48, 48, bw=1e-5, gamma=1e-3))
    # only silhouette-adjacent pixels can differ at tiny bw
    err = np.abs(got - want).max(-1)
    assert (err < 1e-3).mean() > 0.995, f"max {err.max()}"


def test_sharp_grid_matches_shadowless_render():
    scene, cam = sphere_grid_scene(4)
    want = np.asarray(_hard_shadowless(scene, cam, 64, 64))
    got = np.asarray(soft_render(scene, cam, 64, 64, bw=1e-5, gamma=1e-3))
    err = np.abs(got - want).max(-1)
    # residual softness only on silhouette-adjacent pixels, and small
    assert (err < 1e-3).mean() > 0.98, f"frac {(err < 1e-3).mean()}"
    assert err.max() < 5e-3, f"max {err.max()}"


def test_soft_loss_matches_finite_differences():
    """The whole point: d(loss)/d(center) is a true derivative of the soft
    objective, including coverage change — so FD must agree (it cannot for
    the hard renderer, whose visibility derivative is zero a.e.)."""
    scene, cam = single_sphere_scene()
    target = soft_render(scene, cam, 32, 32, bw=0.05, gamma=0.2)

    def loss(center):
        s = scene._replace(spheres=scene.spheres._replace(center=center))
        img = soft_render(s, cam, 32, 32, bw=0.05, gamma=0.2)
        return jnp.mean(jnp.square(img - target))

    with jax.enable_x64(True):
        from jax._src.test_util import check_grads
        c64 = scene.spheres.center.astype(jnp.float64) + 0.11
        check_grads(loss, (c64,), order=1, modes=["rev"],
                    atol=1e-3, rtol=1e-3)


def test_silhouette_gradient_points_home():
    """A sphere displaced past its own silhouette: the soft loss gradient
    w.r.t. the x-center must point back toward the target position."""
    scene, cam = single_sphere_scene()
    target = soft_render(scene, cam, 48, 48, bw=0.05, gamma=0.2)
    shifted = scene._replace(spheres=scene.spheres._replace(
        center=scene.spheres.center + jnp.asarray([0.6, 0.0, 0.0])))

    def loss(s):
        return jnp.mean(jnp.square(
            soft_render(s, cam, 48, 48, bw=0.05, gamma=0.2) - target))

    g = jax.grad(lambda c: loss(shifted._replace(
        spheres=shifted.spheres._replace(center=c))))(shifted.spheres.center)
    assert float(g[0, 0]) > 0.0, "gradient must push the center back (-x)"


@pytest.mark.parametrize("k_full", [True, False])
def test_culled_matches_dense(k_full):
    scene, cam = sphere_grid_scene(4)
    h = w = 64
    tile = (16, 16)
    if k_full:
        cull = (tile, int(scene.spheres.count))
    else:
        cull = suggest_soft_cull(scene, cam, h, w, tile, bw=0.03)
    dense = np.asarray(soft_render(scene, cam, h, w, bw=0.03, gamma=0.15))
    culled, ovf = soft_render(scene, cam, h, w, bw=0.03, gamma=0.15,
                              cull=cull, with_cull_stats=True)
    assert int(ovf) == 0
    # culling drops only spheres with alpha below the sigmoid reach (~3e-4)
    np.testing.assert_allclose(np.asarray(culled), dense, atol=2e-3)


def test_overflow_counted_never_silent():
    scene, cam = sphere_grid_scene(4)
    _, ovf = soft_render(scene, cam, 64, 64, bw=0.03, gamma=0.15,
                         cull=((16, 16), 2), with_cull_stats=True)
    assert int(ovf) > 0


def test_expand_factor_covers_sigmoid_reach():
    # at the expanded radius the coverage logit is exactly -_LOGIT_REACH
    bw = 0.04
    f = expand_factor(bw)
    logit = (1.0 - f * f) / bw
    assert abs(logit + 8.0) < 1e-6


def test_boxes_rejected():
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(1.0)
    o, d = generate_rays(cam, 8, 8)
    with pytest.raises(ValueError, match="spheres\\+planes"):
        soft_render_rays(scene, o.reshape(-1, 3), d.reshape(-1, 3),
                         bw=0.05, gamma=0.2)


@pytest.mark.smoke
def test_soft_fit_recovers_displaced_center():
    """Integration: an annealed soft curriculum recovers a displacement the
    hard engine's straight-through gradient stalls on (VERDICT r4 next #2,
    the c5 geometry floor, at test scale)."""
    from openglraytracer_tpu.train.inverse import FitConfig, fit
    scene_true, cam = single_sphere_scene()
    h = w = 48
    shift = jnp.asarray([[0.45, 0.0, 0.25]])
    scene_init = scene_true._replace(spheres=scene_true.spheres._replace(
        center=scene_true.spheres.center + shift))
    err0 = float(jnp.linalg.norm(shift))

    scene_fit = scene_init
    for bw, gamma, steps, lr in ((0.08, 0.4, 60, 3e-2),
                                 (0.02, 0.1, 60, 1e-2)):
        target = soft_render(scene_true, cam, h, w, bw=bw, gamma=gamma)
        cfg = FitConfig(height=h, width=w, steps=steps, learning_rate=lr,
                        trainable=("spheres.center",), soft=(bw, gamma),
                        log_every=1000)
        scene_fit, _ = fit(scene_fit, target, cam, cfg)

    err1 = float(jnp.linalg.norm(
        scene_fit.spheres.center - scene_true.spheres.center))
    assert err1 < 0.25 * err0, f"soft fit: {err0:.3f} -> {err1:.3f}"


def test_soft_fit_rejects_mesh():
    from openglraytracer_tpu.parallel.mesh import make_mesh
    from openglraytracer_tpu.train.inverse import FitConfig, make_train_step
    scene, cam = single_sphere_scene()
    cfg = FitConfig(height=16, width=16, soft=(0.05, 0.2))
    with pytest.raises(ValueError, match="unsharded"):
        make_train_step(cam, cfg, mesh=make_mesh())

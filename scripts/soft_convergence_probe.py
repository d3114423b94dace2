"""CPU probe: does the soft forward's silhouette gradient actually recover
SUB-PIXEL center displacements, and at what (bw, gamma, lr, steps)?

The c5 geometry regime (VERDICT r4 next #2): displacement ~0.17 world units
is ~1 px at 2048^2 and ~0.25 px at 512^2 — the hard engines' straight-
through gradient sees nothing there. This probe reproduces that regime at
test scale (side-8 grid at 256^2 ~ same px/displacement ratio as c5 at
2048^2) and prints center error per stage so curriculum constants can be
chosen on CPU before burning chip time. Run:
    JAX_PLATFORMS=cpu python scripts/soft_convergence_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openglraytracer_tpu.models.builders import sphere_grid_scene
from openglraytracer_tpu.ops.soft import soft_render, suggest_soft_cull
from openglraytracer_tpu.train.inverse import FitConfig, fit

TRAINABLE = ("spheres.center", "spheres.radius", "materials.diffuse")


def orbit_camera(cam, phi_deg: float):
    """Camera orbited phi degrees about the world z axis through the
    origin (Z-up world, yaw about Z — transforms.py conventions)."""
    import math
    phi = math.radians(phi_deg)
    x, y, z = (float(cam.position[0]), float(cam.position[1]),
               float(cam.position[2]))
    pos = (x * math.cos(phi) - y * math.sin(phi),
           x * math.sin(phi) + y * math.cos(phi), z)
    ang = (float(cam.angles[0]), float(cam.angles[1]) + phi_deg,
           float(cam.angles[2]))
    return cam._replace(position=jnp.asarray(pos, cam.position.dtype),
                        angles=jnp.asarray(ang, cam.angles.dtype))


def center_err(a, b):
    return float(jnp.mean(jnp.linalg.norm(
        a.spheres.center - b.spheres.center, axis=-1)))


def make_optimizer(steps, geo_lr, photo_lr):
    return optax.multi_transform(
        {"geo": optax.adam(optax.cosine_decay_schedule(geo_lr, steps)),
         "photo": optax.adam(optax.cosine_decay_schedule(photo_lr, steps))},
        {"spheres.center": "geo", "spheres.radius": "geo",
         "materials.diffuse": "photo"})


def main():
    scene_true, cam = sphere_grid_scene(8, seed=1)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    scene_fit = scene_true._replace(
        spheres=scene_true.spheres._replace(
            center=scene_true.spheres.center
            + 0.1 * jax.random.normal(k1, scene_true.spheres.center.shape),
            radius=jnp.clip(scene_true.spheres.radius + 0.05
                            * jax.random.normal(k2,
                                                scene_true.spheres.radius.shape),
                            0.1, None)),
        materials=scene_true.materials._replace(
            diffuse=jnp.clip(scene_true.materials.diffuse + 0.3
                             * jax.random.normal(k3,
                                                 scene_true.materials.diffuse.shape),
                             0.0, 1.0)))
    print(json.dumps({"err0": center_err(scene_fit, scene_true)}))

    views = json.loads(os.environ.get("PROBE_VIEWS", "[0, 45, -45]"))
    cams = tuple(orbit_camera(cam, v) for v in views)
    stages = json.loads(os.environ.get("PROBE_STAGES", "null")) or [
        [256, 300, 0.30, 0.30, 1.2e-2, 3.0e-2],
        [256, 300, 0.08, 0.10, 4.0e-3, 1.0e-2],
        [256, 300, 0.02, 0.03, 1.5e-3, 5.0e-3],
    ]
    for res, steps, bw, gamma, geo_lr, photo_lr in stages:
        t0 = time.time()
        culls = tuple(suggest_soft_cull(scene_true, c, res, res, (16, 16),
                                        bw, headroom=2.0) for c in cams)
        target = jnp.stack([
            soft_render(scene_true, c, res, res, bw=bw, gamma=gamma, cull=cu)
            for c, cu in zip(cams, culls)])
        cfg = FitConfig(height=res, width=res, steps=steps,
                        trainable=TRAINABLE, soft=(bw, gamma), cull=culls,
                        log_every=1000)
        scene_fit, losses = fit(scene_fit, target, cams, cfg,
                                optimizer=make_optimizer(steps, geo_lr,
                                                         photo_lr))
        err_axes = jnp.sqrt(jnp.mean(jnp.square(
            scene_fit.spheres.center - scene_true.spheres.center), axis=0))
        print(json.dumps({
            "res": res, "steps": steps, "bw": bw, "gamma": gamma,
            "views": views,
            "loss_first": losses[0][1], "loss_last": losses[-1][1],
            "center_err": round(center_err(scene_fit, scene_true), 5),
            "rms_err_xyz": [round(float(e), 5) for e in err_axes],
            "seconds": round(time.time() - t0, 1)}), flush=True)


if __name__ == "__main__":
    main()

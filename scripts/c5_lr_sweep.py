"""Quick LR sweep for the config-5 fit: the constant-LR Adam that works at
48^2/64-sphere scale (tests/test_train.py) oscillates at 2048^2/4096 —
find the schedule that actually converges before committing the acceptance
run. Results print one JSON line per trial."""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openglraytracer_tpu.models.builders import sphere_grid_scene
from openglraytracer_tpu.ops.accel import suggest_cull_config
from openglraytracer_tpu.ops.render import render
from openglraytracer_tpu.train.inverse import FitConfig, fit

H = W = 2048
STEPS = 250

scene_true, cam = sphere_grid_scene(64, seed=1)
cull = suggest_cull_config(scene_true, cam, H, W, (32, 32), headroom=2.0)
target = render(scene_true, cam, H, W, engine="culled", cull=cull)
target.block_until_ready()

key = jax.random.PRNGKey(0)
k1, k2 = jax.random.split(key)
scene_init = scene_true._replace(
    spheres=scene_true.spheres._replace(
        center=scene_true.spheres.center
        + 0.3 * jax.random.normal(k1, scene_true.spheres.center.shape),
        radius=jnp.clip(
            scene_true.spheres.radius
            + 0.1 * jax.random.normal(k2, scene_true.spheres.radius.shape),
            0.1, None)))

TRIALS = {
    "adam_3e-3": optax.adam(3e-3),
    "adam_1e-2_cos": optax.adam(
        optax.cosine_decay_schedule(1e-2, STEPS, alpha=0.02)),
    "adam_2e-2_cos": optax.adam(
        optax.cosine_decay_schedule(2e-2, STEPS, alpha=0.01)),
}

for name, opt in TRIALS.items():
    cfg = FitConfig(height=H, width=W, steps=STEPS, learning_rate=1e-2,
                    trainable=("spheres.center", "spheres.radius"),
                    engine="culled", cull=cull, log_every=25)
    t0 = time.time()
    fitted, losses = fit(scene_init, target, cam, cfg, optimizer=opt)
    err = float(jnp.mean(jnp.linalg.norm(
        fitted.spheres.center - scene_true.spheres.center, axis=-1)))
    print(json.dumps({
        "trial": name, "initial_loss": losses[0][1],
        "final_loss": losses[-1][1],
        "drop_x": round(losses[0][1] / max(losses[-1][1], 1e-30), 1),
        "center_err": round(err, 4), "sec": round(time.time() - t0, 1),
        "curve": [(s, round(l, 6)) for s, l in losses],
    }), flush=True)

"""Benchmark: the north-star metric (BASELINE.json) on real hardware.

Measures Mrays/s/chip for forward+backward at 1024x1024 on the 64-sphere grid
scene (config 3): one value_and_grad of a pixel MSE w.r.t. all trainable scene
parameters per frame, using the analytic O(rays) geometry VJP.

Timing is PIPELINED: k steps are dispatched back-to-back and synchronized
once, like a real training loop — JAX's async dispatch overlaps host->device
latency with device compute, so per-call sync timing would measure the RPC
round trip, not the renderer.

Ray accounting matches BASELINE.md's derivation for the reference (primary +
per-light shadow casts): (1 + n_lights) * H * W rays per forward pass; the
backward is included in the time but not double-counted as rays. vs_baseline
is against the reference's only derivable number, ~55 Mrays/s (forward-only,
vsync-capped 60 FPS at 1280x720 with 3 lights).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    from openglraytracer_tpu.models.builders import sphere_grid_scene
    from openglraytracer_tpu.train.inverse import (
        DEFAULT_TRAINABLE, apply_params, extract_params)
    from openglraytracer_tpu.ops.accel import suggest_cull_config, tile_image
    from openglraytracer_tpu.ops.raygen import generate_rays
    from openglraytracer_tpu.ops.render import trace_rays_fast
    from openglraytracer_tpu.ops.shading import static_shadow_mask

    height = width = 1024
    depth = 0
    scene, cam = sphere_grid_scene(8)
    n_lights = scene.lights.count

    # Tile-cone culled engine (ops/accel.py): conservative K sizing with
    # headroom for the moving scene; shadow casts skipped for ambient-only
    # lights (output-identical).
    tile = (64, 64)
    shadow_mask = static_shadow_mask(scene)
    _, kp, ks, hot_m = suggest_cull_config(scene, cam, height, width, tile,
                                           shadow_lights=shadow_mask)
    cull = (tile[0] * tile[1], kp, ks, hot_m)

    origins, dirs = generate_rays(cam, height, width)
    o = tile_image(origins, *tile).reshape(-1, 3)
    d = tile_image(dirs, *tile).reshape(-1, 3)
    target = jnp.zeros((height * width, 3), jnp.float32)

    params = extract_params(scene, DEFAULT_TRAINABLE)

    def loss_fn(params, scene, target):
        s = apply_params(scene, params)
        img = trace_rays_fast(s, o, d, depth, engine="culled", cull=cull,
                              shadow_lights=shadow_mask)
        return jnp.mean(jnp.square(img - target))

    @jax.jit
    def sgd_step(params, scene, target):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, target)
        params = jax.tree_util.tree_map(lambda p, g: p - 1.0e-7 * g,
                                        params, grads)
        return params, loss

    # Warmup/compile
    p, loss = sgd_step(params, scene, target)
    jax.block_until_ready(loss)

    # Chained steady-state: each step consumes the previous step's params
    # (true training data dependence — immune to any execution caching),
    # synced once per window; best of 3 windows.
    k = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(k):
            p, loss = sgd_step(p, scene, target)
        jax.block_until_ready(loss)
        best = min(best, (time.perf_counter() - t0) / k)

    rays = height * width * (1 + n_lights)
    mrays = rays / best / 1.0e6
    baseline_mrays = 55.0  # BASELINE.md implied reference throughput (fwd only)

    print(json.dumps({
        "metric": "mrays_per_sec_per_chip_fwd_bwd_1024",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline_mrays, 3),
    }))


if __name__ == "__main__":
    main()

"""Decompose the c5 broad phase's 14 ms (r4): tile cones vs cone test vs
top-k compaction vs row gather/packing, each timed with perturbed inputs."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from openglraytracer_tpu.models.builders import BENCH_CONFIGS
from openglraytracer_tpu.ops.accel import (compact_mask, shadow_cull_mask,
                                           sphere_vs_cone, tile_cones,
                                           tile_image, _gather_tile_rows,
                                           _sphere_table)
from openglraytracer_tpu.ops.pallas_culled import _primary_sphere_rows
from openglraytracer_tpu.ops.raygen import generate_rays


def timeit(fn, scene, k=5):
    def perturbed(i):
        return scene._replace(spheres=scene.spheres._replace(
            radius=scene.spheres.radius + jnp.float32(1e-7) * (i + 1)))
    variants = [perturbed(i) for i in range(3 * k)]
    jax.block_until_ready([v.spheres.radius for v in variants])
    jax.block_until_ready(fn(scene))
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(variants[w * k + i])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def main():
    tile_side = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    builder, h, w, _ = BENCH_CONFIGS["c5_grid4096"]
    scene, cam = builder()
    origins, dirs = generate_rays(cam, h, w)
    tile = (tile_side, tile_side)
    o = tile_image(origins, *tile).reshape(-1, 3)
    d = tile_image(dirs, *tile).reshape(-1, 3)
    tile_p = tile_side * tile_side
    t_tiles = o.shape[0] // tile_p
    dirs_t = d.reshape(t_tiles, tile_p, 3)
    kp = 72

    def f_cones(s):
        return tile_cones(dirs_t)

    def f_mask(s):
        axis, ch = tile_cones(dirs_t)
        return sphere_vs_cone(o[0], axis, ch, s.spheres.center,
                              s.spheres.radius)

    def f_compact(s):
        axis, ch = tile_cones(dirs_t)
        m = sphere_vs_cone(o[0], axis, ch, s.spheres.center, s.spheres.radius)
        return compact_mask(m, kp)

    def f_rows(s):
        axis, ch = tile_cones(dirs_t)
        m = sphere_vs_cone(o[0], axis, ch, s.spheres.center, s.spheres.radius)
        p_idx, p_valid, p_count = compact_mask(m, kp)
        return _primary_sphere_rows(s, o[0], p_idx, p_valid), p_count

    # one shadow cull mask (needs fake hit data: reuse origins as hits)
    hit_mask = jnp.ones((o.shape[0],), bool)

    def f_shadowmask(s):
        return shadow_cull_mask(s, o, hit_mask, tile_p,
                                s.lights.position[0])

    for name, fn in [("tile_cones", f_cones), ("+cone mask", f_mask),
                     ("+top-k", f_compact), ("+rows pack", f_rows),
                     ("shadow_cull_mask x1", f_shadowmask)]:
        print(f"{name:22s} {timeit(jax.jit(fn), scene):8.3f} ms", flush=True)


if __name__ == "__main__":
    main()

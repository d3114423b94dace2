"""One-off: c5 on the chip — culled vs culled_pallas (dynamic trip counts).
Checks Mosaic compiles the dynamic kernels and measures the win + compile_s.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from openglraytracer_tpu.models.builders import BENCH_CONFIGS
from openglraytracer_tpu.ops.accel import (parse_cull_spec,
                                           suggest_cull_config, tile_image)
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.render import trace_rays_fast
from openglraytracer_tpu.ops.shading import static_shadow_mask


def timeit(fn, scene, k=5):
    """Perturbed-input timing (axon caches identical executions)."""
    def perturbed(i):
        return scene._replace(spheres=scene.spheres._replace(
            radius=scene.spheres.radius + jnp.float32(1e-7) * (i + 1)))

    variants = [perturbed(i) for i in range(3 * k)]
    jax.block_until_ready([v.spheres.radius for v in variants])
    t0 = time.perf_counter()
    out = fn(scene)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(variants[w * k + i])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3, compile_s


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "c5_grid4096"
    tile_side = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    builder, h, w, depth = BENCH_CONFIGS[name]
    engines = sys.argv[3].split(",") if len(sys.argv) > 3 \
        else ["culled", "culled_pallas"]
    scene, cam = builder()
    sm = static_shadow_mask(scene)
    tile = (tile_side, tile_side)
    origins, dirs = generate_rays(cam, h, w)
    o = tile_image(origins, *tile).reshape(-1, 3)
    d = tile_image(dirs, *tile).reshape(-1, 3)
    tile_p = tile_side * tile_side

    imgs = {}
    for engine in engines:
        spec = suggest_cull_config(scene, cam, h, w, tile, shadow_lights=sm)
        _, kp, ks, hot_m, kb, ksb = parse_cull_spec(spec)
        print(f"{name} tile={tile_side} {engine}: kp={kp} ks={ks} "
              f"hot_m={hot_m}", flush=True)
        cull = (tile_p, kp, ks, hot_m, kb, ksb)
        f = jax.jit(lambda s, e=engine, c=cull: trace_rays_fast(
            s, o, d, depth, engine=e, cull=c, shadow_lights=sm))
        ms, cs = timeit(f, scene)
        imgs[engine] = np.asarray(f(scene))
        print(f"{engine:15s} fwd {ms:8.3f} ms   (first call {cs:.1f} s)",
              flush=True)
    if len(imgs) == 2:
        a, b = imgs.values()
        print(f"max |img diff| = {np.abs(a - b).max():.2e}")


if __name__ == "__main__":
    main()

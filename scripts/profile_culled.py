"""Decompose culled-engine time: broad+primary vs shadows vs shading.

Run on the TPU: python scripts/profile_culled.py [c5_grid4096|c3_grid64]
Guides the Pallas culled-kernel design (VERDICT r2 #1/#3).
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
from openglraytracer_tpu.ops.accel import (culled_geometry, cull_counts,
                                           parse_cull_spec,
                                           suggest_cull_config, tile_image)
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.render import trace_rays_fast
from openglraytracer_tpu.ops.shading import static_shadow_mask


def timeit(fn, scene, k=5):
    """Time fn(scene) with a DIFFERENT scene per call — the axon backend
    caches identical executions, so repeated same-input calls can report the
    dispatch floor instead of device time (bench.py's chained-step rule)."""
    def perturbed(i):
        return scene._replace(spheres=scene.spheres._replace(
            radius=scene.spheres.radius + jnp.float32(1e-7) * (i + 1)))

    variants = [perturbed(i) for i in range(3 * k)]   # all device-resident
    jax.block_until_ready([v.spheres.radius for v in variants])
    jax.block_until_ready(fn(scene))        # compile
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(variants[w * k + i])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best * 1e3


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "c5_grid4096"
    tile_side = int(sys.argv[2]) if len(sys.argv) > 2 else \
        (32 if name == "c5_grid4096" else 64)
    engine = sys.argv[3] if len(sys.argv) > 3 else "culled"
    builder, h, w, depth = BENCH_CONFIGS[name]
    scene, cam = builder()
    shadow_mask = static_shadow_mask(scene)
    tile = (tile_side, tile_side)

    p_count, s_count, _, _ = cull_counts(scene, cam, h, w, tile, shadow_mask)
    sc = np.asarray(s_count)
    print(f"{name} {w}x{h} tile={tile_side}: primary counts max={int(np.max(np.asarray(p_count)))}")
    if sc.size:
        qs = np.percentile(sc, [50, 90, 99, 99.9, 100], axis=-1)
        print("shadow counts per light [p50 p90 p99 p99.9 max]:")
        for li in range(sc.shape[0]):
            print(f"  light {li}: {qs[:, li].astype(int)}")

    spec = suggest_cull_config(scene, cam, h, w, tile,
                               shadow_lights=shadow_mask)
    _, kp, ks, hot_m, kb, ksb = parse_cull_spec(spec)
    print(f"spec: kp={kp} ks={ks} hot_m={hot_m} kb={kb} ksb={ksb}")

    origins, dirs = generate_rays(cam, h, w)
    o = tile_image(origins, *tile).reshape(-1, 3)
    d = tile_image(dirs, *tile).reshape(-1, 3)
    tile_p = tile_side * tile_side
    no_shadows = tuple(False for _ in shadow_mask)

    if engine == "culled_pallas":
        from openglraytracer_tpu.ops.pallas_culled import culled_geometry_pallas
        geo_fn = culled_geometry_pallas
    else:
        geo_fn = culled_geometry
    geo_full = jax.jit(lambda s: geo_fn(
        s, o, d, tile_p, kp, ks, shadow_mask, hot_m, kb, ksb)[:2])
    geo_prim = jax.jit(lambda s: geo_fn(
        s, o, d, tile_p, kp, ks, no_shadows, hot_m, kb, ksb)[0])
    full = jax.jit(lambda s: trace_rays_fast(
        s, o, d, depth, engine=engine,
        cull=(tile_p, kp, ks, hot_m, kb, ksb), shadow_lights=shadow_mask))

    # broad phase alone (no narrow): cone masks + compaction + row gathers
    from openglraytracer_tpu.ops.accel import (compact_mask, sphere_vs_cone,
                                               tile_cones, _gather_tile_rows,
                                               _sphere_table)

    def broad_only(s):
        dirs_t = d.reshape(-1, tile_p, 3)
        axis, cos_half = tile_cones(dirs_t)
        pmask = sphere_vs_cone(o[0], axis, cos_half, s.spheres.center,
                               s.spheres.radius)
        p_idx, p_valid, p_count = compact_mask(pmask, kp)
        return _gather_tile_rows(_sphere_table(s), p_idx), p_count

    t_broad = timeit(jax.jit(broad_only), scene)
    t_prim = timeit(geo_prim, scene)
    t_geo = timeit(geo_full, scene)
    t_full = timeit(full, scene)
    print(f"engine {engine}")
    print(f"broad only:    {t_broad:8.3f} ms  (cones + top-k + row gather)")
    print(f"broad+primary: {t_prim:8.3f} ms  (primary narrow ~{t_prim - t_broad:.3f} ms)")
    print(f"+shadows:      {t_geo:8.3f} ms  (shadow phase ~{t_geo - t_prim:.3f} ms)")
    print(f"+shading:      {t_full:8.3f} ms  (mat rows + phong ~{t_full - t_geo:.3f} ms)")


if __name__ == "__main__":
    main()

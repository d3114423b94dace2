"""Chip microbenchmark: Mosaic compaction kernel vs lax.top_k at the exact
(T, N, K) shapes the c5 broad phase runs (VERDICT r4 next #3 — top_k over
(4096, 4096) was the measured ~23 ms bottleneck of a 66 ms frame).

Also times the end-to-end c5 culled_pallas forward with OGLRT_COMPACT forced
each way, which is the number that matters.

Run on the chip: python scripts/microbench_compact.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args_list, k=8):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(k):
            out = fn(*args_list[(w * k + i) % len(args_list)])
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / k)
    return best, out


def mask_variants(t, n, p, count=24, seed=0):
    """Distinct masks per call (the axon backend caches identical
    executions — memory: always perturb inputs)."""
    rng = np.random.default_rng(seed)
    return [(jnp.asarray(rng.random((t, n)) < p),) for _ in range(count)]


def bench_compaction():
    from openglraytracer_tpu.ops.pallas_compact import compact_mask_pallas
    rows = {}
    for name, t, n, k, p in (
            ("c5_primary", 4096, 4096, 96, 46 / 4096),
            ("c5_shadow", 4096, 4096, 256, 60 / 4096),
            ("c3_primary", 256, 64, 24, 8 / 64)):
        masks = mask_variants(t, n, p)

        def topk(m, k=k, n=n):
            key = jnp.where(m, jnp.arange(n, 0, -1, dtype=jnp.int32)[None],
                            0)
            v, i = jax.lax.top_k(key, min(k, n))
            return i, v > 0, jnp.sum(m, -1, dtype=jnp.int32)

        t_topk, r_topk = timed(jax.jit(topk), masks)
        t_pal, r_pal = timed(
            jax.jit(lambda m, k=k: compact_mask_pallas(m, k)), masks)
        ia, va, ca = r_topk
        ib, vb, cb = r_pal
        same = (np.array_equal(np.asarray(ia * va), np.asarray(ib * vb))
                and np.array_equal(np.asarray(ca), np.asarray(cb)))
        rows[name] = {"shape": [t, n, k],
                      "topk_ms": round(t_topk * 1e3, 3),
                      "pallas_ms": round(t_pal * 1e3, 3),
                      "speedup_x": round(t_topk / t_pal, 2),
                      "outputs_equal": bool(same)}
        print(json.dumps({name: rows[name]}), flush=True)
    return rows


def bench_c5_forward(impl: str):
    from openglraytracer_tpu.models.builders import BENCH_CONFIGS
    from openglraytracer_tpu.ops.accel import (parse_cull_spec,
                                               suggest_cull_config,
                                               tile_image)
    from openglraytracer_tpu.ops.raygen import generate_rays
    from openglraytracer_tpu.ops.render import trace_rays_fast
    from openglraytracer_tpu.ops.shading import static_shadow_mask

    os.environ["OGLRT_COMPACT"] = impl
    jax.clear_caches()
    builder, h, w, depth = BENCH_CONFIGS["c5_grid4096"]
    scene, cam = builder()
    sm = static_shadow_mask(scene)
    tile = (32, 32)
    spec = suggest_cull_config(scene, cam, h, w, tile, shadow_lights=sm)
    _, kp, ks, hot_m, kb, ksb = parse_cull_spec(spec)
    cull = (tile[0] * tile[1], kp, ks, hot_m, kb, ksb)
    o, d = generate_rays(cam, h, w)
    o = tile_image(o, *tile).reshape(-1, 3)
    d = tile_image(d, *tile).reshape(-1, 3)

    fn = jax.jit(lambda s: trace_rays_fast(s, o, d, depth,
                                           engine="culled_pallas", cull=cull,
                                           shadow_lights=sm))
    variants = [(scene._replace(spheres=scene.spheres._replace(
        radius=scene.spheres.radius + 1e-7 * i)),) for i in range(24)]
    t_best, _ = timed(fn, variants)
    return round(t_best * 1e3, 3)


def main():
    out = {"compaction": bench_compaction()}
    out["c5_fwd_ms_topk"] = bench_c5_forward("topk")
    out["c5_fwd_ms_pallas"] = bench_c5_forward("pallas")
    out["device"] = jax.devices()[0].device_kind
    print(json.dumps(out), flush=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts",
            "microbench_compact.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

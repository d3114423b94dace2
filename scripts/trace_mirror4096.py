"""Op-level profile of the c4_mirror4096 forward (depth-1, 4096 mirror
spheres, per-ray-origin Mosaic children) — find where the ~190 ms goes.

Usage: python scripts/trace_mirror4096.py [tile_side] [engine]
Prints the top ops by self time and a phase summary (primary vs child
broad vs child narrow vs shade).
"""
import glob
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from openglraytracer_tpu.models.builders import BENCH_CONFIGS
from openglraytracer_tpu.ops.accel import (parse_cull_spec,
                                           suggest_child_cull_config,
                                           suggest_cull_config, tile_image)
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.render import trace_rays_fast
from openglraytracer_tpu.ops.shading import (static_bounce_mask,
                                             static_shadow_mask)


def main():
    tile_side = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    engine = sys.argv[2] if len(sys.argv) > 2 else "culled_pallas"
    name = "c4_mirror4096"
    outdir = f"/tmp/trace_{name}_{engine}"
    builder, h, w, depth = BENCH_CONFIGS[name]
    scene, cam = builder()
    sm = static_shadow_mask(scene)
    bm = static_bounce_mask(scene)
    tile = (tile_side, tile_side)
    spec = suggest_cull_config(scene, cam, h, w, tile, shadow_lights=sm)
    _, kp, ks, hot_m, kb, ksb = parse_cull_spec(spec)
    origins, dirs = generate_rays(cam, h, w)
    o = tile_image(origins, *tile).reshape(-1, 3)
    d = tile_image(dirs, *tile).reshape(-1, 3)
    cull = (tile_side * tile_side, kp, ks, hot_m, kb, ksb)
    from openglraytracer_tpu.ops.accel import cull_hot_p
    cspec = suggest_child_cull_config(scene, cam, h, w, spec,
                                      shadow_lights=sm,
                                      hot_primary=(engine == "culled_pallas"))
    _, ckp, cks, chot, ckb, cksb = parse_cull_spec(cspec)
    child_cull = (tile_side * tile_side, ckp, cks, chot, ckb, cksb,
                  cull_hot_p(cspec))
    print("cull", cull[1:], "child_cull", child_cull[1:])

    f = jax.jit(lambda s: trace_rays_fast(s, o, d, depth, engine=engine,
                                          cull=cull, shadow_lights=sm,
                                          bounce_mask=bm,
                                          child_cull=child_cull))
    scenes = [scene._replace(spheres=scene.spheres._replace(
        radius=scene.spheres.radius + jnp.float32(1e-7) * i))
        for i in range(6)]
    jax.block_until_ready(f(scenes[0]))           # compile
    with jax.profiler.trace(outdir):
        for i in range(1, 6):
            out = f(scenes[i])
        jax.block_until_ready(out)

    xs = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"), recursive=True)
    from xprof.convert import raw_to_tool_data
    data, _ = raw_to_tool_data.xspace_to_tool_data(xs, "framework_op_stats",
                                                   {})
    rows = json.loads(data) if isinstance(data, (str, bytes)) else data
    with open("/tmp/opstats_mirror4096.json", "w") as fp:
        json.dump(rows, fp)
    print("wrote /tmp/opstats_mirror4096.json")


if __name__ == "__main__":
    main()

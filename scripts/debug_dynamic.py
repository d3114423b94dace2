"""Localize the chip-only culled vs culled_pallas(dynamic) mismatch."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from openglraytracer_tpu.models.builders import sphere_grid_scene
from openglraytracer_tpu.ops import pallas_culled
from openglraytracer_tpu.ops.accel import (culled_geometry, parse_cull_spec,
                                           suggest_cull_config, tile_image)
from openglraytracer_tpu.ops.pallas_culled import culled_geometry_pallas
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.shading import static_shadow_mask


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    tile_side = 32
    import os
    if os.environ.get("OGLRT_STATIC"):
        pallas_culled._DYNAMIC_THRESHOLD = 10**9
    else:
        pallas_culled._DYNAMIC_THRESHOLD = -1
    scene, cam = sphere_grid_scene(side)
    sm = static_shadow_mask(scene)
    tile = (tile_side, tile_side)
    spec = suggest_cull_config(scene, cam, hw, hw, tile, shadow_lights=sm)
    _, kp, ks, hot_m, kb, ksb = parse_cull_spec(spec)
    print(f"side={side} {hw}^2 spec kp={kp} ks={ks} hot_m={hot_m}")
    origins, dirs = generate_rays(cam, hw, hw)
    o = tile_image(origins, *tile).reshape(-1, 3)
    d = tile_image(dirs, *tile).reshape(-1, 3)
    tile_p = tile_side * tile_side

    f_p = jax.jit(lambda s: culled_geometry_pallas(
        s, o, d, tile_p, kp, ks, sm, hot_m, kb, ksb))
    f_c = jax.jit(lambda s: culled_geometry(
        s, o, d, tile_p, kp, ks, sm, hot_m, kb, ksb))
    hit_p, occ_p, aux_p = f_p(scene)
    hit_c, occ_c, aux_c = f_c(scene)

    hid_p, hid_c = np.asarray(hit_p.obj_id), np.asarray(hit_c.obj_id)
    print("obj_id mismatches:", int((hid_p != hid_c).sum()), "/", hid_p.size)
    print("hit mismatches:", int((np.asarray(hit_p.hit) !=
                                  np.asarray(hit_c.hit)).sum()))
    print("t maxdiff:", float(np.abs(np.asarray(hit_p.t) -
                                     np.asarray(hit_c.t)).max()))
    hm = np.asarray(hit_c.hit)[:, None]
    om = (np.asarray(occ_p) & hm) != (np.asarray(occ_c) & hm)
    print("occ mismatches:", int(om.sum()), "per light:", om.sum(0))
    if om.sum():
        ray_ids = np.nonzero(om.any(-1))[0]
        tiles = ray_ids // tile_p
        print("mismatch tiles:", np.unique(tiles)[:20])
        sc = np.asarray(aux_c.s_count)
        print("their s_counts l0:", sc[0][np.unique(tiles)[:20]])
        print("their s_counts l1:", sc[1][np.unique(tiles)[:20]]
              if sc.shape[0] > 1 else "-")
        print("ks =", ks, "hot_m =", hot_m)


if __name__ == "__main__":
    main()

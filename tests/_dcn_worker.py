"""Worker for the spawned-subprocess multi-process test (test_distributed.py).

Each of 2 CPU processes: initialize the JAX multi-host runtime through
init_distributed's explicit path, render a tile-sharded image over the
2-process global mesh, and assemble it with gather_image — which must take
the DCN process_allgather branch (the array is not fully addressable) —
then check it against a local single-device render.
"""

import sys


def main():
    pid, addr = int(sys.argv[1]), sys.argv[2]

    import jax
    jax.config.update("jax_platforms", "cpu")

    from openglraytracer_tpu.parallel.distributed import (gather_image,
                                                          init_distributed)
    init_distributed(coordinator_address=addr, num_processes=2,
                     process_id=pid)
    assert jax.process_count() == 2, f"process_count={jax.process_count()}"

    import numpy as np
    from openglraytracer_tpu.models.builders import single_sphere_scene
    from openglraytracer_tpu.ops.render import render
    from openglraytracer_tpu.parallel.mesh import make_mesh
    from openglraytracer_tpu.parallel.sharded import render_sharded

    scene, cam = single_sphere_scene()
    mesh = make_mesh()  # all global devices: one per process
    img = render_sharded(scene, cam, 16, 16, mesh=mesh)
    assert not img.is_fully_addressable, \
        "expected a multi-host global array (DCN gather path)"
    out = gather_image(img)

    ref = np.asarray(render(scene, cam, 16, 16))
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # The perf path too (VERDICT r2 next #7): culled engine on an OBB+sphere
    # scene (reference world, raytrace_compute.glsl:261-320) through the same
    # 2-process mesh + DCN gather, checked against the local culled render.
    from openglraytracer_tpu.models.animated import reference_frame
    from openglraytracer_tpu.ops.accel import suggest_cull_config

    scene2, cam2 = reference_frame(1.2)
    cull = suggest_cull_config(scene2, cam2, 16, 16, (4, 4), headroom=2.0)
    img2 = render_sharded(scene2, cam2, 16, 16, mesh=mesh,
                          engine="culled", cull=cull)
    assert not img2.is_fully_addressable
    out2 = gather_image(img2)
    ref2 = np.asarray(render(scene2, cam2, 16, 16, engine="culled",
                             cull=cull))
    np.testing.assert_allclose(out2, ref2, atol=1e-6)
    print(f"proc {pid} OK", flush=True)


if __name__ == "__main__":
    main()

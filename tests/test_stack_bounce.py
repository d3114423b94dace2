"""Deep-recursion stack engine (trace_rays_stack): the O(depth)-memory DFS
scan must reproduce the O(2^depth)-memory tree unroll exactly — same
geometry/shading ops, linearized blend weights — and match the oracle's true
recursion on the reference's glass-heavy animated world (VERDICT r1 #6;
reference stack machine raytrace_compute.glsl:844-1105).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglraytracer_tpu.models.animated import reference_frame
from openglraytracer_tpu.ops.raygen import generate_rays
from openglraytracer_tpu.ops.render import (_dfs_schedule, render, trace_rays,
                                            trace_rays_stack)
from openglraytracer_tpu.train.inverse import apply_params, extract_params
from openglraytracer_tpu.utils import oracle


def _rays(cam, h, w):
    o, d = generate_rays(cam, h, w)
    return o.reshape(-1, 3), d.reshape(-1, 3)


def test_dfs_schedule_shape():
    for depth in (1, 2, 3, 5):
        steps = _dfs_schedule(depth)
        assert len(steps) == 2 ** (depth + 1) - 1
        # root is a carry step at level 0
        assert steps[0] == (-1, 0)
        # every stack slot is written before it's read: a pop of slot s must
        # come after a node at level s (which wrote it) and target level s+1
        for src, lvl in steps[1:]:
            assert (src == -1) or (lvl == src + 1)
        # node count per level matches the full binary tree
        from collections import Counter
        per_level = Counter(l for _, l in steps)
        assert all(per_level[l] == 2 ** l for l in range(depth + 1))


@pytest.mark.parametrize("depth", [1, 2, 3])
def test_stack_matches_tree(depth):
    """The scan linearization equals the mix-chain tree on the reference's
    OBB+glass world (reflectivity AND transparency live, TIR cases
    included)."""
    scene, cam = reference_frame(0.9)
    o, d = _rays(cam, 24, 32)
    tree = trace_rays(scene, o, d, depth)
    stack = trace_rays_stack(scene, o, d, depth)
    np.testing.assert_allclose(np.asarray(stack), np.asarray(tree),
                               rtol=1e-4, atol=1e-5)


def test_stack_depth4_matches_oracle():
    """Depth-4 render of the glass-heavy animated scene vs the oracle's true
    Python recursion, at the golden-image tolerance, at O(depth) memory."""
    scene, cam = reference_frame(1.1)
    got = render(scene, cam, 24, 32, depth=4, bounce="stack")
    want = oracle.render(scene, cam, 24, 32, depth=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_stack_gradients_match_tree():
    scene, cam = reference_frame(0.5)
    o, d = _rays(cam, 16, 16)
    target = jnp.zeros((16 * 16, 3), jnp.float32)
    params = extract_params(scene, ("boxes.position", "spheres.center",
                                    "materials.diffuse",
                                    "materials.reflectivity",
                                    "materials.transparency"))

    def loss(params, fn):
        s = apply_params(scene, params)
        img = fn(s, o, d, 2)
        return jnp.mean(jnp.square(img - target))

    g_tree = jax.grad(loss)(params, trace_rays)
    g_stack = jax.grad(loss)(params, trace_rays_stack)
    for k in params:
        a, b = np.asarray(g_tree[k]), np.asarray(g_stack[k])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=2e-4 * scale,
                                   err_msg=f"grad mismatch for {k}")


def test_stack_depth0_falls_back():
    scene, cam = reference_frame(0.3)
    o, d = _rays(cam, 8, 8)
    a = trace_rays_stack(scene, o, d, 0)
    b = trace_rays(scene, o, d, 0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# Culled stack engine (r5, VERDICT r4 next #5): deep recursion x culling
# ---------------------------------------------------------------------------

def _glass_full_spec(scene, tile=(16, 16)):
    """A spec no bundle can overflow (K = N): exact-equality harness."""
    n = int(scene.spheres.count)
    return (tile, max(n, 1), max(n, 1), 0, 0, 0)


def test_culled_stack_matches_dense_stack():
    """Glass world (reflection AND refraction) at depth 3: the culled stack
    engine == the dense stack engine when no list can overflow."""
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(0.9)
    h, w = 32, 64
    spec = _glass_full_spec(scene)
    dense = render(scene, cam, h, w, depth=3, engine="xla", bounce="stack")
    culled, ovf = render(scene, cam, h, w, depth=3, engine="culled",
                         bounce="stack", cull=spec, with_cull_stats=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(culled), np.asarray(dense),
                               atol=1e-5)


def test_culled_pallas_stack_matches_dense_stack():
    from openglraytracer_tpu.models.animated import reference_frame
    scene, cam = reference_frame(0.9)
    h, w = 32, 64
    spec = _glass_full_spec(scene)
    dense = render(scene, cam, h, w, depth=3, engine="xla", bounce="stack")
    culled = render(scene, cam, h, w, depth=3, engine="culled_pallas",
                    bounce="stack", cull=spec)
    np.testing.assert_allclose(np.asarray(culled), np.asarray(dense),
                               atol=1e-5)


def test_culled_stack_mirror_chain_matches():
    """Mirror-only scene (dead refraction branch): the culled stack engine
    takes the O(depth) chain path with per-step bounce culling."""
    from openglraytracer_tpu.models.builders import sphere_grid_scene
    scene, cam = sphere_grid_scene(4, reflectivity=0.6, seed=3)
    h = w = 48
    spec = _glass_full_spec(scene)
    dense = render(scene, cam, h, w, depth=3, engine="xla", bounce="stack")
    culled, ovf = render(scene, cam, h, w, depth=3, engine="culled",
                         bounce="stack", cull=spec, with_cull_stats=True)
    assert int(ovf) == 0
    np.testing.assert_allclose(np.asarray(culled), np.asarray(dense),
                               atol=1e-5)


def test_culled_stack_overflow_counted():
    from openglraytracer_tpu.models.builders import sphere_grid_scene
    scene, cam = sphere_grid_scene(4, reflectivity=0.6, seed=3)
    spec = ((16, 16), 1, 1, 0, 0, 0)    # absurdly small K: must overflow
    _, ovf = render(scene, cam, 48, 48, depth=2, engine="culled",
                    bounce="stack", cull=spec, with_cull_stats=True)
    assert int(ovf) > 0


def test_culled_stack_gradients_match_dense_stack():
    from openglraytracer_tpu.models.builders import sphere_grid_scene
    from openglraytracer_tpu.train.inverse import apply_params, extract_params
    scene, cam = sphere_grid_scene(3, reflectivity=0.5, seed=5)
    h = w = 32
    spec = _glass_full_spec(scene)
    params = extract_params(scene, ("spheres.center", "materials.diffuse"))

    def loss(params, engine, cull):
        s = apply_params(scene, params)
        img = render(s, cam, h, w, depth=2, engine=engine, bounce="stack",
                     cull=cull)
        return jnp.mean(jnp.square(img - 0.3))

    g_dense = jax.grad(loss)(params, "xla", None)
    g_culled = jax.grad(loss)(params, "culled", spec)
    for k in params:
        np.testing.assert_allclose(np.asarray(g_culled[k]),
                                   np.asarray(g_dense[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)

"""Distributed-without-a-cluster tests on the 8-virtual-CPU-device mesh:
sharded render == single-device render, sharded grads == unsharded grads
(SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from openglraytracer_tpu.models.builders import eight_sphere_scene, mirror_scene
from openglraytracer_tpu.ops.render import render
from openglraytracer_tpu.parallel.mesh import AXIS_X, AXIS_Y, make_mesh
from openglraytracer_tpu.parallel.sharded import render_sharded


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


@pytest.mark.smoke
def test_sharded_render_matches_single_device():
    scene, cam = eight_sphere_scene()
    mesh = make_mesh()                      # (4, 2) over 8 cpu devices
    assert mesh.shape[AXIS_X] * mesh.shape[AXIS_Y] == 8

    img_1 = np.asarray(render(scene, cam, 64, 64))
    img_n = render_sharded(scene, cam, 64, 64, mesh=mesh)
    assert img_n.sharding.spec in (P(AXIS_X, AXIS_Y, None), P(AXIS_X, AXIS_Y))
    np.testing.assert_allclose(np.asarray(img_n), img_1, atol=1e-5)


def test_sharded_render_with_bounces():
    scene, cam = mirror_scene()
    mesh = make_mesh()
    img_1 = np.asarray(render(scene, cam, 32, 32, depth=1))
    img_n = render_sharded(scene, cam, 32, 32, mesh=mesh, depth=1)
    np.testing.assert_allclose(np.asarray(img_n), img_1, atol=1e-5)


def test_mesh_shapes():
    for shape in [(8, 1), (4, 2), (2, 4), (1, 8)]:
        mesh = make_mesh(shape=shape)
        scene, cam = eight_sphere_scene()
        img = render_sharded(scene, cam, 32, 32, mesh=mesh)
        assert np.isfinite(np.asarray(img)).all()


def test_sharded_gradients_match():
    """Pixel-sharded loss gradients (XLA psum over the mesh) == single-device
    gradients. This is the gradient-reduction path of the inverse-rendering
    trainer."""
    scene, cam = eight_sphere_scene()
    mesh = make_mesh()
    target = np.asarray(render(scene, cam, 32, 32)) * 0.8

    def loss(s, tgt):
        img = render_sharded(s, cam, 32, 32, mesh=mesh)
        return jnp.mean((img - tgt) ** 2)

    tgt_sharded = jax.device_put(
        jnp.asarray(target), NamedSharding(mesh, P(AXIS_X, AXIS_Y, None)))
    g_sharded = jax.grad(loss, allow_int=True)(scene, tgt_sharded)

    def loss1(s, tgt):
        img = render(s, cam, 32, 32)
        return jnp.mean((img - tgt) ** 2)

    g_single = jax.grad(loss1, allow_int=True)(scene, jnp.asarray(target))

    for a, b in zip(jax.tree_util.tree_leaves(g_sharded),
                    jax.tree_util.tree_leaves(g_single)):
        a, b = np.asarray(a), np.asarray(b)
        if np.issubdtype(a.dtype, np.floating):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

"""Unit tests: sphere / OBB / plane intersection and closest-hit vs the oracle
and closed-form cases (reference raytrace_compute.glsl:583-782)."""

import numpy as np
import jax.numpy as jnp

from openglraytracer_tpu.models.builders import eight_sphere_scene
from openglraytracer_tpu.models.animated import reference_scene
from openglraytracer_tpu.models.scene import MISS_T
from openglraytracer_tpu.ops.intersect import (
    any_hit,
    box_candidates,
    closest_hit,
    plane_candidates,
    sphere_candidates,
)
from openglraytracer_tpu.ops.transforms import euler_rotation_3x3
from openglraytracer_tpu.utils import oracle as O

import jax


def _rays(*rows):
    o = jnp.asarray([r[0] for r in rows], jnp.float32)
    d = jnp.asarray([r[1] for r in rows], jnp.float32)
    return o, d


def test_sphere_closed_form():
    o, d = _rays(
        ([0, -5, 0], [0, 1, 0]),    # head-on: t = 4 (unit sphere at origin)
        ([0, 0, 0], [0, 1, 0]),     # inside: t = 1, inside flag, flipped n
        ([0, -5, 2], [0, 1, 0]),    # miss above
        ([0, 5, 0], [0, 1, 0]),     # behind
    )
    center = jnp.zeros((1, 3), jnp.float32)
    radius = jnp.ones((1,), jnp.float32)
    valid = jnp.ones((1,), bool)
    t, n, inside = sphere_candidates(o, d, center, radius, valid)
    t = np.asarray(t)[:, 0]
    n = np.asarray(n)[:, 0]
    inside = np.asarray(inside)[:, 0]

    np.testing.assert_allclose(t[0], 4.0, atol=1e-5)
    np.testing.assert_allclose(n[0], [0, -1, 0], atol=1e-5)
    assert not inside[0]

    np.testing.assert_allclose(t[1], 1.0, atol=1e-5)
    np.testing.assert_allclose(n[1], [0, -1, 0], atol=1e-5)  # flipped
    assert inside[1]

    assert t[2] >= MISS_T and t[3] >= MISS_T


def test_sphere_unnormalized_dir():
    # Shadow rays use unnormalized segment dirs; t parameterizes the segment.
    o = jnp.asarray([[0.0, -5.0, 0.0]])
    d = jnp.asarray([[0.0, 10.0, 0.0]])   # |d| = 10, surface at t = 0.4
    t, _, _ = sphere_candidates(o, d, jnp.zeros((1, 3)), jnp.ones((1,)),
                                jnp.ones((1,), bool))
    np.testing.assert_allclose(np.asarray(t)[0, 0], 0.4, atol=1e-6)


def test_box_axis_aligned_closed_form():
    o, d = _rays(
        ([0, -5, 0], [0, 1, 0]),    # hits y = -1 face at t = 4
        ([0, 0, 0], [0, 1, 0]),     # inside: exits y = +1 at t = 1
        ([5, -5, 0], [0, 1, 0]),    # miss
        ([0, -5, 0], [0, -1, 0]),   # behind
    )
    mins = jnp.asarray([[-1.0, -1.0, -1.0]])
    maxs = jnp.asarray([[1.0, 1.0, 1.0]])
    pos = jnp.zeros((1, 3))
    rot = jnp.eye(3)[None]
    valid = jnp.ones((1,), bool)
    t, n, inside = box_candidates(o, d, mins, maxs, pos, rot, valid)
    t = np.asarray(t)[:, 0]
    n = np.asarray(n)[:, 0]
    inside = np.asarray(inside)[:, 0]

    np.testing.assert_allclose(t[0], 4.0, atol=1e-5)
    np.testing.assert_allclose(n[0], [0, -1, 0], atol=1e-5)
    assert not inside[0]
    np.testing.assert_allclose(t[1], 1.0, atol=1e-5)
    # inside exit through +y face: reference flips when ray_dir[face] > 0
    np.testing.assert_allclose(n[1], [0, -1, 0], atol=1e-5)
    assert inside[1]
    assert t[2] >= MISS_T and t[3] >= MISS_T


def test_box_rotated_matches_oracle():
    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.normal(0, 5, (64, 3)), jnp.float32)
    d = rng.normal(0, 1, (64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)

    mins = np.array([-1.0, -2.0, -0.5])
    maxs = np.array([1.5, 2.0, 0.5])
    pos = np.array([0.5, -0.3, 0.2])
    ang = np.array([25.0, 130.0, -40.0])

    rot = euler_rotation_3x3(jnp.asarray(ang, jnp.float32))[None]
    t, n, inside = box_candidates(
        o, d, jnp.asarray(mins, jnp.float32)[None],
        jnp.asarray(maxs, jnp.float32)[None],
        jnp.asarray(pos, jnp.float32)[None], rot, jnp.ones((1,), bool))
    t = np.asarray(t)[:, 0]
    n = np.asarray(n)[:, 0]

    want = O.intersect_box(np.asarray(o, np.float64), np.asarray(d, np.float64),
                           mins, maxs, pos, ang)
    want_t = np.where(want["t"] <= 0, np.inf, want["t"])
    got_t = np.where(t >= MISS_T, np.inf, t)

    both_hit = np.isfinite(want_t) & np.isfinite(got_t)
    agree = (np.isfinite(want_t) == np.isfinite(got_t))
    assert agree.mean() > 0.95  # grazing-edge disagreement only
    np.testing.assert_allclose(got_t[both_hit], want_t[both_hit], atol=1e-3)
    np.testing.assert_allclose(n[both_hit], want["n"][both_hit], atol=1e-3)


def test_plane_closed_form():
    o, d = _rays(
        ([0, 0, 5], [0, 0, -1]),    # from above: t = 6, n = +z
        ([0, 0, -5], [0, 0, 1]),    # from below: t = 4, n flipped to -z
        ([0, 0, 5], [0, 1, 0]),     # parallel: miss
    )
    normal = jnp.asarray([[0.0, 0.0, 1.0]])
    offset = jnp.asarray([-1.0])
    valid = jnp.ones((1,), bool)
    t, n, _ = plane_candidates(o, d, normal, offset, valid)
    t = np.asarray(t)[:, 0]
    n = np.asarray(n)[:, 0]
    np.testing.assert_allclose(t[0], 6.0, atol=1e-5)
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(t[1], 4.0, atol=1e-5)
    np.testing.assert_allclose(n[1], [0, 0, -1], atol=1e-6)
    assert t[2] >= MISS_T


def test_closest_hit_matches_oracle_mixed_scene():
    """Full mixed scene (boxes + sphere) from the port-fidelity animated world."""
    scene = reference_scene(1.7)
    rng = np.random.default_rng(3)
    o = rng.normal(0, 4, (256, 3))
    d = rng.normal(0, 1, (256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    hit = closest_hit(scene, jnp.asarray(o, jnp.float32),
                      jnp.asarray(d, jnp.float32))
    want = O.closest_hit(O._np(scene), o, d)

    got_hit = np.asarray(hit.hit)
    agree = got_hit == want["hit"]
    assert agree.mean() > 0.99
    m = got_hit & want["hit"] & agree
    np.testing.assert_allclose(np.asarray(hit.t)[m], want["t"][m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.p)[m], want["p"][m], atol=1e-3)
    np.testing.assert_allclose(np.asarray(hit.n)[m], want["n"][m], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(hit.inside)[m], want["inside"][m])


def test_closest_hit_chunking_invariance():
    """Chunked running-min must equal single-chunk result exactly."""
    scene, _ = eight_sphere_scene()
    rng = np.random.default_rng(1)
    o = jnp.asarray(rng.normal(0, 5, (128, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 1, (128, 3)), jnp.float32)

    a = closest_hit(scene, o, d, chunk_size=512)
    b = closest_hit(scene, o, d, chunk_size=3)
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_any_hit_matches_closest():
    scene, _ = eight_sphere_scene()
    rng = np.random.default_rng(2)
    o = jnp.asarray(rng.normal(0, 5, (128, 3)), jnp.float32)
    d = jnp.asarray(rng.normal(0, 3, (128, 3)), jnp.float32)  # unnormalized

    occ = np.asarray(any_hit(scene, o, d, max_t=1.0))
    hit = closest_hit(scene, o, d)
    want = np.asarray(hit.hit) & (np.asarray(hit.t) < 1.0)
    np.testing.assert_array_equal(occ, want)


def test_degenerate_rays_no_nan():
    """Zero and axis-parallel dirs must produce finite outputs and no NaNs in
    gradients (the GLSL leans on IEEE inf; we guard instead)."""
    scene = reference_scene(0.5)
    o = jnp.asarray([[0.0, -20.0, 0.0], [0.0, -20.0, 0.0]])
    d = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]])  # zero dir + axis-parallel
    hit = closest_hit(scene, o, d)
    assert np.isfinite(np.asarray(hit.t)).all()
    assert not np.asarray(hit.hit)[0]   # zero-dir ray misses everything

    def loss(centers):
        s = scene._replace(spheres=scene.spheres._replace(center=centers))
        h = closest_hit(s, o, d)
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    g = jax.grad(loss)(scene.spheres.center)
    assert np.isfinite(np.asarray(g)).all()

"""Two-level (coarse strip -> fine tile) cull compaction (accel.cull_compact,
r4): the fine survivor lists must be BIT-IDENTICAL to the single-level
compact_mask(sphere_vs_cone(...)) result — the coarse cone is a conservative
union of its member cones, so restricting the fine test to coarse survivors
loses nothing (unless the coarse list overflows, which must surface through
the count contract)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openglraytracer_tpu.ops import accel
from openglraytracer_tpu.ops.accel import (compact_mask, cone_union,
                                           cull_compact, sphere_vs_cone)

T, N, K = 64, 700, 16   # N >= _COARSE_MIN_N so the two-level path engages


def _random_cones(seed, t=T, coherent=True):
    """coherent=True mimics real image tiles: the 16 members of a strip
    share a base direction with small jitter (a strip of adjacent pixel
    tiles sees nearly the same direction). Incoherent strips legitimately
    overflow the coarse list — that path is tested separately."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    if coherent:
        base = jax.random.normal(k1, (t // 16, 3))
        base = jnp.repeat(base, 16, axis=0)
        axis = base + 0.05 * jax.random.normal(k3, (t, 3))
    else:
        axis = jax.random.normal(k1, (t, 3))
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    cos_half = jax.random.uniform(k2, (t,), minval=0.95, maxval=0.999)
    return axis, cos_half


def _random_spheres(seed, n=N):
    key = jax.random.PRNGKey(100 + seed)
    k1, k2 = jax.random.split(key)
    centers = jax.random.normal(k1, (n, 3)) * 30.0
    radii = jax.random.uniform(k2, (n,), minval=0.2, maxval=2.0)
    return centers, radii


def _dense(apex, axis, cos_half, centers, radii, k, max_dist=None,
           tile_valid=None):
    m = sphere_vs_cone(apex, axis, cos_half, centers, radii,
                       max_dist=max_dist)
    if tile_valid is not None:
        m = m & tile_valid[:, None]
    return compact_mask(m, k)


def _assert_same(a, b, check_counts=True):
    ia, va, ca = a
    ib, vb, cb = b
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    np.testing.assert_array_equal(np.asarray(ia) * np.asarray(va),
                                  np.asarray(ib) * np.asarray(vb))
    if check_counts:
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))


def test_cone_union_contains_members():
    axis, cos_half = _random_cones(0)
    axc, cosc = cone_union(axis.reshape(-1, 16, 3), cos_half.reshape(-1, 16))
    # every member direction cone lies inside the union: for points ON the
    # member cone boundary, angle(axis_c, p) <= theta_c
    centers, radii = _random_spheres(0)
    member = sphere_vs_cone(jnp.zeros(3), axis, cos_half, centers, radii)
    coarse = sphere_vs_cone(jnp.zeros(3), axc, cosc, centers, radii)
    coarse_f = jnp.repeat(coarse, 16, axis=0)
    assert bool(jnp.all(~member | coarse_f)), \
        "coarse cone must contain every member survivor"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_two_level_matches_dense(seed):
    axis, cos_half = _random_cones(seed)
    centers, radii = _random_spheres(seed)
    apex = jnp.zeros(3)
    a = cull_compact(apex, axis, cos_half, centers, radii, K)
    b = _dense(apex, axis, cos_half, centers, radii, K)
    _assert_same(a, b)


def test_two_level_with_max_dist_and_valid():
    axis, cos_half = _random_cones(7)
    centers, radii = _random_spheres(7)
    apex = jnp.asarray([50.0, 0.0, 0.0])
    max_d = jnp.full((T,), 60.0)
    tile_valid = (jnp.arange(T) % 3) != 0
    a = cull_compact(apex, axis, cos_half, centers, radii, K,
                     max_dist=max_d, tile_valid=tile_valid)
    b = _dense(apex, axis, cos_half, centers, radii, K,
               max_dist=max_d, tile_valid=tile_valid)
    _assert_same(a, b)


def test_coarse_overflow_is_reported():
    # incoherent strips -> coarse cones open up -> the coarse list
    # overflows Kc: wherever the TRUE survivor count exceeds K, the
    # reported count must exceed K too (never-silent contract)
    axis, cos_half = _random_cones(4, coherent=False)
    cos_half = jnp.full((T,), 0.3)          # wide cones -> many survivors
    centers, radii = _random_spheres(4)
    idx, valid, count = cull_compact(jnp.zeros(3), axis, cos_half,
                                     centers, radii, 4)
    m = sphere_vs_cone(jnp.zeros(3), axis, cos_half, centers, radii)
    true_count = np.asarray(jnp.sum(m, -1))
    got = np.asarray(count)
    assert bool(np.all((true_count <= 4) | (got > 4)))


def test_dense_fallback_small_n():
    axis, cos_half = _random_cones(5)
    centers, radii = _random_spheres(5, n=100)   # < _COARSE_MIN_N
    a = cull_compact(jnp.zeros(3), axis, cos_half, centers, radii, K)
    b = _dense(jnp.zeros(3), axis, cos_half, centers, radii, K)
    _assert_same(a, b)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_engine_equality_with_two_level_path():
    """End-to-end: a 576-sphere scene at 128^2 with (16,16) tiles — the
    shape class that used to engage the (since-withdrawn) two-level engine
    path; kept as the large-N culled-vs-exact equality check."""
    from openglraytracer_tpu.models.builders import sphere_grid_scene
    from openglraytracer_tpu.ops.accel import suggest_cull_config
    from openglraytracer_tpu.ops.render import render

    scene, cam = sphere_grid_scene(24)      # 576 spheres
    h = w = 128
    spec = suggest_cull_config(scene, cam, h, w, (16, 16), headroom=2.0)
    a = render(scene, cam, h, w, engine="culled", cull=spec)
    x = render(scene, cam, h, w, engine="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(x), atol=1e-5)

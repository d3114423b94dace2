"""Unit tests: transform math vs the NumPy oracle and closed-form properties
(reference formulas raytrace_compute.glsl:411-545)."""

import numpy as np
import jax.numpy as jnp

from openglraytracer_tpu.models.scene import make_camera
from openglraytracer_tpu.ops import transforms as T
from openglraytracer_tpu.utils import oracle as O


def test_perspective_matches_oracle():
    got = np.asarray(T.perspective_matrix(
        jnp.float32(90.0), jnp.float32(16 / 9), jnp.float32(0.1),
        jnp.float32(1000.0)))
    want = O.perspective(90.0, 16 / 9, 0.1, 1000.0, np.float64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotations_match_oracle():
    for deg in (0.0, 33.0, 90.0, -120.0, 275.0):
        np.testing.assert_allclose(
            np.asarray(T.rotation_matrix_x(jnp.float32(deg))),
            O.rot_x(deg, np.float64), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(T.rotation_matrix_y(jnp.float32(deg))),
            O.rot_y(deg, np.float64), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(T.rotation_matrix_z(jnp.float32(deg))),
            O.rot_z(deg, np.float64), atol=1e-6)


def test_euler_composition_order():
    angles = np.array([10.0, 40.0, -25.0])
    got = np.asarray(T.euler_rotation_matrix(jnp.asarray(angles, jnp.float32)))
    want = O.euler_rot(angles, np.float64)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # Rotation block is orthonormal
    r = got[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


def test_view_matrix_is_inverse_of_transform():
    pos = np.array([3.0, -2.0, 7.0])
    ang = np.array([15.0, 123.0, -8.0])
    got = np.asarray(T.view_matrix(jnp.asarray(pos, jnp.float32),
                                   jnp.asarray(ang, jnp.float32)))
    want = O.view_mat(pos, ang, np.float64)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_camera_matrices_inverse_consistency():
    cam = make_camera((1.0, 2.0, 3.0), (5.0, 30.0, 0.0))
    proj, view, inv_vp = T.camera_matrices(cam)
    prod = np.asarray(proj @ view) @ np.asarray(inv_vp)
    np.testing.assert_allclose(prod, np.eye(4), atol=1e-4)


def test_reflect_refract_glsl_semantics():
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    n = jnp.asarray([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(T.reflect(d, n)),
                               [[0.0, 0.0, 1.0]], atol=1e-7)
    # Straight-through refraction
    np.testing.assert_allclose(np.asarray(T.refract(d, n, 1.0 / 1.5)),
                               [[0.0, 0.0, -1.0]], atol=1e-7)
    # Total internal reflection -> zero vector (GLSL refract spec)
    grazing = jnp.asarray([[np.sin(np.deg2rad(80.0)), 0.0,
                            -np.cos(np.deg2rad(80.0))]], jnp.float32)
    out = np.asarray(T.refract(grazing, n, 1.5))
    np.testing.assert_allclose(out, np.zeros((1, 3)), atol=1e-7)

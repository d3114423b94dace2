"""Port-fidelity animated scene: the reference's hardcoded 5-object world and
orbiting camera as a pure function of time.

The reference compiles the scene into the shader as global initializers
evaluated per pixel per frame (raytrace_compute.glsl:261-321 objects, :332-364
camera). Here the same animation is a pure host-side function
``time -> (Scene, Camera)`` — scene construction costs microseconds once per
frame instead of 921,600 re-evaluations, and the result is a pytree the
renderer (and its gradients) consume directly.

Faithful details:
  * scaled_time = time * 0.4 (:236-237)
  * object parameters exactly as :261-320 (pulsing mirror cube, bobbing z,
    tilting green-glass floor slab, tumbling blue box, red glass sphere,
    +/-11 wall cube)
  * camera: orbit radius 10, speed = time*0.4 + 0.5, yaw uses the reference's
    literal 180/3.1416 (not pi) (:339-364)
"""

from __future__ import annotations

import jax.numpy as jnp

from openglraytracer_tpu.models.scene import (
    REF_LIGHTS,
    REF_MATERIALS,
    TIME_SCALE,
    Boxes,
    Camera,
    Scene,
    Spheres,
    empty_planes,
    make_camera,
    make_lights,
    make_materials,
    make_scene,
)

# Material table order (ids): 0=red_glass (sphere), 1=wall, 2=mirror,
# 3=green_glass, 4=blue_glass
_MAT_ORDER = ["red_glass", "wall", "mirror", "green_glass", "blue_glass"]


def reference_materials(dtype=jnp.float32):
    return make_materials([REF_MATERIALS[k] for k in _MAT_ORDER], dtype)


def reference_scene(time, dtype=jnp.float32) -> Scene:
    """The 5-object animated scene at a given time (seconds)."""
    t = jnp.asarray(time, dtype) * TIME_SCALE
    one3 = jnp.ones(3, dtype)
    zero3 = jnp.zeros(3, dtype)

    # Small red glass sphere (:310-319)
    spheres = Spheres(
        center=jnp.asarray([[-3.0, 4.0, 1.0]], dtype),
        radius=jnp.asarray([2.0], dtype),
        material_id=jnp.asarray([0], jnp.int32),
    )

    # Pulsing mirror cube half-extent (:277-278)
    ext = 0.5 * jnp.sin(t * 0.5) + 1.5

    boxes = Boxes(
        mins=jnp.stack([
            -11.0 * one3,                                   # wall (:266)
            -one3 * ext,                                    # mirror cube
            jnp.asarray([-10.0, -10.0, -1.0], dtype),       # floor (:289)
            jnp.asarray([-1.0, -1.0, -2.0], dtype),         # blue box (:301)
        ]),
        maxs=jnp.stack([
            11.0 * one3,
            one3 * ext,
            jnp.asarray([10.0, 10.0, 1.0], dtype),
            jnp.asarray([1.0, 1.0, 2.0], dtype),
        ]),
        position=jnp.stack([
            zero3,
            jnp.stack([jnp.zeros((), dtype), jnp.zeros((), dtype),
                       jnp.sin(t * 3.0)]),                  # bobbing (:282)
            jnp.asarray([0.0, 0.0, -3.0], dtype),
            jnp.asarray([3.0, 4.0, 1.0], dtype),
        ]),
        angles=jnp.stack([
            zero3,
            jnp.stack([jnp.zeros((), dtype), t * 90.0,
                       jnp.zeros((), dtype)]),              # spin (:283)
            jnp.stack([jnp.sin(t * 5.0) * 10.0,
                       jnp.asarray(45.0, dtype),
                       jnp.zeros((), dtype)]),              # lean (:295)
            jnp.stack([45.0 + t * 45.0, jnp.zeros((), dtype),
                       45.0 + t * 180.0]),                  # tumble (:307)
        ]),
        material_id=jnp.asarray([1, 2, 3, 4], jnp.int32),
    )

    return make_scene(
        spheres=spheres, boxes=boxes, planes=empty_planes(dtype),
        materials=reference_materials(dtype),
        lights=make_lights(REF_LIGHTS, dtype),
    )


def reference_camera(time, dtype=jnp.float32) -> Camera:
    """Orbiting camera (:332-364)."""
    time = jnp.asarray(time, dtype)
    radius = 10.0
    speed = time * TIME_SCALE + 0.5
    position = jnp.stack([radius * jnp.cos(speed), radius * jnp.sin(speed),
                          jnp.zeros((), dtype)])
    # The reference's literal constant 3.1416 (:353), not pi.
    yaw = jnp.mod(speed * (180.0 / 3.1416), 360.0) + 90.0
    angles = jnp.stack([jnp.zeros((), dtype), yaw, jnp.zeros((), dtype)])
    return make_camera(position, angles, v_fov=90.0, aspect=16.0 / 9.0,
                       near=0.1, far=1000.0, dtype=dtype)


def reference_frame(time, dtype=jnp.float32):
    """(Scene, Camera) for the reference demo at `time` seconds."""
    return reference_scene(time, dtype), reference_camera(time, dtype)

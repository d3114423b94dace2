"""Capture live-viewer FPS on the chip (VERDICT r3 next #7): drive the
FrameStreamer (the `oglrt view` producer loop) for ~10 s of wall clock at
1280x720 on the animated reference world and commit the /stats JSON.

The reference locks to vsync and hides its true frame cost
(main.cpp:76 glfwSwapInterval(1)); this capture reports the honest number:
chip render + host gather + JPEG encode per frame, wall-clock driven.
"""
import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from openglraytracer_tpu.utils.viewer import FrameStreamer

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "viewer_fps.json")
SECONDS = 10.0


def capture(engine: str, height=720, width=1280, depth=0, cull_tile=16):
    s = FrameStreamer(height=height, width=width, depth=depth, engine=engine,
                      cull_tile=cull_tile).start()
    # skip the jit-compile frame: wait for frame 1, then time a clean window
    s.wait_frame(0, timeout=600.0)
    f0 = s.frame_no
    t0 = time.monotonic()
    time.sleep(SECONDS)
    f1 = s.frame_no
    t1 = time.monotonic()
    stats = s.stats()
    s.stop()
    stats["frames_in_window"] = f1 - f0
    stats["window_seconds"] = round(t1 - t0, 2)
    stats["fps_window"] = round((f1 - f0) / (t1 - t0), 1)
    return stats


def main():
    rows = {}
    for engine in ("xla", "culled_pallas"):
        rows[engine] = capture(engine)
        print(json.dumps(rows[engine]), flush=True)
    out = {"scene": "reference animated world (raytrace_compute.glsl:261-320)",
           "resolution": "1280x720", "seconds_per_engine": SECONDS,
           "device": jax.devices()[0].device_kind,
           "engines": rows}
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

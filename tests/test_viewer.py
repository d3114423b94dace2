"""The live viewer (utils/viewer.py): the reference's GLFW swap loop
(main.cpp:47-93) as an HTTP MJPEG stream. Exercised end-to-end on CPU at a
tiny resolution: producer renders real frames of the animated world, the
server streams them, a plain HTTP client receives valid JPEGs + stats."""

import json
import threading
import urllib.request

from openglraytracer_tpu.utils.viewer import (_BOUNDARY, FrameStreamer,
                                              serve)


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=60) as r:
        return r.status, r.headers, r.read()


def test_viewer_stream_end_to_end():
    streamer = FrameStreamer(height=24, width=32, depth=0, engine="xla",
                             max_frames=3).start()
    server = serve(streamer, port=0, host="127.0.0.1")
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # single frame endpoint: a real JPEG of the right mime
        status, headers, body = _get(port, "/frame.jpg")
        assert status == 200
        assert headers["Content-Type"] == "image/jpeg"
        assert body[:2] == b"\xff\xd8", "JPEG SOI marker"

        # stats endpoint reports the configured geometry
        status, _, body = _get(port, "/stats")
        stats = json.loads(body)
        assert (stats["width"], stats["height"]) == (32, 24)
        assert stats["frame"] >= 1

        # the MJPEG stream: multipart boundary + at least one JPEG part
        req = urllib.request.urlopen(f"http://127.0.0.1:{port}/stream",
                                     timeout=60)
        assert _BOUNDARY in req.headers["Content-Type"]
        chunk = req.read()  # stream ends after max_frames -> finite read
        assert f"--{_BOUNDARY}".encode() in chunk
        assert b"\xff\xd8" in chunk  # at least one JPEG SOI in the stream

        # landing page serves the readout UI
        status, headers, body = _get(port, "/")
        assert status == 200 and b"/stream" in body
    finally:
        streamer.stop()
        server.shutdown()
    assert streamer.frame_no == 3


def test_pipelined_producer_publishes_all_frames_in_order():
    """The depth-N pipeline (r5): concurrent fetch/encode workers must
    publish every frame exactly once, in order, and stop cleanly."""
    seen = []
    streamer = FrameStreamer(height=16, width=16, depth=0, engine="xla",
                             max_frames=8, pipeline_depth=3)
    streamer.start()
    last = 0
    while not streamer.done:
        n, jpeg = streamer.wait_frame(last, timeout=60)
        if n > last:
            assert jpeg[:2] == b"\xff\xd8"
            seen.append(n)
            last = n
    streamer.stop()
    assert streamer.error is None
    assert streamer.frame_no == 8
    assert seen == sorted(seen), "publishes must be in order"


def test_pipelined_producer_respects_fps_cap():
    import time as _t
    streamer = FrameStreamer(height=16, width=16, depth=0, engine="xla",
                             max_frames=6, pipeline_depth=2, fps_cap=30.0)
    t0 = _t.monotonic()
    streamer.start()
    streamer.wait_frame(5, timeout=60)
    streamer.stop()
    assert streamer.error is None
    assert streamer.frame_no == 6
    # 6 frames at <= 30 FPS: at least ~5 inter-frame gaps of 1/30 s
    assert _t.monotonic() - t0 >= 5 / 30.0


def test_culled_viewer_with_packed_overflow_flag():
    """Culled engines ride the overflow flag inside the packed yuv fetch
    (r5): the stream must still produce frames and auto-rebuild on
    overflow without a separate device sync."""
    streamer = FrameStreamer(height=16, width=16, depth=0, engine="culled",
                             cull_tile=8, max_frames=4, pipeline_depth=2,
                             transport="yuv420")
    streamer.start()
    n, jpeg = streamer.wait_frame(0, timeout=120)
    while not streamer.done:
        n, jpeg = streamer.wait_frame(n, timeout=120)
    streamer.stop()
    assert streamer.error is None
    assert streamer.frame_no == 4
    assert jpeg[:2] == b"\xff\xd8"

"""Image output: float image -> PNG bytes/file.

This is the build's stand-in for the reference's presentation layer (the
RGBA8 screen texture + fullscreen blit, main.cpp:152-159 / 243-260 and
draw_screen_frag.glsl): device floats are gathered to host, clamped to [0,1],
quantized to 8-bit, and written as PNG. Row 0 of the render is the *bottom*
of the image (GL convention); PNG stores top-first, so rows are flipped here.

A native C++ encoder (native/imageio) is used when built — the analog of the
reference's C++ host-side image path — with this pure-Python zlib encoder as
the always-available fallback.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def to_uint8(image) -> np.ndarray:
    """Clamp [0,1] float (H, W, 3) -> uint8, flipping rows to top-first."""
    img = np.asarray(image)
    img = np.clip(img, 0.0, 1.0)
    img = (img * 255.0 + 0.5).astype(np.uint8)
    return img[::-1]  # GL row 0 = bottom -> PNG row 0 = top


def to_uint8_device(image):
    """Jittable to_uint8: same clamp/quantize/row-flip on device, so a
    remote host fetches 1 byte per channel instead of 4 (the live viewer's
    frame loop fuses this into its per-frame jit, r4)."""
    import jax.numpy as jnp
    img = jnp.clip(image, 0.0, 1.0)
    img = (img * 255.0 + 0.5).astype(jnp.uint8)
    return img[::-1]


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    chunk = tag + data
    return struct.pack(">I", len(data)) + chunk + \
        struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)


def encode_png_py(rgb8: np.ndarray) -> bytes:
    """Pure-Python PNG encoder for (H, W, 3) uint8."""
    h, w, c = rgb8.shape
    assert c == 3 and rgb8.dtype == np.uint8
    raw = b"".join(b"\x00" + rgb8[i].tobytes() for i in range(h))
    return b"".join([
        b"\x89PNG\r\n\x1a\n",
        _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)),
        _png_chunk(b"IDAT", zlib.compress(raw, 6)),
        _png_chunk(b"IEND", b""),
    ])


def encode_png(rgb8: np.ndarray) -> bytes:
    """PNG-encode, preferring the native C++ encoder when available."""
    try:
        from openglraytracer_tpu.utils import native_imageio
        return native_imageio.encode_png(rgb8)
    except Exception:
        return encode_png_py(rgb8)


def load_png(path: str) -> np.ndarray:
    """PNG -> float32 (H, W, 3) in [0, 1], rows flipped back to the render's
    GL convention (row 0 = bottom), so ``load_png(save_png(img)) ~= img`` and
    a loaded file can serve directly as an inverse-rendering target."""
    from PIL import Image
    rgb8 = np.asarray(Image.open(path).convert("RGB"), np.uint8)
    return rgb8[::-1].astype(np.float32) / 255.0


def save_png(image, path: str, gather: bool = True) -> None:
    """Save a float (H, W, 3) image (device or host) to a PNG file."""
    if gather:
        from openglraytracer_tpu.parallel.distributed import gather_image
        image = gather_image(image)
    with open(path, "wb") as f:
        f.write(encode_png(to_uint8(image)))

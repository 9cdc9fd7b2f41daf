"""Image packing and file output.

Replaces the reference's presentation layer (``Source/SDLauxiliary.h``): the
ARGB8888 packing of ``color_pixel`` (``Source/kernels.cl:37-40``) and a BMP
writer with the same byte layout as ``SDL_SaveImage``
(``Source/SDLauxiliary.h:24-54``), so renders can be byte-compared and
eyeballed. No window system — frames go to disk.
"""
from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np


def pack_argb(img):
    """float [.., 3] -> uint32 ARGB8888, trunc(clamp(255*c, 0, 255)), alpha
    255 — exactly ``color_pixel`` (``kernels.cl:37-40``)."""
    rgb = jnp.clip(jnp.float32(255.0) * img, 0.0, 255.0).astype(jnp.uint32)
    return ((jnp.uint32(255) << jnp.uint32(24))
            + (rgb[..., 0] << jnp.uint32(16))
            + (rgb[..., 1] << jnp.uint32(8))
            + rgb[..., 2])


def to_u8(img):
    """float [..,3] -> uint8 RGB with the same truncation semantics."""
    return jnp.clip(jnp.float32(255.0) * img, 0.0, 255.0).astype(jnp.uint8)


def save_bmp(path: str, packed: np.ndarray) -> None:
    """Write a packed ARGB8888 uint32 image [H, W] as a 32-bpp BMP
    (BITMAPINFOHEADER, BI_RGB, bottom-up rows). The little-endian byte order
    of each pixel is B,G,R,A — the layout SDL_SaveBMP produces for the
    reference's screen buffer."""
    packed = np.asarray(packed, dtype="<u4")
    h, w = packed.shape
    img_bytes = packed[::-1].tobytes()  # bottom-up
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(img_bytes), 0, 0, 54)
    info_header = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0,
                              len(img_bytes), 2835, 2835, 0, 0)
    with open(path, "wb") as f:
        f.write(file_header)
        f.write(info_header)
        f.write(img_bytes)


def save_ppm(path: str, img: np.ndarray) -> None:
    """Write a float image [H, W, 3] as binary PPM (easy to view anywhere)."""
    u8 = np.clip(255.0 * np.asarray(img, dtype=np.float32), 0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (u8.shape[1], u8.shape[0]))
        f.write(u8.tobytes())

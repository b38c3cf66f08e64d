"""Film post-processing and image output.

Capability parity with the reference's texture/BMP stack (tools/texture.h,
texture.cpp): float film -> byte conversion (rgb_float_to_byte,
PL_math.h:489), linear->sRGB transfer (PL_math.h:451-477 — present there but
commented out of the hot path, renderer.cpp:361-362), and file output with
collision-avoiding ``name_N`` naming (texture.cpp:95-113). We write PNG
instead of BMP via a dependency-free encoder (zlib + struct are stdlib).
"""

from __future__ import annotations

import os
import struct
import zlib

import jax.numpy as jnp
import numpy as np


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    """IEC 61966-2-1 transfer function (reference linear_to_srgb,
    PL_math.h:451-477 uses the same piecewise form)."""
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(
        c <= 0.0031308,
        c * 12.92,
        1.055 * jnp.power(c, 1.0 / 2.4) - 0.055,
    )


def to_uint8(film) -> np.ndarray:
    """(H, W, 3) floats in [0,1] -> uint8, round-half-up like the
    reference's ``+ 0.5`` cast (PL_math.h:489)."""
    a = np.asarray(film)
    return np.clip(a * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """Minimal 8-bit RGB PNG encoder (no third-party deps)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    raw = b"".join(
        b"\x00" + rgb[y].tobytes() for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def unique_path(path: str) -> str:
    """``name.png`` -> first free of ``name.png``, ``name_1.png``, ... —
    the reference's collision-avoiding naming (texture.cpp:95-113)."""
    if not os.path.exists(path):
        return path
    stem, ext = os.path.splitext(path)
    n = 1
    while os.path.exists(f"{stem}_{n}{ext}"):
        n += 1
    return f"{stem}_{n}{ext}"


def save_png(path: str, film, srgb: bool = False, avoid_collision: bool = True) -> str:
    """Write the film to a PNG; returns the path actually written."""
    if srgb:
        film = linear_to_srgb(jnp.asarray(film))
    data = encode_png(to_uint8(film))
    if avoid_collision:
        path = unique_path(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)
    return path


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Minimal 24-bit BMP encoder — format parity with the reference's
    writer (texture.cpp:15-131: BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up rows, BGR order, 4-byte row padding)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    row_size = (3 * w + 3) & ~3
    image_size = row_size * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + image_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size,
                       2835, 2835, 0, 0)
    rows = []
    pad = b"\x00" * (row_size - 3 * w)
    bgr = rgb[:, :, ::-1]
    for y in range(h - 1, -1, -1):       # bottom-up
        rows.append(bgr[y].tobytes() + pad)
    return header + info + b"".join(rows)


def save_bmp(path: str, film, srgb: bool = False, avoid_collision: bool = True) -> str:
    """Write the film as BMP (the reference's native format)."""
    if srgb:
        film = linear_to_srgb(jnp.asarray(film))
    data = encode_bmp(to_uint8(film))
    if avoid_collision:
        path = unique_path(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(data)
    return path

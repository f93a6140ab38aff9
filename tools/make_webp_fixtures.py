#!/usr/bin/env python3
"""Generate REAL libwebp-encoded WebP conformance fixtures for Vp8lSpec.

Uses the system libwebp (/usr/lib/x86_64-linux-gnu/libwebp.so.7, Debian
libwebp7 1.2.4) via ctypes — the reference encoder/decoder itself — so the
committed .webp files are genuine libwebp output, not in-house streams.
For each image we write:
  <name>.webp  — WebPEncodeLosslessRGBA output (or WebPEncodeRGBA for the
                 lossy container fixture)
  <name>.argb  — expected pixels as big-endian packed ARGB int32 (row-major),
                 round-tripped through WebPDecodeRGBA to prove the encoder
                 output decodes to exactly the input (lossless).

Deterministic: all images are seeded LCG functions of (x, y), no RNG state.
Run from repo root: python3 tools/make_webp_fixtures.py
"""
import ctypes
import os
import struct
import sys

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeLosslessRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.POINTER(ctypes.c_void_p)]
LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
LIB.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "webp")


def encode_lossless(w, h, rgba):
    out = ctypes.c_void_p()
    n = LIB.WebPEncodeLosslessRGBA(bytes(rgba), w, h, w * 4,
                                   ctypes.byref(out))
    assert n > 0, "encode failed"
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def encode_lossy(w, h, rgba, q=75.0):
    out = ctypes.c_void_p()
    n = LIB.WebPEncodeRGBA(bytes(rgba), w, h, w * 4, q, ctypes.byref(out))
    assert n > 0, "lossy encode failed"
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def decode(webp):
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = LIB.WebPDecodeRGBA(webp, len(webp), ctypes.byref(w), ctypes.byref(h))
    assert p, "decode failed"
    rgba = ctypes.string_at(p, w.value * h.value * 4)
    LIB.WebPFree(ctypes.cast(p, ctypes.c_void_p))
    return w.value, h.value, rgba


def rgba_to_argb_be(rgba):
    out = bytearray()
    for i in range(0, len(rgba), 4):
        r, g, b, a = rgba[i], rgba[i + 1], rgba[i + 2], rgba[i + 3]
        out += struct.pack(">I", (a << 24) | (r << 16) | (g << 8) | b)
    return bytes(out)


def img_gradient(w, h):
    """Smooth gradient + structured detail: triggers predictor/color
    transforms and long 2D-mapped back-references."""
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = (x * 255 // max(1, w - 1))
            g = (y * 255 // max(1, h - 1))
            b = ((x * x + y * y) * 7 // 10) % 256
            px += bytes((r, g, b, 255))
    return px


def img_photo(w, h):
    """Pseudo-photo: seeded LCG noise over low-frequency waves — dense
    entropy, exercises meta-prefix blocks and the color cache."""
    px = bytearray()
    s = 123456789
    for y in range(h):
        for x in range(w):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            n = (s >> 16) & 0x3F
            r = (128 + (x * 3 + y) % 97 + n) % 256
            g = (64 + (x + y * 5) % 131 + ((s >> 8) & 0x1F)) % 256
            b = (200 + (x * y) % 53 + (s & 0x0F)) % 256
            px += bytes((r, g, b, 255))
    return px


def img_palette(w, h):
    """8-color image: triggers the color-indexing transform (palette)."""
    pal = [(230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
           (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r, g, b = pal[(x // 3 + y // 2) % 8]
            px += bytes((r, g, b, 255))
    return px


def img_alpha(w, h):
    """Varying alpha: exercises the alpha channel's own prefix code.
    Alpha stays >= 100: libwebp's default (non-exact) lossless encode may
    rewrite RGB under fully-transparent pixels."""
    px = bytearray()
    s = 987654321
    for y in range(h):
        for x in range(w):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            a = 100 + ((x * 7 + y * 13) + ((s >> 13) & 0x1F)) % 156
            px += bytes(((x * 11 + ((s >> 5) & 7)) % 256, (y * 17) % 256,
                         ((x + y) * 5) % 256, a))
    return px


def main():
    os.makedirs(OUT, exist_ok=True)
    images = [
        ("lossless_gradient", 64, 48, img_gradient),
        ("lossless_photo", 128, 96, img_photo),
        ("lossless_palette", 80, 60, img_palette),
        ("lossless_alpha", 48, 40, img_alpha),
    ]
    for name, w, h, fn in images:
        rgba = fn(w, h)
        webp = encode_lossless(w, h, rgba)
        dw, dh, back = decode(webp)
        assert (dw, dh) == (w, h) and back == bytes(rgba), \
            f"{name}: libwebp roundtrip mismatch"
        with open(os.path.join(OUT, name + ".webp"), "wb") as f:
            f.write(webp)
        with open(os.path.join(OUT, name + ".argb"), "wb") as f:
            f.write(struct.pack(">II", w, h))
            f.write(rgba_to_argb_be(rgba))
        print(f"{name}: {w}x{h}, webp {len(webp)}B "
              f"(vp8l chunk at {webp.find(b'VP8L')})")
    # Lossy fixture: genuine VP8 (not VP8L) stream for container-walk and
    # decode-report tests. Expected pixels come from libwebp's own decode.
    w, h = 64, 48
    rgba = img_gradient(w, h)
    lossy = encode_lossy(w, h, rgba)
    dw, dh, back = decode(lossy)
    assert (dw, dh) == (w, h)
    with open(os.path.join(OUT, "lossy_gradient.webp"), "wb") as f:
        f.write(lossy)
    with open(os.path.join(OUT, "lossy_gradient.argb"), "wb") as f:
        f.write(struct.pack(">II", w, h))
        f.write(rgba_to_argb_be(back))
    print(f"lossy_gradient: {w}x{h}, webp {len(lossy)}B "
          f"(VP8 chunk at {lossy.find(b'VP8 ')}, "
          f"VP8L at {lossy.find(b'VP8L')})")


if __name__ == "__main__":
    sys.exit(main())

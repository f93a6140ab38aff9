#!/usr/bin/env python3
"""Generate lossy-VP8 conformance fixtures: real WebPEncodeRGBA output plus
the system libwebp's own decoded YUV420 planes as the pixel-exact oracle.

The YUV planes (WebPDecodeYUV) are the RFC 6386 conformance boundary —
VP8 decoding is bit-exact by spec, while RGB conversion/upsampling is a
post-codec choice. graft's Vp8Spec asserts our from-scratch decoder
reproduces every plane byte-for-byte.

.yuv layout: BE int32 w, h, then Y (w*h bytes), U, V (ceil(w/2)*ceil(h/2)
bytes each), packed row-major without stride padding.

Run from repo root: python3 tools/make_vp8_fixtures.py
"""
import ctypes
import os
import struct
import sys

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
LIB.WebPEncodeRGBA.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "webp")


def encode_lossy(w, h, rgba, q):
    out = ctypes.c_void_p()
    n = LIB.WebPEncodeRGBA(bytes(rgba), w, h, w * 4, float(q),
                           ctypes.byref(out))
    assert n > 0
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def decode_yuv(webp):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_ubyte)(); v = ctypes.POINTER(ctypes.c_ubyte)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = LIB.WebPDecodeYUV(webp, len(webp), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    assert y, "yuv decode failed"
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yp = bytearray(); up = bytearray(); vp = bytearray()
    ybuf = ctypes.string_at(y, S * H)
    for r in range(H):
        yp += ybuf[r * S:r * S + W]
    ubuf = ctypes.string_at(u, US * ch)
    vbuf = ctypes.string_at(v, US * ch)
    for r in range(ch):
        up += ubuf[r * US:r * US + cw]
        vp += vbuf[r * US:r * US + cw]
    LIB.WebPFree(ctypes.cast(y, ctypes.c_void_p))
    return W, H, bytes(yp), bytes(up), bytes(vp)


def img_gradient(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 255 // max(1, w - 1)),
                         (y * 255 // max(1, h - 1)),
                         ((x * x + y * y) * 7 // 10) % 256, 255))
    return px


def img_photo(w, h):
    px = bytearray()
    s = 123456789
    for y in range(h):
        for x in range(w):
            s = (s * 1103515245 + 12345) & 0x7FFFFFFF
            n = (s >> 16) & 0x3F
            px += bytes(((128 + (x * 3 + y) % 97 + n) % 256,
                         (64 + (x + y * 5) % 131 + ((s >> 8) & 0x1F)) % 256,
                         (200 + (x * y) % 53 + (s & 0x0F)) % 256, 255))
    return px


def main():
    os.makedirs(OUT, exist_ok=True)
    cases = [
        ("vp8_grad_q75", 64, 48, img_gradient, 75),
        ("vp8_grad_q95", 63, 47, img_gradient, 95),
        ("vp8_photo_q50", 63, 47, img_photo, 50),
        ("vp8_photo_q95", 33, 17, img_photo, 95),
        ("vp8_photo_q1", 64, 48, img_photo, 1),
        ("vp8_photo_q75", 128, 96, img_photo, 75),
    ]
    for name, w, h, fn, q in cases:
        webp = encode_lossy(w, h, fn(w, h), q)
        W, H, yp, up, vp = decode_yuv(webp)
        assert (W, H) == (w, h)
        with open(os.path.join(OUT, name + ".webp"), "wb") as f:
            f.write(webp)
        with open(os.path.join(OUT, name + ".yuv"), "wb") as f:
            f.write(struct.pack(">II", w, h))
            f.write(yp); f.write(up); f.write(vp)
        print(f"{name}: {w}x{h} q={q} webp={len(webp)}B")
    # oracle planes for the real-world CPython VP8X file too
    pyw = open("/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
               "test_email/data/python.webp", "rb").read()
    W, H, yp, up, vp = decode_yuv(pyw)
    with open(os.path.join(OUT, "python_vp8x_lossy.yuv"), "wb") as f:
        f.write(struct.pack(">II", W, H))
        f.write(yp); f.write(up); f.write(vp)
    print(f"python_vp8x_lossy: {W}x{H} (real-world VP8X+VP8)")


if __name__ == "__main__":
    sys.exit(main())

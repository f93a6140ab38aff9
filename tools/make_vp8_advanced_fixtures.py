#!/usr/bin/env python3
"""Advanced-API lossy-VP8 conformance fixtures: drive the system libwebp's
WebPEncode (WebPConfig + WebPPicture) to force encoder modes the simple
WebPEncodeRGBA API never emits — the SIMPLE in-loop filter
(filter_type=0), MULTIPLE token partitions (partitions=3 -> 8), filter
sharpness, and autofilter — so graft's Vp8 decoder is conformance-tested
on those paths too (all seven original fixtures use the normal filter
with nparts=1).

Struct layouts are transcribed from the PUBLIC libwebp 1.2.x
src/webp/encode.h; WebPConfigInitInternal/WebPPictureInitInternal
validate the ABI version (0x020f), so a layout mismatch fails loudly
rather than corrupting memory.

Writes vp8_adv_*.webp + .yuv (same layout as make_vp8_fixtures.py) into
src/test/resources/webp/.  Run from repo root.
"""
import ctypes
import os
import struct

LIB = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libwebp.so.7")
ABI = 0x020F


class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", ctypes.c_int), ("quality", ctypes.c_float),
        ("method", ctypes.c_int), ("image_hint", ctypes.c_int),
        ("target_size", ctypes.c_int), ("target_PSNR", ctypes.c_float),
        ("segments", ctypes.c_int), ("sns_strength", ctypes.c_int),
        ("filter_strength", ctypes.c_int), ("filter_sharpness", ctypes.c_int),
        ("filter_type", ctypes.c_int), ("autofilter", ctypes.c_int),
        ("alpha_compression", ctypes.c_int), ("alpha_filtering", ctypes.c_int),
        ("alpha_quality", ctypes.c_int), ("pass_", ctypes.c_int),
        ("show_compressed", ctypes.c_int), ("preprocessing", ctypes.c_int),
        ("partitions", ctypes.c_int), ("partition_limit", ctypes.c_int),
        ("emulate_jpeg_size", ctypes.c_int), ("thread_level", ctypes.c_int),
        ("low_memory", ctypes.c_int), ("near_lossless", ctypes.c_int),
        ("exact", ctypes.c_int), ("use_delta_palette", ctypes.c_int),
        ("use_sharp_yuv", ctypes.c_int), ("qmin", ctypes.c_int),
        ("qmax", ctypes.c_int)]


WriterFn = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
                            ctypes.c_size_t, ctypes.c_void_p)


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", ctypes.c_int), ("colorspace", ctypes.c_int),
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("y", ctypes.c_void_p), ("u", ctypes.c_void_p), ("v", ctypes.c_void_p),
        ("y_stride", ctypes.c_int), ("uv_stride", ctypes.c_int),
        ("a", ctypes.c_void_p), ("a_stride", ctypes.c_int),
        ("pad1", ctypes.c_uint32 * 2),
        ("argb", ctypes.c_void_p), ("argb_stride", ctypes.c_int),
        ("pad2", ctypes.c_uint32 * 3),
        ("writer", WriterFn), ("custom_ptr", ctypes.c_void_p),
        ("extra_info_type", ctypes.c_int), ("extra_info", ctypes.c_void_p),
        ("stats", ctypes.c_void_p), ("error_code", ctypes.c_int),
        ("progress_hook", ctypes.c_void_p), ("user_data", ctypes.c_void_p),
        ("pad3", ctypes.c_uint32 * 3),
        ("pad4", ctypes.c_void_p), ("pad5", ctypes.c_void_p),
        ("pad6", ctypes.c_uint32 * 8),
        ("memory_", ctypes.c_void_p), ("memory_argb_", ctypes.c_void_p),
        ("pad7", ctypes.c_void_p * 2)]


LIB.WebPConfigInitInternal.restype = ctypes.c_int
LIB.WebPConfigInitInternal.argtypes = [ctypes.POINTER(WebPConfig),
                                       ctypes.c_int, ctypes.c_float,
                                       ctypes.c_int]
LIB.WebPPictureInitInternal.restype = ctypes.c_int
LIB.WebPPictureInitInternal.argtypes = [ctypes.POINTER(WebPPicture),
                                        ctypes.c_int]
LIB.WebPPictureImportRGBA.restype = ctypes.c_int
LIB.WebPPictureImportRGBA.argtypes = [ctypes.POINTER(WebPPicture),
                                      ctypes.c_char_p, ctypes.c_int]
LIB.WebPEncode.restype = ctypes.c_int
LIB.WebPEncode.argtypes = [ctypes.POINTER(WebPConfig),
                           ctypes.POINTER(WebPPicture)]
LIB.WebPPictureFree.argtypes = [ctypes.POINTER(WebPPicture)]
LIB.WebPValidateConfig.restype = ctypes.c_int
LIB.WebPValidateConfig.argtypes = [ctypes.POINTER(WebPConfig)]

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test",
                   "resources", "webp")

chunks = []


@WriterFn
def collect(data, size, _pic):
    chunks.append(ctypes.string_at(data, size))
    return 1


def encode_adv(w, h, rgba, q, **cfg_overrides):
    cfg = WebPConfig()
    assert LIB.WebPConfigInitInternal(ctypes.byref(cfg), 0, float(q), ABI), \
        "config init failed (ABI mismatch?)"
    for k, v in cfg_overrides.items():
        setattr(cfg, k, v)
    assert LIB.WebPValidateConfig(ctypes.byref(cfg)), f"bad config {cfg_overrides}"
    pic = WebPPicture()
    assert LIB.WebPPictureInitInternal(ctypes.byref(pic), ABI), \
        "picture init failed (ABI mismatch?)"
    pic.width = w
    pic.height = h
    pic.use_argb = 0  # YUV input path, like WebPEncodeRGBA
    assert LIB.WebPPictureImportRGBA(ctypes.byref(pic), bytes(rgba), w * 4)
    chunks.clear()
    pic.writer = collect
    ok = LIB.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    err = pic.error_code
    LIB.WebPPictureFree(ctypes.byref(pic))
    assert ok, f"encode failed: error_code={err} cfg={cfg_overrides}"
    return b"".join(chunks)


# --- decode via the same helper as make_vp8_fixtures.py
LIB.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_ubyte)
LIB.WebPDecodeYUV.argtypes = [
    ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
LIB.WebPFree.argtypes = [ctypes.c_void_p]


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
    yp = bytearray()
    up = bytearray()
    vp = bytearray()
    ybuf = ctypes.string_at(y, S * H)
    for r in range(H):
        yp += ybuf[r * S:r * S + W]
    ubuf = ctypes.string_at(u, US * ch)
    vbuf = ctypes.string_at(v, US * ch)
    for r in range(ch):
        up += ubuf[r * US:r * US + cw]
        vp += vbuf[r * US:r * US + cw]
    LIB.WebPFree(y)
    return W, H, bytes(yp), bytes(up), bytes(vp)


def photo(w, h):
    # the same deterministic photo-ish pattern family as make_vp8_fixtures
    rgba = bytearray()
    for yy in range(h):
        for xx in range(w):
            r = (xx * 255 // max(w - 1, 1) + (xx * yy) % 37) % 256
            g = (yy * 255 // max(h - 1, 1) + (xx * 7) % 29) % 256
            b = ((xx + yy) * 3 + (xx * xx + yy) % 53) % 256
            rgba += bytes((r, g, b, 255))
    return rgba


def emit(name, webp):
    with open(os.path.join(OUT, name + ".webp"), "wb") as f:
        f.write(webp)
    W, H, yp, up, vp = decode_yuv(webp)
    with open(os.path.join(OUT, name + ".yuv"), "wb") as f:
        f.write(struct.pack(">ii", W, H) + yp + up + vp)
    print(f"{name}: {W}x{H} webp={len(webp)}B")


img = photo(80, 56)
# simple in-loop filter (filter_type=0) at a strength that actually bites
emit("vp8_adv_simplefilter",
     encode_adv(80, 56, img, 60, filter_type=0, filter_strength=80,
                autofilter=0))
# 8 token partitions (partitions=3): the nparts>1 demux path. libwebp
# honors config.partitions only in its non-token-buffer loop (method <=
# 2; measured: at the default method=4 the output is byte-identical for
# partitions 0..3), so pin method=2
emit("vp8_adv_parts8",
     encode_adv(256, 144, photo(256, 144), 75, partitions=3, method=2))
# autofilter + sharpness: exercises filter-sharpness clamping tables
emit("vp8_adv_sharp",
     encode_adv(80, 56, img, 40, autofilter=1, filter_sharpness=5))
# simple filter AND multi-partition together, unaligned dims (method=2
# so partitions bites; 4 partitions over a 4x3-MB image also exercises
# the mb_y % nparts row mapping with nparts > mb rows per stripe)
img2 = photo(61, 45)
emit("vp8_adv_simple_parts",
     encode_adv(61, 45, img2, 30, filter_type=0, filter_strength=100,
                filter_sharpness=2, partitions=2, method=2))

#!/usr/bin/env python3
"""Generate lossy-WebP (VP8 intra) conformance fixtures with the REAL
libwebp encoder, and capture libwebp's own decoded YUV planes as the
ground truth Vp8Spec pins against.

Why YUV and not RGB: VP8 normatively defines the reconstructed 4:2:0
Y/U/V planes (prediction + dequant + inverse transforms + loop
filter); the upsampling and YUV->RGB conversion are application
choices outside the bitstream spec. Comparing tight visible-crop YUV
planes makes the test a true bitstream-conformance gate.

Output per fixture: <name>.webp and <name>.yuv, the latter laid out
  "VP8Y" magic | le32 width | le32 height
  Y plane (width*height) | U plane (cw*ch) | V plane (cw*ch)
with cw=(width+1)//2, ch=(height+1)//2.
"""
import ctypes
import math
import os
import struct

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                              ctypes.c_int, ctypes.c_float,
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                              ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.restype = None
lib.WebPFree.argtypes = [ctypes.c_void_p]

OUT = "src/test/resources/graft/vp8"
os.makedirs(OUT, exist_ok=True)


def encode(rgb: bytes, w: int, h: int, q: float) -> bytes:
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, q, ctypes.byref(out))
    if n == 0:
        raise SystemExit("WebPEncodeRGB failed")
    buf = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return buf


def decode_yuv(webp: bytes):
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int(); uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(webp, len(webp), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v),
                          ctypes.byref(stride), ctypes.byref(uv_stride))
    if not y:
        raise SystemExit("WebPDecodeYUV failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    # copy strided planes to tight buffers
    ytight = b"".join(ctypes.string_at(ctypes.addressof(y.contents) + r * stride.value, W)
                      for r in range(H))
    utight = b"".join(ctypes.string_at(ctypes.addressof(u.contents) + r * uv_stride.value, cw)
                      for r in range(ch))
    vtight = b"".join(ctypes.string_at(ctypes.addressof(v.contents) + r * uv_stride.value, cw)
                      for r in range(ch))
    lib.WebPFree(y)
    return W, H, ytight, utight, vtight


def rgb_image(w, h, fn):
    px = bytearray(w * h * 3)
    for yy in range(h):
        for xx in range(w):
            r, g, b = fn(xx, yy)
            i = (yy * w + xx) * 3
            px[i] = r & 0xff; px[i + 1] = g & 0xff; px[i + 2] = b & 0xff
    return bytes(px)


def det_noise(x, y):
    v = (x * 2654435761 + y * 40503) & 0xffffffff
    v ^= v >> 13
    return (v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff)


FIXTURES = [
    ("flat_gray_64x48_q75", 64, 48, 75.0, lambda x, y: (128, 128, 128)),
    ("hgrad_80x60_q75", 80, 60, 75.0, lambda x, y: (x * 3, x * 3, x * 3)),
    ("colorgrad_48x48_q90", 48, 48, 90.0, lambda x, y: (x * 5, y * 5, 255 - x * 5)),
    ("noise_33x17_q50", 33, 17, 50.0, det_noise),
    ("waves_128x96_q50", 128, 96, 50.0,
     lambda x, y: (int(127 + 120 * math.sin(x * 0.11)),
                   int(127 + 120 * math.sin(y * 0.07)),
                   int(127 + 120 * math.sin((x + y) * 0.05)))),
    ("checker_64x64_q20", 64, 64, 20.0,
     lambda x, y: ((255, 255, 255) if ((x // 4) + (y // 4)) % 2 == 0 else (0, 0, 60))),
    ("single_mb_16x16_q75", 16, 16, 75.0, lambda x, y: (x * 16, y * 16, 128)),
    ("one_px_1x1_q75", 1, 1, 75.0, lambda x, y: (200, 30, 90)),
    ("photo_320x240_q75", 320, 240, 75.0,
     lambda x, y: (int(127 + 100 * math.sin(x * 0.02) * math.cos(y * 0.03)),
                   int(127 + 100 * math.sin((x - y) * 0.015)),
                   int(40 + (x * y) % 180))),
    ("extreme_q5_96x64", 96, 64, 5.0,
     lambda x, y: det_noise(x // 3, y // 3)),
    ("near_lossless_q100_40x40", 40, 40, 100.0,
     lambda x, y: ((x * 7) & 0xff, (y * 11) & 0xff, ((x ^ y) * 5) & 0xff)),
]

for name, w, h, q, fn in FIXTURES:
    rgb = rgb_image(w, h, fn)
    webp = encode(rgb, w, h, q)
    W, H, Y, U, V = decode_yuv(webp)
    assert (W, H) == (w, h), (name, W, H)
    open(f"{OUT}/{name}.webp", "wb").write(webp)
    with open(f"{OUT}/{name}.yuv", "wb") as f:
        f.write(b"VP8Y" + struct.pack("<II", W, H) + Y + U + V)
    print(f"{name}: webp={len(webp)}B")
print("done")

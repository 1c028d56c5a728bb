#!/usr/bin/env python3
"""Encoder conformance cross-check (dev tool): decode the Scala VP8
encoder's output (dumped by graft.tools dev mains or Vp8Spec's debug
dump) with the system libwebp and require byte-exact agreement with
the Scala decoder's own reconstruction. Run:

    sbt "runMain graft.tools.Vp8EncProbe"   # writes /tmp/vp8enc/*
    python3 tools/check_vp8_enc.py

Last run (round 15): 12/12 exact across flat/grad/noise/waves at
qIndex 0/8/40 - the minimal encoder emits streams the reference
decoder reconstructs identically, so the committed my-encoder
round-trip tests in Vp8Spec measure real conformance, not a
mirrored convention.
"""
import ctypes, struct, glob, os, sys

lib = ctypes.CDLL("libwebp.so.7")
lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.restype = None
lib.WebPFree.argtypes = [ctypes.c_void_p]

ok = tot = 0
for f in sorted(glob.glob("/tmp/vp8enc/*.webp")):
    data = open(f, "rb").read()
    w = ctypes.c_int(); h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)(); v = ctypes.POINTER(ctypes.c_uint8)()
    st = ctypes.c_int(); uvst = ctypes.c_int()
    y = lib.WebPDecodeYUV(data, len(data), ctypes.byref(w), ctypes.byref(h),
                          ctypes.byref(u), ctypes.byref(v), ctypes.byref(st), ctypes.byref(uvst))
    tot += 1
    if not y:
        print(os.path.basename(f), "LIBWEBP REFUSED"); continue
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    Y = b"".join(ctypes.string_at(ctypes.addressof(y.contents) + r * st.value, W) for r in range(H))
    U = b"".join(ctypes.string_at(ctypes.addressof(u.contents) + r * uvst.value, cw) for r in range(ch))
    V = b"".join(ctypes.string_at(ctypes.addressof(v.contents) + r * uvst.value, cw) for r in range(ch))
    lib.WebPFree(y)
    mine = open(f[:-5] + ".yuv", "rb").read()
    mw, mh = struct.unpack_from("<II", mine, 4)
    assert (mw, mh) == (W, H), (f, mw, mh, W, H)
    my = mine[12:12 + W * H]; mu = mine[12 + W * H:12 + W * H + cw * ch]; mv = mine[12 + W * H + cw * ch:]
    same = (my == Y and mu == U and mv == V)
    if same: ok += 1
    print(os.path.basename(f), "EXACT" if same else "DIFF")
print(f"{ok}/{tot} exact")
sys.exit(0 if ok == tot else 1)

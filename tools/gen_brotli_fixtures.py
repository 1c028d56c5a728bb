#!/usr/bin/env python3
"""Brotli conformance fixtures: real libbrotlienc streams (qualities
0/1/5/9/11 x window sizes, text/HTML/JSON/binary content including
dictionary-word-rich text that forces static-dictionary references and
transforms) paired with the exact payloads. BrotliSpec requires the
Scala decoder to reproduce every payload byte-exactly."""
import ctypes
import math
import os

enc = ctypes.CDLL("libbrotlienc.so.1")
enc.BrotliEncoderCompress.restype = ctypes.c_int
enc.BrotliEncoderCompress.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_size_t, ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]

OUT = "src/test/resources/graft/brotli"
os.makedirs(OUT, exist_ok=True)


def compress(data: bytes, quality: int, lgwin: int, mode: int = 0) -> bytes:
    out = ctypes.create_string_buffer(len(data) * 2 + 1024)
    n = ctypes.c_size_t(len(out))
    ok = enc.BrotliEncoderCompress(quality, lgwin, mode, len(data), data, ctypes.byref(n), out)
    assert ok == 1, "encode failed"
    return out.raw[:n.value]


html = ("<!DOCTYPE html><html><head><title>The quick brown fox</title></head><body>" +
        "".join(f"<p class='para'>Paragraph {i} about the state of the world and the "
                f"development of the public description of information.</p>" for i in range(80)) +
        "</body></html>").encode()

json_doc = ("[" + ",".join(
    f'{{"id":{i},"name":"user_{i}","active":{str(i % 2 == 0).lower()},'
    f'"score":{(i * 37) % 100},"tags":["alpha","beta","gamma"]}}'
    for i in range(200)) + "]").encode()

# dictionary-word-heavy prose: common English words the appendix-A
# dictionary carries, with sentence-case and suffixes to trigger
# transforms (UppercaseFirst, suffix " of the ", etc.)
prose = (" ".join(
    "The development of the government. Because of the description of the "
    "information about the different people, there were many important "
    "questions concerning the performance of the system and the experience "
    "of the community.".split()) * 40).encode()

binary = bytes(((i * 2654435761) >> 7) & 0xff for i in range(50000))

rle = b"a" * 30000 + b"b" * 200 + b"a" * 30000

utf8 = ("Längere Wörter über die Straße — " * 500 + "日本語のテキストです。" * 300).encode()

FIXTURES = [
    ("html_q5_w22", html, 5, 22),
    ("html_q11_w22", html, 11, 22),
    ("json_q9_w20", json_doc, 9, 20),
    ("json_q1_w18", json_doc, 1, 18),
    ("prose_q11_w22", prose, 11, 22),
    ("prose_q0_w10", prose, 0, 10),
    ("binary_q5_w24", binary, 5, 24),
    ("rle_q9_w16", rle, 9, 16),
    ("utf8_q11_w21", utf8, 11, 21),
    ("empty_q5_w22", b"", 5, 22),
    ("tiny_q11_w10", b"hi", 11, 10),
    # text mode (mode=1) biases toward dictionary/transform use
    ("prose_text_q10_w22", prose, 10, 22),
]

for name, data, q, w in FIXTURES:
    br = compress(data, q, w, mode=1 if "text" in name else 0)
    open(f"{OUT}/{name}.br", "wb").write(br)
    open(f"{OUT}/{name}.bin", "wb").write(data)
    print(f"{name}: {len(data)} -> {len(br)} bytes")
print("done")

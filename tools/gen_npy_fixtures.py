#!/usr/bin/env python3
"""Generate .npy/.npz conformance fixtures with REAL numpy 1.26.

Matrix: every supported dtype (bool, i1..i8, u1..u4, f2/f4/f8, S6, U5),
both byte orders, C and Fortran memory order (2-D and 3-D), header
versions 1/2/3, a 0-length array, a 0-d scalar, and .npz archives both
stored (np.savez) and deflated (np.savez_compressed). Values are
deterministic formulas of the element index so NpySpec recomputes them.
Every fixture is re-read by numpy at capture time (self-check)."""
import io
import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "npy")
os.makedirs(OUT, exist_ok=True)


def save(name, arr, version=None):
    path = os.path.join(OUT, name)
    if version is None:
        np.save(path, arr)
        path += ".npy"
    else:
        with open(path + ".npy", "wb") as f:
            np.lib.format.write_array(f, arr, version=version)
        path += ".npy"
    back = np.load(path)
    assert np.array_equal(back, arr, equal_nan=False), name
    assert back.dtype == arr.dtype, name
    print(name, "ok", os.path.getsize(path), arr.dtype.str, arr.shape)


def main():
    n = 17
    idx = np.arange(n)
    save("b1", (idx % 3 == 0))
    save("i1", ((idx * 7 - 20) % 256 - 128).astype(np.int8))
    save("i2", (idx * 1001 - 4000).astype(np.int16))
    save("i4", (idx * 100000 - 350000).astype(np.int32))
    save("i8", (idx * 123456789 - 400000000).astype(np.int64))
    save("u1", ((idx * 29) % 256).astype(np.uint8))
    save("u2", ((idx * 7001) % 65536).astype(np.uint16))
    save("u4", ((idx * 900000007) % 4294967296).astype(np.uint32))
    save("f2", (idx * 0.25 - 2.0).astype(np.float16))
    save("f4", (idx * 1.5 - 3.0).astype(np.float32))
    save("f8", (idx * 2.25 - 9.0).astype(np.float64))
    save("s6", np.array([f"s{i}x".encode() for i in range(n)], dtype="S6"))
    save("u5", np.array([f"ü{i}" for i in range(n)], dtype="U5"))
    save("be_i4", (idx * 100000 - 350000).astype(">i4"))
    save("be_f8", (idx * 2.25 - 9.0).astype(">f8"))
    m2 = (np.arange(20).reshape(4, 5) * 3 - 7).astype(np.float64)
    save("c2d", m2)
    save("f2d", np.asfortranarray(m2))
    m3 = (np.arange(24).reshape(2, 3, 4) * 11 - 50).astype(np.int32)
    save("c3d", m3)
    save("f3d", np.asfortranarray(m3))
    save("v2", (idx * 5 - 8).astype(np.int64), version=(2, 0))
    save("v3", (idx * 5 - 8).astype(np.int64), version=(3, 0))
    save("len0", np.zeros(0, dtype=np.float32))
    save("scalar", np.float64(42.5))

    ids = (np.arange(30) * 13 + 5).astype(np.int64)
    emb = (np.arange(30 * 8).reshape(30, 8) * 0.5 - 10).astype(np.float32)
    for name, fn in [("arch_stored", np.savez), ("arch_deflate", np.savez_compressed)]:
        path = os.path.join(OUT, name + ".npz")
        buf = io.BytesIO()
        fn(buf, ids=ids, emb=emb)
        open(path, "wb").write(buf.getvalue())
        back = np.load(path)
        assert np.array_equal(back["ids"], ids) and np.array_equal(back["emb"], emb), name
        print(name, "ok", os.path.getsize(path))


if __name__ == "__main__":
    main()

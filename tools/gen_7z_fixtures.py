#!/usr/bin/env python3
"""Generate 7z conformance fixtures with REAL libarchive (bsdtar 3.8.2,
the bsdtar shipped in this container). One archive per payload codec
bsdtar's 7zip writer supports (store/copy/deflate/bzip2/lzma1/lzma2 —
ppmd is captured too but our reader REFUSES it by design), plus a
many-file archive, unicode names, empty files and a directory entry.
Each <name>.7z ships with <name>.json of {entry: sha256} so the spec
verifies decoded bytes. bsdtar round-trips every archive at capture.
"""
import hashlib, json, os, shutil, subprocess, tempfile

BSDTAR = "/root/miniconda/bin/bsdtar"
OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "sevenzip")
os.makedirs(OUT, exist_ok=True)

def payload(tag, n):
    return ("\n".join(f'{{"t":"{tag}","i":{i},"pad":"{"x" * (i % 37)}"}}' for i in range(n)) + "\n").encode()

def prng(seed, n):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])

def build(name, files, opts):
    tree = tempfile.mkdtemp()
    manifest = {}
    for fname, data in files:
        p = os.path.join(tree, fname)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        open(p, "wb").write(data)
        manifest[fname] = hashlib.sha256(data).hexdigest()
    arc = os.path.join(OUT, name + ".7z")
    cmd = [BSDTAR, "--format", "7zip"]
    if opts:
        cmd += ["--options", opts]
    cmd += ["-cf", arc, "-C", tree] + [f for f, _ in files]
    subprocess.run(cmd, check=True)
    # round-trip sanity through bsdtar itself
    back = tempfile.mkdtemp()
    subprocess.run([BSDTAR, "-xf", arc, "-C", back], check=True)
    for fname, data in files:
        assert open(os.path.join(back, fname), "rb").read() == data, (name, fname)
    open(os.path.join(OUT, name + ".json"), "w").write(json.dumps(manifest))
    shutil.rmtree(tree); shutil.rmtree(back)
    print(name, "ok", os.path.getsize(arc), len(manifest))

base = [("a.json", payload("a", 400)), ("deep/nested/b.json", payload("b", 300)),
        ("uni-é中.txt", payload("u", 50)), ("empty.bin", b""), ("rnd.bin", prng("7zrnd", 60000))]
for codec in ["store", "copy", "deflate", "bzip2", "lzma1", "lzma2", "ppmd"]:
    build(f"codec_{codec}", base, f"7zip:compression={codec}")
build("many", [(f"docs/doc_{i:04d}.json", payload(f"d{i}", 4 + i % 17)) for i in range(250)],
      "7zip:compression=lzma2")
build("default", base, None)

#!/usr/bin/env python3
"""Generate ZIP conformance fixtures with REAL python-zipfile.

Variants: stored + deflated entries, an archive comment, forced ZIP64
(central fields saturated via force_zip64 streaming writes), many-entry
archive, unicode names, and an empty archive. Each <name>.zip ships
with <name>.json describing {entry name: sha256 of payload} so the spec
verifies decoded bytes without committing payloads twice.
"""
import hashlib, io, json, os, zipfile

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "zip")

def payload(tag, n):
    return ("\n".join(f'{{"t":"{tag}","i":{i},"pad":"{"x" * (i % 37)}"}}' for i in range(n)) + "\n").encode()

def write(name, builder):
    buf = io.BytesIO()
    manifest = builder(buf)
    data = buf.getvalue()
    # sanity: python reads its own archive
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for n2, h in manifest.items():
            assert hashlib.sha256(z.read(n2)).hexdigest() == h, (name, n2)
    open(os.path.join(OUT, name + ".zip"), "wb").write(data)
    open(os.path.join(OUT, name + ".json"), "w").write(json.dumps(manifest))
    print(name, "ok", len(data), len(manifest))

def basic(buf):
    m = {}
    with zipfile.ZipFile(buf, "w") as z:
        for i, (n, meth) in enumerate([("a.json", zipfile.ZIP_DEFLATED), ("b/stored.bin", zipfile.ZIP_STORED),
                                       ("c/deep/path.txt", zipfile.ZIP_DEFLATED), ("uni-é中.txt", zipfile.ZIP_DEFLATED)]):
            data = payload(n, 200 + i * 50)
            z.writestr(zipfile.ZipInfo(n), data, meth)
            m[n] = hashlib.sha256(data).hexdigest()
        z.comment = b"graft zip conformance fixture"
    return m

def zip64(buf):
    m = {}
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(3):
            n = f"z64_{i}.json"
            data = payload(n, 500)
            # force_zip64 streams the entry: ZIP64 extras + data descriptor
            with z.open(zipfile.ZipInfo(n), "w", force_zip64=True) as f:
                f.write(data)
            m[n] = hashlib.sha256(data).hexdigest()
    return m

def many(buf):
    m = {}
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for i in range(400):
            n = f"docs/doc_{i:05d}.json"
            data = payload(n, 5 + i % 20)
            z.writestr(n, data)
            m[n] = hashlib.sha256(data).hexdigest()
    return m

def empty(buf):
    with zipfile.ZipFile(buf, "w"):
        pass
    return {}

write("basic", basic)
write("zip64", zip64)
write("many", many)
write("empty", empty)

# ---------------------------------------------------------------------
# r17: compression methods beyond stored/deflate.
# bzip2 (12) and LZMA (14) come straight from python-zipfile (CPython
# writes both natively). zstd (93, APPNOTE 6.3.7) has no in-container
# zip producer, so the fixture is hand-assembled per the spec: the
# compressed payload is a REAL `zstd` CLI frame and the container
# fields mirror python-zipfile's stored-entry layout with method=93 and
# the frame's length as csize (CRC/usize are over the uncompressed
# bytes, unchanged). Provenance of every byte is therefore a conforming
# implementation or the published APPNOTE layout.
import struct, subprocess, zlib

def methods(buf):
    m = {}
    with zipfile.ZipFile(buf, "w") as z:
        for i, (n, meth) in enumerate([("bz/a.json", zipfile.ZIP_BZIP2), ("bz/b.json", zipfile.ZIP_BZIP2),
                                       ("lzma/a.json", zipfile.ZIP_LZMA), ("lzma/b.json", zipfile.ZIP_LZMA)]):
            data = payload(n, 300 + i * 70)
            z.writestr(zipfile.ZipInfo(n), data, meth)
            m[n] = hashlib.sha256(data).hexdigest()
    return m

write("methods", methods)

def zstd_member(name, data):
    frame = subprocess.run(["zstd", "-19", "-c"], input=data, capture_output=True, check=True).stdout
    crc = zlib.crc32(data) & 0xffffffff
    nb = name.encode()
    local = struct.pack("<IHHHHHIIIHH", 0x04034b50, 63, 0, 93, 0, 0, crc, len(frame), len(data), len(nb), 0) + nb
    central = struct.pack("<IHHHHHHIIIHHHHHII", 0x02014b50, 63, 63, 0, 93, 0, 0, crc,
                          len(frame), len(data), len(nb), 0, 0, 0, 0, 0, 0) + nb
    return local + frame, central, hashlib.sha256(data).hexdigest()

def zstd93():
    m = {}
    body = b""
    centrals = []
    for i in range(3):
        n = f"zs/doc_{i}.json"
        data = payload(n, 400 + i * 100)
        local, central, h = zstd_member(n, data)
        centrals.append((central, len(body)))
        body += local
        m[n] = h
    cd = b""
    for central, off in centrals:
        # local-header offset sits at bytes 42..46 of the fixed part
        cd += central[:42] + struct.pack("<I", off) + central[46:]
    eocd = struct.pack("<IHHHHIIH", 0x06054b50, 0, 0, len(centrals), len(centrals), len(cd), len(body), 0)
    blob = body + cd + eocd
    open(os.path.join(OUT, "zstd93.zip"), "wb").write(blob)
    open(os.path.join(OUT, "zstd93.json"), "w").write(json.dumps(m))
    print("zstd93 ok", len(blob), len(m))

zstd93()

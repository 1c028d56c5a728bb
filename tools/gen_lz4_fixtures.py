#!/usr/bin/env python3
"""Generate LZ4 conformance fixtures with the REAL lz4 CLI (v1.9.4).

Payloads: compressible jsonl, repetitive text (cross-block matches for
the -BD dependent case), incompressible prng bytes (stored blocks),
tiny and empty inputs. Variants cover block sizes 4..7, dependent
blocks, block checksums, no-frame-crc, -9 (HC sequences), the legacy
format, concatenated frames, and a leading skippable frame (crafted —
the spec allows it; the CLI skips it on decode, verified below).
Outputs <name>.lz4 + <name>.bin pairs into src/test/resources/graft/lz4.
"""
import hashlib, os, struct, subprocess

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "lz4")

def prng(seed, n):
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return bytes(out[:n])

jsonl = ("\n".join('{"id":%d,"w":"w%d","t":"doc text %d"}' % (i, i % 83, i) for i in range(9000)) + "\n").encode()
rep = (b"the quick brown fox jumps over the lazy dog %d\n" * 1) * 1
rep = b"".join(b"prefix %05d the quick brown fox jumps over the lazy dog\n" % (i % 7) for i in range(6000))
rnd = prng("lz4rnd", 300000)
tiny = b"x"
empty = b""

cases = [
    ("jsonl_b7",      jsonl, ["-z", "-B7"]),
    ("jsonl_b4",      jsonl, ["-z", "-B4"]),          # many 64 KiB blocks
    ("rep_b4_dep",    rep,   ["-z", "-B4", "-BD"]),   # matches cross block bounds
    ("jsonl_b5_bx",   jsonl, ["-z", "-B5", "-BX"]),   # block checksums
    ("jsonl_nocrc",   jsonl, ["-z", "--no-frame-crc"]),
    ("jsonl_hc9",     jsonl, ["-z", "-9"]),           # HC sequences
    ("rnd_b6",        rnd,   ["-z", "-B6"]),          # stored (incompressible) blocks
    ("jsonl_legacy",  jsonl, ["-z", "-l"]),
    ("tiny",          tiny,  ["-z"]),
    ("empty",         empty, ["-z"]),
]

for name, data, flags in cases:
    open(f"/tmp/lz4fix.raw", "wb").write(data)
    subprocess.run(["lz4", "-f", "-k"] + flags + ["/tmp/lz4fix.raw", f"/tmp/lz4fix_{name}.lz4"], check=True)
    enc = open(f"/tmp/lz4fix_{name}.lz4", "rb").read()
    # CLI round-trip sanity
    subprocess.run(["lz4", "-d", "-f", f"/tmp/lz4fix_{name}.lz4", "/tmp/lz4fix.back"], check=True)
    assert open("/tmp/lz4fix.back", "rb").read() == data, name
    open(os.path.join(OUT, name + ".lz4"), "wb").write(enc)
    open(os.path.join(OUT, name + ".bin"), "wb").write(data)
    print(name, "ok", len(enc))

# concatenated frames (legal multi-frame file) + a leading skippable frame
a = open(os.path.join(OUT, "jsonl_b7.lz4"), "rb").read()
b = open(os.path.join(OUT, "rnd_b6.lz4"), "rb").read()
skip = struct.pack("<II", 0x184D2A50, 6) + b"skipme"
concat = skip + a + b
open("/tmp/lz4fix_concat.lz4", "wb").write(concat)
subprocess.run(["lz4", "-d", "-f", "/tmp/lz4fix_concat.lz4", "/tmp/lz4fix.back"], check=True)
want = jsonl + rnd
assert open("/tmp/lz4fix.back", "rb").read() == want
open(os.path.join(OUT, "concat_skippable.lz4"), "wb").write(concat)
open(os.path.join(OUT, "concat_skippable.bin"), "wb").write(want)
print("concat_skippable ok", len(concat))

# ---------------------------------------------------------------------
# r17: dictionary frames (`lz4 -D`). The dictionary shares vocabulary
# with the payloads so matches genuinely reach into it (asserted below:
# decoding WITHOUT the dict fails). The CLI writes dict frames with NO
# Dictionary-ID field (FLG bit 0 clear) — the id-present path is
# crafted in-spec instead.
vocab = ["alpha","bravo","charlie","delta","echo","foxtrot","golf","hotel"]
dict_data = ("\n".join('{"key":"%s","n":%d,"tag":"shared-vocab"}' % (vocab[i % 8], i) for i in range(800)) + "\n").encode()
open(os.path.join(OUT, "dict.bin"), "wb").write(dict_data)
dict_payload = ("\n".join('{"key":"%s","n":%d,"tag":"shared-vocab"}' % (vocab[(i * 3) % 8], i + 50000) for i in range(6000)) + "\n").encode()
# >64 KiB dictionary: only the LAST 64 KiB participate (format window)
big_dict = prng("lz4bigdictpad", 80000) + dict_data
open(os.path.join(OUT, "dict_big.bin"), "wb").write(big_dict)

dict_cases = [
    ("dict_b4",  dict_payload, ["-z", "-B4"], "dict.bin"),
    ("dict_dep", dict_payload, ["-z", "-B4", "-BD"], "dict.bin"),
    ("dict_hc",  dict_payload, ["-z", "-9"], "dict.bin"),
    ("dict_bigd", dict_payload, ["-z", "-B4"], "dict_big.bin"),
]
for name, data, flags, dname in dict_cases:
    dpath = os.path.join(OUT, dname)
    open("/tmp/lz4fix.raw", "wb").write(data)
    subprocess.run(["lz4", "-f", "-k", "-D", dpath] + flags + ["/tmp/lz4fix.raw", f"/tmp/lz4fix_{name}.lz4"], check=True)
    enc = open(f"/tmp/lz4fix_{name}.lz4", "rb").read()
    subprocess.run(["lz4", "-d", "-f", "-D", dpath, f"/tmp/lz4fix_{name}.lz4", "/tmp/lz4fix.back"], check=True)
    assert open("/tmp/lz4fix.back", "rb").read() == data, name
    # the dict must be LOAD-BEARING: decode without it fails
    r = subprocess.run(["lz4", "-d", "-f", f"/tmp/lz4fix_{name}.lz4", "/tmp/lz4fix.back2"], capture_output=True)
    assert r.returncode != 0, f"{name}: dict not load-bearing"
    open(os.path.join(OUT, name + ".lz4"), "wb").write(enc)
    open(os.path.join(OUT, name + ".bin"), "wb").write(data)
    print(name, "ok", len(enc))

#!/usr/bin/env python3
"""Generate XZ BCJ-filter conformance fixtures with REAL liblzma.

Each payload is deterministic pseudo-code seeded per architecture,
salted with genuine branch-shaped instruction patterns so the filter
actually converts (verified below: the filtered stream must differ
from a plain-LZMA2 stream of the same payload). Python's lzma binding
covers x86/ppc/ia64/arm/armthumb/sparc; arm64 (no python constant)
goes through the xz CLI. Outputs <name>.xz + <name>.bin pairs into
src/test/resources/graft/xz/.
"""
import hashlib, lzma, os, struct, subprocess

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "xz")

def prng(seed: str, n: int) -> bytearray:
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}:{i}".encode()).digest()
        i += 1
    return out[:n]

def payload(arch: str, n=8192) -> bytes:
    b = prng("bcj:" + arch, n)
    # plant branch-shaped patterns on the filter's alignment
    for k in range(0, n - 20, 24):
        tgt = (k * 7919) & 0x7FFFF
        if arch == "x86":
            b[k] = 0xE8 if (k // 24) % 2 else 0xE9
            b[k+1:k+5] = struct.pack("<i", tgt if (k // 48) % 2 else -tgt)
        elif arch == "arm":
            a = k - (k % 4)
            b[a+3] = 0xEB
            b[a:a+3] = struct.pack("<I", tgt)[:3]
        elif arch == "armthumb":
            a = k - (k % 2)
            b[a+1] = 0xF0 | ((tgt >> 19) & 7)
            b[a] = (tgt >> 11) & 0xFF
            b[a+3] = 0xF8 | ((tgt >> 8) & 7)
            b[a+2] = tgt & 0xFF
        elif arch == "powerpc":
            a = k - (k % 4)
            b[a] = 0x48 | ((tgt >> 24) & 3)
            b[a+1] = (tgt >> 16) & 0xFF
            b[a+2] = (tgt >> 8) & 0xFF
            b[a+3] = (tgt & 0xFC) | 1
        elif arch == "sparc":
            a = k - (k % 4)
            b[a] = 0x40
            b[a+1] = (tgt >> 16) & 0x3F
            b[a+2] = (tgt >> 8) & 0xFF
            b[a+3] = tgt & 0xFF
        elif arch == "ia64":
            a = k - (k % 16)
            b[a] = 0x10  # template with branch slots
            # slot 2 (bits 87..127): opcode 5, imm20 = tgt, low bits clear
            inst = (5 << 37) | ((tgt & 0xFFFFF) << 13)
            bitpos = 5 + 2 * 41
            bytepos, bitres = bitpos >> 3, bitpos & 7
            cur = int.from_bytes(b[a+bytepos:a+bytepos+6], "little")
            cur &= (1 << bitres) - 1
            cur |= inst << bitres
            b[a+bytepos:a+bytepos+6] = cur.to_bytes(7, "little")[:6]
        elif arch == "arm64":
            a = k - (k % 4)
            if (k // 24) % 2:
                b[a:a+4] = struct.pack("<I", 0x94000000 | (tgt & 0x03FFFFFF))  # BL
            else:
                page = tgt & 0x1FFFF
                instr = 0x90000000 | ((page & 3) << 29) | (((page >> 2) & 0x7FFFF) << 5) | 7
                b[a:a+4] = struct.pack("<I", instr)  # ADRP x7
    return bytes(b)

PY = {
    "x86": lzma.FILTER_X86, "powerpc": lzma.FILTER_POWERPC, "ia64": lzma.FILTER_IA64,
    "arm": lzma.FILTER_ARM, "armthumb": lzma.FILTER_ARMTHUMB, "sparc": lzma.FILTER_SPARC,
}

for arch, fid in PY.items():
    data = payload(arch)
    filtered = lzma.compress(data, format=lzma.FORMAT_XZ,
                             filters=[{"id": fid}, {"id": lzma.FILTER_LZMA2, "preset": 6}])
    plain = lzma.compress(data, format=lzma.FORMAT_XZ,
                          filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
    assert filtered != plain, f"{arch}: filter was a no-op — payload converts nothing"
    assert lzma.decompress(filtered) == data
    open(os.path.join(OUT, f"bcj_{arch}.xz"), "wb").write(filtered)
    open(os.path.join(OUT, f"bcj_{arch}.bin"), "wb").write(data)
    print(arch, "ok", len(filtered))

# x86 with a non-zero start offset (CLI exposes start=N)
data = payload("x86")
open("/tmp/bcj_start.raw", "wb").write(data)
subprocess.run(["xz", "-zkf", "--x86=start=16", "--lzma2=preset=6", "-S", ".startxz", "/tmp/bcj_start.raw"], check=True)
xz_bytes = open("/tmp/bcj_start.raw.startxz", "rb").read()
assert lzma.decompress(xz_bytes) == data
open(os.path.join(OUT, "bcj_x86_start16.xz"), "wb").write(xz_bytes)
open(os.path.join(OUT, "bcj_x86_start16.bin"), "wb").write(data)
print("x86 start=16 ok", len(xz_bytes))

# riscv via the CLI (python binding predates the constant; xz >= 5.6)
def riscv_payload(n=8192):
    b = prng("bcj:riscv", n)
    for k in range(0, n - 20, 24):
        a = k - (k % 2)
        tgt = (k * 7919) & 0xFFFFE
        if (k // 24) % 3 == 0:
            # jal ra, tgt (J-scrambled immediate)
            imm = tgt
            inst = (((imm >> 20) & 1) << 31) | (((imm >> 1) & 0x3FF) << 21) | \
                   (((imm >> 11) & 1) << 20) | (((imm >> 12) & 0xFF) << 12) | (1 << 7) | 0x6F
            b[a:a+4] = struct.pack("<I", inst)
        elif (k // 24) % 3 == 1 and a + 8 <= n:
            # auipc t1, hi ; ld t2, lo(t1)
            rd = 6
            auipc = ((tgt & 0xFFFFF) << 12) | (rd << 7) | 0x17
            ld = ((k & 0x7FF) << 20) | (rd << 15) | (3 << 12) | (7 << 7) | 0x03
            b[a:a+4] = struct.pack("<I", auipc)
            b[a+4:a+8] = struct.pack("<I", ld)
    return bytes(b)

data = riscv_payload()
open("/tmp/bcj_riscv.raw", "wb").write(data)
subprocess.run(["xz", "-zkf", "--riscv", "--lzma2=preset=6", "-S", ".rvxz", "/tmp/bcj_riscv.raw"], check=True)
xz_bytes = open("/tmp/bcj_riscv.raw.rvxz", "rb").read()
plain = lzma.compress(data, format=lzma.FORMAT_XZ, filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
# python's bundled liblzma predates the riscv filter: self-check via the CLI
back = subprocess.run(["xz", "-d", "-c"], input=xz_bytes, capture_output=True, check=True).stdout
assert xz_bytes != plain and back == data
open(os.path.join(OUT, "bcj_riscv.xz"), "wb").write(xz_bytes)
open(os.path.join(OUT, "bcj_riscv.bin"), "wb").write(data)
print("riscv ok", len(xz_bytes))

# riscv with a non-zero (2-aligned) start offset
subprocess.run(["xz", "-zkf", "--riscv=start=64", "--lzma2=preset=6", "-S", ".rvsxz", "/tmp/bcj_riscv.raw"], check=True)
xz_bytes = open("/tmp/bcj_riscv.raw.rvsxz", "rb").read()
back = subprocess.run(["xz", "-d", "-c"], input=xz_bytes, capture_output=True, check=True).stdout
assert back == data
open(os.path.join(OUT, "bcj_riscv_start64.xz"), "wb").write(xz_bytes)
open(os.path.join(OUT, "bcj_riscv_start64.bin"), "wb").write(data)
print("riscv start=64 ok", len(xz_bytes))

# arm64 via the CLI (python binding predates the constant)
data = payload("arm64")
open("/tmp/bcj_arm64.raw", "wb").write(data)
subprocess.run(["xz", "-zkf", "--arm64", "--lzma2=preset=6", "-S", ".a64xz", "/tmp/bcj_arm64.raw"], check=True)
xz_bytes = open("/tmp/bcj_arm64.raw.a64xz", "rb").read()
plain = lzma.compress(data, format=lzma.FORMAT_XZ, filters=[{"id": lzma.FILTER_LZMA2, "preset": 6}])
assert xz_bytes != plain and lzma.decompress(xz_bytes) == data
open(os.path.join(OUT, "bcj_arm64.xz"), "wb").write(xz_bytes)
open(os.path.join(OUT, "bcj_arm64.bin"), "wb").write(data)
print("arm64 ok", len(xz_bytes))

# riscv ADVERSARIAL corpus: artifact-shaped words, escape shapes, pairs,
# JALs, dual-match corners — the generator family that drove the
# 1200-run differential fuzz (NOTES_r17). The .validated pair is the
# CLI's exact BCJ-layer output (LZMA2 stripped), pinning the encoder
# over the tricky branches forever.
import random
random.seed(2026)
adv = bytearray()
while len(adv) < 65536:
    k = random.random()
    if k < 0.22:
        rd = random.randrange(32)
        w1 = (random.getrandbits(20) << 12) | (rd << 7) | 0x17
        w2 = (random.getrandbits(12) << 20) | (rd << 15) | (random.getrandbits(3) << 12) | (random.getrandbits(5) << 7) | random.choice([3, 3, 1, 0])
        adv += w1.to_bytes(4, "little") + w2.to_bytes(4, "little")
    elif k < 0.42:
        w1 = (random.getrandbits(18) << 14) | 0x3117
        adv += w1.to_bytes(4, "little") + random.getrandbits(32).to_bytes(4, "little")
    elif k < 0.62:
        adv += bytes([0xEF, random.choice([0, 2, 1, 4, 8]) | (random.getrandbits(4) << 4), random.getrandbits(8), random.getrandbits(8)])
    elif k < 0.72:
        adv += bytes([0x97, random.getrandbits(8), random.getrandbits(8), random.getrandbits(8)])
    else:
        adv += bytes([random.getrandbits(8) for _ in range(random.choice([1, 2, 3]))])
adv = bytes(adv[:65536])
pr = subprocess.run(["xz", "--format=raw", "--riscv", "--lzma2=preset=0", "-c", "-q", "-q"], input=adv, capture_output=True)
assert pr.returncode == 0
adv_f = lzma.decompress(pr.stdout, format=lzma.FORMAT_RAW, filters=[{"id": lzma.FILTER_LZMA2, "preset": 0}])
assert len(adv_f) == len(adv) and adv_f != adv
open(os.path.join(OUT, "bcj_riscv_adv.bin"), "wb").write(adv)
open(os.path.join(OUT, "bcj_riscv_adv.validated"), "wb").write(adv_f)
print("riscv adversarial ok", sum(1 for a, b in zip(adv, adv_f) if a != b), "bytes converted")

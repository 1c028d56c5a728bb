#!/usr/bin/env python3
"""Extract RFC 7932 (Brotli) normative constants from the system
libbrotli and emit them as resources + a Scala source.

Everything below is normative content of the published RFC (appendix
A static dictionary, appendix B transforms, section 7 context lookup
tables, section 6 block-count code, section 5 insert/copy length
codes). The RFC text is not available in this sandbox, but the
MIT-licensed libbrotli is, and exports them:

  * BrotliGetDictionary()       -> size_bits/offsets + 122784-B data
  * BrotliGetTransforms()       -> 121 (prefix, type, suffix) triplets
  * _kBrotliContextLookupTable  -> 4 modes x (256 p1 + 256 p2) bytes
  * _kBrotliPrefixCodeRanges    -> 26 block-count (offset, nbits)
  * kBrotliInsBase/Extra etc.   -> located in libbrotlidec .rodata by
                                   structural search (monotone 24-entry
                                   u32 ramps with the RFC endpoints)

BrotliSpec then validates the whole stack end-to-end: real
libbrotlienc streams at several qualities/window sizes must decode
byte-exactly, which no wrong table survives.
"""
import ctypes
import struct

OUT_RES = "src/main/resources/graft/brotli"
OUT_SCALA = "src/main/scala/graft/text/BrotliTables.scala"

import os
os.makedirs(OUT_RES, exist_ok=True)

common = ctypes.CDLL("libbrotlicommon.so.1")

# --- dictionary --------------------------------------------------------
common.BrotliGetDictionary.restype = ctypes.c_void_p
dp = common.BrotliGetDictionary()
hdr = ctypes.string_at(dp, 32 + 32 * 4 + 8 + 8)
size_bits = list(hdr[:32])
offsets = list(struct.unpack_from("<32I", hdr, 32))
data_size, data_ptr = struct.unpack_from("<QQ", hdr, 160)
assert data_size == 122784, data_size
dict_data = ctypes.string_at(data_ptr, data_size)
open(f"{OUT_RES}/dictionary.bin", "wb").write(dict_data)

# --- transforms --------------------------------------------------------
common.BrotliGetTransforms.restype = ctypes.c_void_p
tp = common.BrotliGetTransforms()
thdr = ctypes.string_at(tp, 56)
prefix_suffix_size = struct.unpack_from("<H", thdr, 0)[0]
ps_ptr, map_ptr = struct.unpack_from("<QQ", thdr, 8)
num_transforms = struct.unpack_from("<I", thdr, 24)[0]
tr_ptr = struct.unpack_from("<Q", thdr, 32)[0]
assert num_transforms == 121, num_transforms
prefix_suffix = ctypes.string_at(ps_ptr, prefix_suffix_size)
triplets = list(ctypes.string_at(tr_ptr, num_transforms * 3))
# resolve (prefix_id, suffix_id) via the map into actual strings
n_strings = max(triplets[0::3] + triplets[2::3]) + 1
ps_map = struct.unpack_from(f"<{n_strings}H", ctypes.string_at(map_ptr, n_strings * 2))
def seg(idx):
    off = ps_map[idx]
    ln = prefix_suffix[off]
    return prefix_suffix[off + 1:off + 1 + ln]
transforms = []
for i in range(num_transforms):
    p, t, sfx = triplets[3 * i], triplets[3 * i + 1], triplets[3 * i + 2]
    transforms.append((seg(p), t, seg(sfx)))
# sanity: transform 0 is ("", Identity, "")
assert transforms[0] == (b"", 0, b"")

# --- context lookup ----------------------------------------------------
ctx_addr = ctypes.cast(common._kBrotliContextLookupTable, ctypes.c_void_p).value
# _kBrotliContextLookupTable is data, not a function: take its address
ctx_table = ctypes.string_at(ctypes.addressof(
    ctypes.c_uint8.in_dll(common, "_kBrotliContextLookupTable")), 2048)
open(f"{OUT_RES}/context.bin", "wb").write(ctx_table)

# --- block-count code --------------------------------------------------
pcr = ctypes.string_at(ctypes.addressof(
    ctypes.c_uint8.in_dll(common, "_kBrotliPrefixCodeRanges")), 104)
blk = [struct.unpack_from("<HBx", pcr, i * 4) for i in range(26)]
assert blk[0] == (1, 2) and blk[-1][1] == 24, blk

# --- insert/copy length codes + the 704-cell command structure ----------
# libbrotlidec stores them combined in kCmdLut[704] (8-byte entries:
# ins_extra u8, copy_extra u8, dist_code i8, context u8, ins_off u16,
# copy_off u16); locate by the first two entries and derive the RFC's
# 24-code tables plus the 11-cell (insertHigh, copyHigh) map, verifying
# the section-5 model on all 704 cells.
dec = open("/usr/lib/x86_64-linux-gnu/libbrotlidec.so.1", "rb").read()
pat = bytes([0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 1, 0, 0, 3, 0])
at = dec.find(pat)
assert at >= 0, "kCmdLut not found"
lut = [struct.unpack_from("<BBbBHH", dec, at + 8 * i) for i in range(704)]
ins_codes = sorted(set((e[4], e[0]) for e in lut))
copy_codes = sorted(set((e[5], e[1]) for e in lut))
assert len(ins_codes) == 24 and len(copy_codes) == 24
ins_base = [c[0] for c in ins_codes]
ins_extra = [c[1] for c in ins_codes]
copy_base = [c[0] for c in copy_codes]
copy_extra = [c[1] for c in copy_codes]
ins_idx = {v: i for i, v in enumerate(ins_codes)}
copy_idx = {v: i for i, v in enumerate(copy_codes)}
cells = []
for cell in range(11):
    e0 = lut[cell * 64]
    cells.append((ins_idx[(e0[4], e0[0])] & ~7, copy_idx[(e0[5], e0[1])] & ~7))
for c, (ie, ce, dc, ctx, io, co) in enumerate(lut):
    cell, i3, c3 = c >> 6, (c >> 3) & 7, c & 7
    assert ins_idx[(io, ie)] == cells[cell][0] + i3
    assert copy_idx[(co, ce)] == cells[cell][1] + c3
    assert (dc == 0) == (c < 128)  # implicit distance-0 for cmd < 128

# --- emit Scala --------------------------------------------------------
def arr(name, vals):
    body = []
    for i in range(0, len(vals), 16):
        body.append("    " + ", ".join(str(v) for v in vals[i:i + 16]))
    return f"  val {name}: Array[Int] = Array(\n" + ",\n".join(body) + "\n  )\n"

def sstr(b: bytes) -> str:
    return '"' + "".join(
        ch if 32 <= c < 127 and ch not in '"\\' else f"\\u{c:04x}"
        for c in b for ch in [chr(c)]) + '"'

out = '''package graft.text

/** RFC 7932 (Brotli) normative constant tables. GENERATED by
  * tools/gen_brotli_tables.py from the system libbrotli (see that
  * script's provenance note); the static dictionary (122784 B) and
  * the 2048-B context lookup ship as classpath resources. BrotliSpec
  * pins everything end-to-end against real libbrotlienc streams.
  * Do not edit by hand.
  */
object BrotliTables {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/graft/brotli/$name")
    require(in != null, s"missing resource $name")
    try in.readAllBytes()
    finally in.close()
  }

  /** appendix-A static dictionary words, all lengths concatenated */
  lazy val Dictionary: Array[Byte] = resource("dictionary.bin")

  /** 4 context modes x (256 p1-lut ++ 256 p2-lut); ctx = l(p1)|l(256+p2) */
  lazy val ContextLut: Array[Byte] = resource("context.bin")

'''
out += arr("DictSizeBits", size_bits)
out += "\n"
out += arr("DictOffsets", offsets)
out += "\n  /** block-count code: (base offset, extra bits) per symbol */\n"
out += arr("BlockLenBase", [b[0] for b in blk])
out += "\n"
out += arr("BlockLenExtra", [b[1] for b in blk])
out += "\n  /** insert/copy length codes (section 5) */\n"
out += arr("InsBase", ins_base)
out += "\n"
out += arr("InsExtra", ins_extra)
out += "\n"
out += arr("CopyBase", copy_base)
out += "\n"
out += arr("CopyExtra", copy_extra)
out += "\n  /** command cell -> (insertCodeHigh, copyCodeHigh); cmd = cell*64 + i3*8 + c3 */\n"
out += arr("CmdCellIns", [c[0] for c in cells])
out += "\n"
out += arr("CmdCellCopy", [c[1] for c in cells])
out += "\n  /** appendix-B word transforms: (prefix, type, suffix) */\n"
out += "  val Transforms: Array[(String, Int, String)] = Array(\n"
out += ",\n".join(f"    ({sstr(p)}, {t}, {sstr(sfx)})" for (p, t, sfx) in transforms)
out += "\n  )\n}\n"
open(OUT_SCALA, "w").write(out)
print(f"dict={len(dict_data)}B transforms={len(transforms)} ctx={len(ctx_table)}B blk={len(blk)}")

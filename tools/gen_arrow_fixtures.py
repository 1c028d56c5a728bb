#!/usr/bin/env python3
"""Generate Arrow IPC conformance fixtures with REAL pyarrow (16.1.0,
the cross-ecosystem producer — HuggingFace datasets writes through this
exact library).

Variants: the full supported type matrix (ints incl. unsigned, half/
single/double floats, bool, utf8/binary + Large variants, fixed-size
binary, decimal128, date32/64, time32/64, timestamps in all units incl.
tz-naive, duration, list / large_list / fixed_size_list, struct, nulls
everywhere), LZ4_FRAME- and ZSTD-compressed bodies, a dictionary-
encoded column, the STREAM format (multi-batch), and an empty table.
All values are deterministic formulas of the row index so
ArrowFixtureSpec recomputes them without committing values twice.
Every fixture is read back by pyarrow at capture time (self-check).
"""
import decimal
import os

import pyarrow as pa
import pyarrow.ipc as ipc

OUT = os.path.join(os.path.dirname(__file__), "..", "src", "test", "resources", "graft", "arrow")
os.makedirs(OUT, exist_ok=True)


def null_every(vals, k, start=3):
    return [None if i % k == start % k else v for i, v in enumerate(vals)]


def types_table(n):
    idx = list(range(n))
    fields = []
    cols = []

    def add(name, typ, vals, k):
        fields.append(pa.field(name, typ, nullable=True))
        cols.append(pa.array(null_every(vals, k), type=typ))

    add("i8", pa.int8(), [(i * 13 - 40) % 128 for i in idx], 4)
    add("i16", pa.int16(), [i * 1001 - 4000 for i in idx], 5)
    add("i32", pa.int32(), [i * 100000 - 350000 for i in idx], 6)
    add("i64", pa.int64(), [i * 123456789 - 400000000 for i in idx], 7)
    add("u8", pa.uint8(), [(i * 29) % 256 for i in idx], 8)
    add("u16", pa.uint16(), [(i * 7001) % 65536 for i in idx], 9)
    add("u32", pa.uint32(), [(i * 900000007) % 4294967296 for i in idx], 10)
    add("f2", pa.float16(), pa.array([float(i) * 0.5 - 2.0 for i in idx], type=pa.float32()).cast(pa.float16()).to_pylist(), 4)
    add("f4", pa.float32(), [i * 1.5 - 3.0 for i in idx], 5)
    add("f8", pa.float64(), [i * 2.25 - 9.0 for i in idx], 6)
    add("b", pa.bool_(), [i % 3 == 0 for i in idx], 7)
    add("s", pa.utf8(), [f"s{i * i}é" for i in idx], 8)
    add("ls", pa.large_utf8(), [f"L{i % 17}" * (i % 3 + 1) for i in idx], 9)
    add("bin", pa.binary(), [bytes((i * 7 + j) % 256 for j in range(i % 4)) for i in idx], 10)
    add("lbin", pa.large_binary(), [bytes((i + j) % 256 for j in range(i % 3)) for i in idx], 4)
    add("fsb", pa.binary(5), [bytes([i % 256] * 5) for i in idx], 5)
    add("dec", pa.decimal128(12, 3), [decimal.Decimal((i - 4) * 1234567).scaleb(-3) for i in idx], 6)
    add("d32", pa.date32(), [19000 + i for i in idx], 7)
    add("d64", pa.date64(), [(19000 + i) * 86400000 for i in idx], 8)
    add("ts_s", pa.timestamp("s"), [1700000000 + i for i in idx], 9)
    add("ts_ms", pa.timestamp("ms"), [1700000000000 + i for i in idx], 10)
    add("ts_us", pa.timestamp("us", tz="UTC"), [1700000000000000 + i for i in idx], 4)
    add("ts_ns", pa.timestamp("ns"), [1700000000000000000 + i for i in idx], 5)
    add("t32", pa.time32("ms"), [(i * 99991) % 86400000 for i in idx], 6)
    add("t64", pa.time64("us"), [i * 1000001 for i in idx], 7)
    add("dur", pa.duration("ms"), [i * 777 for i in idx], 8)
    add("lst", pa.list_(pa.int64()), [[i * 10 + j for j in range(i % 4)] for i in idx], 9)
    add("llst", pa.large_list(pa.float64()), [[i + j * 0.25 for j in range(i % 3)] for i in idx], 10)
    add("emb", pa.list_(pa.float32(), 3), [[i * 1.0, i * 2.0, i * 3.0] for i in idx], 4)
    add("pos", pa.struct([pa.field("x", pa.int32()), pa.field("y", pa.utf8())]),
        [{"x": i, "y": f"y{i}"} for i in idx], 5)
    return pa.Table.from_arrays(cols, schema=pa.schema(fields))


def write_file(name, table, compression=None, batch_rows=None):
    opts = ipc.IpcWriteOptions(compression=compression)
    path = os.path.join(OUT, name)
    with pa.OSFile(path, "wb") as f:
        with ipc.new_file(f, table.schema, options=opts) as w:
            if batch_rows:
                for b in table.to_batches(max_chunksize=batch_rows):
                    w.write_batch(b)
            else:
                w.write_table(table)
    back = ipc.open_file(path).read_all()
    assert back.equals(table), name
    print(name, "ok", os.path.getsize(path))


def write_stream(name, table, compression=None, batch_rows=None):
    opts = ipc.IpcWriteOptions(compression=compression)
    path = os.path.join(OUT, name)
    with pa.OSFile(path, "wb") as f:
        with ipc.new_stream(f, table.schema, options=opts) as w:
            for b in table.to_batches(max_chunksize=batch_rows or len(table)):
                w.write_batch(b)
    back = ipc.open_stream(path).read_all()
    assert back.equals(table), name
    print(name, "ok", os.path.getsize(path))


def main():
    t = types_table(23)
    write_file("types.arrow", t, batch_rows=9)  # 3 batches: 9+9+5

    big = pa.table({
        "x": pa.array([i % 97 for i in range(4000)], type=pa.int64()),
        "w": pa.array([f"w{i % 83}" for i in range(4000)], type=pa.utf8()),
        "v": pa.array([[i * 0.5, i * 0.25] for i in range(4000)], type=pa.list_(pa.float64())),
    })
    write_file("comp_lz4.arrow", big, compression="lz4")
    write_file("comp_zstd.arrow", big, compression="zstd")

    words = ["alpha", "beta", "gamma", "δelta", "epsilon"]
    dic = pa.table({
        "w": pa.array([None if i % 7 == 6 else words[i % 5] for i in range(50)],
                      type=pa.dictionary(pa.int16(), pa.utf8())),
        "n": pa.array(list(range(50)), type=pa.int32()),
    })
    write_file("dict.arrow", dic)

    nested = pa.table({
        "tags": pa.array(
            [None if i % 6 == 5 else [["red", "green", "blue", "ünicode"][j % 4] for j in range(i % 3)]
             for i in range(40)],
            type=pa.list_(pa.dictionary(pa.int16(), pa.utf8()))),
        "k": pa.array(list(range(40)), type=pa.int64()),
    })
    write_file("dict_nested.arrow", nested)

    write_stream("types.arrows", t, batch_rows=7)
    write_stream("comp_zstd.arrows", big, compression="zstd", batch_rows=1500)

    write_file("empty.arrow", types_table(0))

    # map<utf8, int64>: null map when i%6==5, else i%4 entries k{i}_{j} -> i*10+j
    # (nullable values: value is null when (i+j)%5==4); plus a zstd twin
    n = 37
    maps = pa.table({
        "m": pa.array(
            [None if i % 6 == 5 else
             [(f"k{i}_{j}", None if (i + j) % 5 == 4 else i * 10 + j) for j in range(i % 4)]
             for i in range(n)],
            type=pa.map_(pa.string(), pa.int64())),
        "k": pa.array(list(range(n)), type=pa.int64()),
    })
    write_file("map.arrow", maps, batch_rows=16)
    write_file("map_zstd.arrow", maps, compression="zstd")

    # dense union <num: int64 = 2, word: utf8 = 5> (non-contiguous ids):
    # slot i is num(i*7) when i%3==0, null num when i%9==3... keep it
    # simple: num slots at i%3==0 (value i*7, null when i%12==6),
    # word slots otherwise ("w{i%11}", null when i%10==7)
    tids = pa.array([2 if i % 3 == 0 else 5 for i in range(n)], type=pa.int8())
    offsets, nums, words = [], [], []
    for i in range(n):
        if i % 3 == 0:
            offsets.append(len(nums))
            nums.append(None if i % 12 == 6 else i * 7)
        else:
            offsets.append(len(words))
            words.append(None if i % 10 == 7 else f"w{i % 11}")
    dense = pa.UnionArray.from_dense(
        tids, pa.array(offsets, type=pa.int32()),
        [pa.array(nums, type=pa.int64()), pa.array(words, type=pa.utf8())],
        ["num", "word"], [2, 5])
    ud = pa.table({"u": dense, "k": pa.array(list(range(n)), type=pa.int64())})
    write_file("union_dense.arrow", ud, batch_rows=20)

    # sparse union <num: int64 = 0, word: utf8 = 1> (default ids):
    # every child is full length; selected child per slot as above
    stids = pa.array([0 if i % 3 == 0 else 1 for i in range(n)], type=pa.int8())
    snums = pa.array([None if i % 12 == 6 else i * 7 for i in range(n)], type=pa.int64())
    swords = pa.array([None if i % 10 == 7 else f"w{i % 11}" for i in range(n)], type=pa.utf8())
    sparse = pa.UnionArray.from_sparse(stids, [snums, swords], ["num", "word"])
    us = pa.table({"u": sparse, "k": pa.array(list(range(n)), type=pa.int64())})
    write_file("union_sparse.arrow", us, batch_rows=20)

    # string_view / binary_view: inline (<=12B) and out-of-line values
    # with nulls; sv[i] = "s{i}" if i%3 else a 40+-byte payload; null i%7==3
    views = pa.table({
        "sv": pa.array(
            [None if i % 7 == 3 else (f"s{i}" if i % 3 else f"long-string-payload-beyond-twelve-bytes-{i}")
             for i in range(n)], type=pa.string_view()),
        "bv": pa.array(
            [None if i % 5 == 2 else bytes((i + j) % 256 for j in range(i % 19))
             for i in range(n)], type=pa.binary_view()),
        "k": pa.array(list(range(n)), type=pa.int64()),
    })
    write_file("views.arrow", views, batch_rows=16)
    write_file("views_zstd.arrow", views, compression="zstd")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generate the `zarr_dtypes` (v2) and `zarr_v3_dtypes` test fixture
stores — python STDLIB ONLY (json/struct/zlib, no zarr/numpy), so
ZarrSpec tests the byte-level dtype contract against an independent
writer, not a round-trip of our own sink.

Covers the reference's canonical store shape (string coordinate, bool +
complex128 data variables — tests/test_manage.py:15-27):

v2 store (src/test/resources/zarr_dtypes):
  - dims: x (<i8, 4 values), s (<U3: "ab", "cde", "f" — unicode incl.
    a 2-byte char), both single-chunk coords;
  - flag(x, s)  |b1, zlib, 3x2 chunks -> edge padding both dims;
  - z(x, s)     <c16, zlib, 2x3 chunks, one ABSENT chunk with fill
                [0, NaN] -> fill synthesis for complex;
  - tag(x)      |S4 raw, chunks of 3 -> fixed-bytes decode + edge chunk;
  - b2(x)       |b1 raw with fill=true and the LAST chunk absent.

v3 store (src/test/resources/zarr_v3_dtypes):
  - y (int64 coord); fb(y) bool gzip; cz(y) complex128 raw with one
    absent chunk, fill ["NaN", 2.5].

vlen store (src/test/resources/zarr_vlen) — xarray's DEFAULT string
encoding (object dtype + numcodecs VLenUTF8 filter):
  - x: |O vlen-utf8 raw COORD ["né", "b", "ccc"] (2-byte UTF-8 char);
  - v(x): <f8 zlib [1.5, 2.5, 3.5];
  - names(x): |O vlen-utf8 + zlib, chunks of 2 -> the edge chunk
    stores a full 2-item vlen stream with empty-string padding.

Values are deterministic; the EXPECTED values are asserted in
ZarrSpec (hand-computed there, not read from this generator).
"""
import json, os, shutil, struct, zlib, gzip

R2 = "src/test/resources/zarr_dtypes"
R3 = "src/test/resources/zarr_v3_dtypes"


def clean(d):
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)


def jput(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f, sort_keys=True)


def v2_meta(root, name, shape, chunks, dtype, comp, dims, fill):
    os.makedirs(f"{root}/{name}", exist_ok=True)
    jput(f"{root}/{name}/.zarray", {
        "zarr_format": 2, "shape": shape, "chunks": chunks,
        "dtype": dtype, "order": "C", "filters": None,
        "compressor": ({"id": "zlib", "level": 1} if comp == "zlib" else None),
        "fill_value": fill,
    })
    jput(f"{root}/{name}/.zattrs", {"_ARRAY_DIMENSIONS": dims})


def chunk(root, name, key, payload, comp):
    data = zlib.compress(payload, 1) if comp == "zlib" else payload
    with open(f"{root}/{name}/{key}", "wb") as f:
        f.write(data)


def ucs4(s, n):
    out = b""
    cps = [ord(c) for c in s]
    assert len(cps) <= n
    for cp in cps + [0] * (n - len(cps)):
        out += struct.pack("<i", cp)
    return out


def main():
    clean(R2)
    jput(f"{R2}/.zgroup", {"zarr_format": 2})

    # coords: x = [10, 20, 30, 40] i8; s = ["ab", "cde", "f"] <U3
    v2_meta(R2, "x", [4], [4], "<i8", None, ["x"], None)
    chunk(R2, "x", "0", struct.pack("<4q", 10, 20, 30, 40), None)
    v2_meta(R2, "s", [3], [3], "<U3", None, ["s"], None)
    chunk(R2, "s", "0", ucs4("ab", 3) + ucs4("cdé", 3) + ucs4("f", 3), None)

    # flag(x, s) |b1 zlib, chunks (3, 2): flag[i][j] = (i + j) % 2 == 0
    v2_meta(R2, "flag", [4, 3], [3, 2], "|b1", "zlib", ["x", "s"], False)
    # chunk (0,0): rows 0-2, cols 0-1
    c00 = bytes([(i + j + 1) % 2 for i in range(3) for j in range(2)])
    # chunk (0,1): rows 0-2, col 2 (padded to 2 cols with junk zeros)
    c01 = bytes(b for i in range(3) for b in [(i + 2 + 1) % 2, 0])
    # chunk (1,0): row 3, cols 0-1 (padded to 3 rows)
    c10 = bytes([(3 + 0 + 1) % 2, (3 + 1 + 1) % 2] + [0] * 4)
    c11 = bytes([(3 + 2 + 1) % 2, 0] + [0] * 4)
    for k, v in [("0.0", c00), ("0.1", c01), ("1.0", c10), ("1.1", c11)]:
        chunk(R2, "flag", k, v, "zlib")

    # z(x, s) <c16 zlib, chunks (2, 3): z[i][j] = (i + j/10) + (i*j)i
    # chunk (1,0) [rows 2-3] is ABSENT -> fill [0, NaN]
    v2_meta(R2, "z", [4, 3], [2, 3], "<c16", "zlib", ["x", "s"],
            [0, "NaN"])
    rows01 = b"".join(struct.pack("<2d", i + j / 10.0, float(i * j))
                      for i in range(2) for j in range(3))
    chunk(R2, "z", "0.0", rows01, "zlib")

    # tag(x) |S4 raw, chunks of 3: ["AA", "BBBB", "C", "DD"]
    v2_meta(R2, "tag", [4], [3], "|S4", None, ["x"], None)
    def s4(t):
        b = t.encode()
        return b + b"\x00" * (4 - len(b))
    chunk(R2, "tag", "0", s4("AA") + s4("BBBB") + s4("C"), None)
    chunk(R2, "tag", "1", s4("DD") + b"\x00" * 8, None)

    # b2(x) |b1 raw, chunks of 2, fill=true, LAST chunk absent
    v2_meta(R2, "b2", [4], [2], "|b1", None, ["x"], True)
    chunk(R2, "b2", "0", bytes([1, 0]), None)

    # ---------------- v3 store ----------------
    clean(R3)
    def v3_arr(name, shape, chunks, dtype, codecs, dims, fill):
        os.makedirs(f"{R3}/{name}", exist_ok=True)
        jput(f"{R3}/{name}/zarr.json", {
            "zarr_format": 3, "node_type": "array", "shape": shape,
            "data_type": dtype,
            "chunk_grid": {"name": "regular",
                           "configuration": {"chunk_shape": chunks}},
            "chunk_key_encoding": {"name": "default",
                                   "configuration": {"separator": "/"}},
            "codecs": codecs, "dimension_names": dims, "fill_value": fill,
            "attributes": {},
        })
    jput(f"{R3}/zarr.json",
         {"zarr_format": 3, "node_type": "group", "attributes": {}})
    bytes_c = {"name": "bytes", "configuration": {"endian": "little"}}
    gzip_c = {"name": "gzip", "configuration": {"level": 1}}

    v3_arr("y", [5], [5], "int64", [bytes_c], ["y"], 0)
    os.makedirs(f"{R3}/y/c", exist_ok=True)
    with open(f"{R3}/y/c/0", "wb") as f:
        f.write(struct.pack("<5q", 1, 2, 3, 5, 8))

    # fb(y) bool gzip, chunks of 3: [T, F, F, T, T]
    v3_arr("fb", [5], [3], "bool", [bytes_c, gzip_c], ["y"], False)
    os.makedirs(f"{R3}/fb/c", exist_ok=True)
    with open(f"{R3}/fb/c/0", "wb") as f:
        f.write(gzip.compress(bytes([1, 0, 0]), 1, mtime=0))
    with open(f"{R3}/fb/c/1", "wb") as f:
        f.write(gzip.compress(bytes([1, 1, 0]), 1, mtime=0))

    # cz(y) complex128 raw, chunks of 3, chunk 1 ABSENT, fill [NaN, 2.5]
    v3_arr("cz", [5], [3], "complex128", [bytes_c], ["y"], ["NaN", 2.5])
    os.makedirs(f"{R3}/cz/c", exist_ok=True)
    with open(f"{R3}/cz/c/0", "wb") as f:
        f.write(b"".join(struct.pack("<2d", float(k), -float(k))
                         for k in range(3)))

    # ---------------- vlen store ----------------
    RV = "src/test/resources/zarr_vlen"
    clean(RV)
    jput(f"{RV}/.zgroup", {"zarr_format": 2})

    def vlen_stream(items):
        out = struct.pack("<i", len(items))
        for it in items:
            b = it.encode("utf-8")
            out += struct.pack("<i", len(b)) + b
        return out

    def v2_meta_f(root, name, shape, chunks, dtype, comp, dims, fill,
                  filters):
        os.makedirs(f"{root}/{name}", exist_ok=True)
        jput(f"{root}/{name}/.zarray", {
            "zarr_format": 2, "shape": shape, "chunks": chunks,
            "dtype": dtype, "order": "C", "filters": filters,
            "compressor": ({"id": "zlib", "level": 1}
                           if comp == "zlib" else None),
            "fill_value": fill,
        })
        jput(f"{root}/{name}/.zattrs", {"_ARRAY_DIMENSIONS": dims})

    vl = [{"id": "vlen-utf8"}]
    v2_meta_f(RV, "x", [3], [3], "|O", None, ["x"], None, vl)
    chunk(RV, "x", "0", vlen_stream(["n\u00e9", "b", "ccc"]), None)
    v2_meta(RV, "v", [3], [3], "<f8", "zlib", ["x"], "NaN")
    chunk(RV, "v", "0", struct.pack("<3d", 1.5, 2.5, 3.5), "zlib")
    v2_meta_f(RV, "names", [3], [2], "|O", "zlib", ["x"], None, vl)
    chunk(RV, "names", "0", vlen_stream(["alpha", "b\u00e9ta"]), "zlib")
    chunk(RV, "names", "1", vlen_stream(["gamma", ""]), "zlib")

    print("wrote", R2, "and", R3, "and", RV)


if __name__ == "__main__":
    main()

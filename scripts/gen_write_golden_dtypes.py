#!/usr/bin/env python3
"""Independent GOLDEN writer for the round-10 dtype layouts — python
STDLIB ONLY (json/struct), no zarr/netCDF/numpy. Mirrors the pinned
layout conventions documented in ZarrSink/NetCDF3Sink Scaladoc (dims
in caller order, coords-then-data variable order, alphabetical
.zarray keys via json.dumps sort_keys, NUL name padding, vsize padded
to 4, consolidated .zmetadata assembled from the same texts), so
WriteSinkSpec can assert BYTE IDENTITY between the Scala writers and
this one for stores carrying a STRING axis, a BOOL variable, and (zarr
only) a COMPLEX128 variable.

Canonical dtype dataset (C-order over (s, k); s sorted):
  dims  s = ["A", "BB", "C"]  (<U2 / NC_CHAR + s_strlen)
        k = [1, 2]            (<i8 / NC_INT)
  vars  x(s,k)  f8   [1.25, 2.25, 11.25, 12.25, 21.25, MISSING->NaN]
        f(s,k)  bool [F, T, T, F, F, T]
        zc(s,k) c16  [(.1,0),(.2,0),(1.1,1),(1.2,2),MISSING->(NaN,NaN),(2.2,4)]
        tg(s,k) <U3  ["abc", "d", "ef", "ghi", "j", "kl"] (total)
        (zc and tg are zarr-only: netCDF classic has neither type)

Outputs: src/test/resources/write_golden/zarr_dtypes_w/ (uncompressed
zarr v2) and src/test/resources/write_golden/golden_dtypes.nc (CDF-1).
"""
import json, os, shutil, struct

GOLD = "src/test/resources/write_golden"
NAN = float("nan")

S_AXIS = ["A", "BB", "C"]
K_AXIS = [1, 2]
X = [1.25, 2.25, 11.25, 12.25, 21.25, NAN]
F = [0, 1, 1, 0, 0, 1]
Z = [(0.1, 0.0), (0.2, 0.0), (1.1, 1.0), (1.2, 2.0), (NAN, NAN), (2.2, 4.0)]
TG = ["abc", "d", "ef", "ghi", "j", "kl"]


def ucs4(s, n):
    cps = [ord(c) for c in s]
    return b"".join(struct.pack("<i", cp) for cp in cps + [0] * (n - len(cps)))


def zarr():
    root = f"{GOLD}/zarr_dtypes_w"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    meta = {}

    def metafile(key, obj):
        text = json.dumps(obj, sort_keys=True)
        meta[key] = text
        path = f"{root}/{key}"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(text)

    def arr(name, shape, chunks, dtype, fill, dims):
        metafile(f"{name}/.zarray", {
            "chunks": chunks, "compressor": None, "dtype": dtype,
            "fill_value": fill, "filters": None, "order": "C",
            "shape": shape, "zarr_format": 2})
        metafile(f"{name}/.zattrs", {"_ARRAY_DIMENSIONS": dims})

    metafile(".zgroup", {"zarr_format": 2})
    metafile(".zattrs", {})

    # coords (single chunk "0")
    arr("s", [3], [3], "<U2", None, ["s"])
    with open(f"{root}/s/0", "wb") as fh:
        fh.write(b"".join(ucs4(v, 2) for v in S_AXIS))
    arr("k", [2], [2], "<i8", 0, ["k"])
    with open(f"{root}/k/0", "wb") as fh:
        fh.write(struct.pack("<2q", *K_AXIS))

    # data vars (single chunk "0.0", c0 = 3)
    arr("x", [3, 2], [3, 2], "<f8", "NaN", ["s", "k"])
    with open(f"{root}/x/0.0", "wb") as fh:
        fh.write(struct.pack("<6d", *X))
    arr("f", [3, 2], [3, 2], "|b1", False, ["s", "k"])
    with open(f"{root}/f/0.0", "wb") as fh:
        fh.write(bytes(F))
    arr("zc", [3, 2], [3, 2], "<c16", ["NaN", "NaN"], ["s", "k"])
    with open(f"{root}/zc/0.0", "wb") as fh:
        fh.write(b"".join(struct.pack("<2d", re, im) for re, im in Z))
    arr("tg", [3, 2], [3, 2], "<U3", None, ["s", "k"])
    with open(f"{root}/tg/0.0", "wb") as fh:
        fh.write(b"".join(ucs4(v, 3) for v in TG))

    # consolidated manifest, keys sorted, same spacing as the sink
    entries = ", ".join(f'"{k}": {meta[k]}' for k in sorted(meta))
    with open(f"{root}/.zmetadata", "w") as fh:
        fh.write('{"metadata": {' + entries +
                 '}, "zarr_consolidated_format": 1}')
    print("wrote", root)


def vlen_payload(items):
    """numcodecs VLenUTF8 chunk: uint32-LE item count, then per item a
    uint32-LE byte length + UTF-8 bytes."""
    out = struct.pack("<I", len(items))
    for s in items:
        b = s.encode("utf-8")
        out += struct.pack("<I", len(b)) + b
    return out


def zarr_vlen():
    """Same canonical dataset as zarr(), but strings (the s axis and
    the tg data var) as object dtype + vlen-utf8 filter — xarray
    to_zarr's DEFAULT string encoding (round 11: the write-side
    counterpart of the vlen READ path)."""
    root = f"{GOLD}/zarr_vlen_w"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    meta = {}

    def metafile(key, obj):
        text = json.dumps(obj, sort_keys=True)
        meta[key] = text
        path = f"{root}/{key}"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            fh.write(text)

    def arr(name, shape, chunks, dtype, fill, dims, filters=None):
        metafile(f"{name}/.zarray", {
            "chunks": chunks, "compressor": None, "dtype": dtype,
            "fill_value": fill, "filters": filters, "order": "C",
            "shape": shape, "zarr_format": 2})
        metafile(f"{name}/.zattrs", {"_ARRAY_DIMENSIONS": dims})

    metafile(".zgroup", {"zarr_format": 2})
    metafile(".zattrs", {})

    VL = [{"id": "vlen-utf8"}]
    arr("s", [3], [3], "|O", None, ["s"], VL)
    with open(f"{root}/s/0", "wb") as fh:
        fh.write(vlen_payload(S_AXIS))
    arr("k", [2], [2], "<i8", 0, ["k"])
    with open(f"{root}/k/0", "wb") as fh:
        fh.write(struct.pack("<2q", *K_AXIS))

    arr("x", [3, 2], [3, 2], "<f8", "NaN", ["s", "k"])
    with open(f"{root}/x/0.0", "wb") as fh:
        fh.write(struct.pack("<6d", *X))
    arr("f", [3, 2], [3, 2], "|b1", False, ["s", "k"])
    with open(f"{root}/f/0.0", "wb") as fh:
        fh.write(bytes(F))
    arr("zc", [3, 2], [3, 2], "<c16", ["NaN", "NaN"], ["s", "k"])
    with open(f"{root}/zc/0.0", "wb") as fh:
        fh.write(b"".join(struct.pack("<2d", re, im) for re, im in Z))
    arr("tg", [3, 2], [3, 2], "|O", None, ["s", "k"], VL)
    with open(f"{root}/tg/0.0", "wb") as fh:
        fh.write(vlen_payload(TG))

    entries = ", ".join(f'"{k}": {meta[k]}' for k in sorted(meta))
    with open(f"{root}/.zmetadata", "w") as fh:
        fh.write('{"metadata": {' + entries +
                 '}, "zarr_consolidated_format": 1}')
    print("wrote", root)


def netcdf():
    # CDF-1: dims (s=3, k=2, s_strlen=2); vars s(char s,s_strlen),
    # k(int k), x(double s,k), f(byte s,k)
    out = bytearray()

    def u32(v): out.extend(struct.pack(">i", v))

    def name(s):
        b = s.encode()
        u32(len(b)); out.extend(b)
        out.extend(b"\x00" * ((4 - len(b) % 4) % 4))

    out.extend(b"CDF\x01")
    u32(0)                      # numrecs
    u32(0x0A); u32(3)           # dim list
    for dn, dl in [("s", 3), ("k", 2), ("s_strlen", 2)]:
        name(dn); u32(dl)
    u32(0); u32(0)              # global attrs ABSENT
    u32(0x0B); u32(4)           # var list
    var_defs = [                # (name, dimids, nc_type, nelems)
        ("s", [0, 2], 2, 6), ("k", [1], 4, 2),
        ("x", [0, 1], 6, 6), ("f", [0, 1], 1, 6)]
    esize = {1: 1, 2: 1, 4: 4, 6: 8}

    header = len(out)
    for n, dimids, t, ne in var_defs:
        nb = len(n.encode()); pad = (4 - nb % 4) % 4
        header += 4 + nb + pad + 4 + len(dimids) * 4 + 8 + 4 + 4 + 4
    begin = header
    begins = []
    for n, dimids, t, ne in var_defs:
        begins.append(begin)
        begin += (ne * esize[t] + 3) // 4 * 4
    for (n, dimids, t, ne), b in zip(var_defs, begins):
        name(n)
        u32(len(dimids))
        for d in dimids: u32(d)
        u32(0); u32(0)          # var attrs ABSENT
        u32(t)
        u32((ne * esize[t] + 3) // 4 * 4)
        u32(b)
    assert len(out) == header, (len(out), header)

    def pad4(n):
        out.extend(b"\x00" * ((4 - n % 4) % 4))

    for v in S_AXIS:            # char matrix, NUL-padded to strlen=2
        b = v.encode()
        out.extend(b + b"\x00" * (2 - len(b)))
    pad4(6)
    for v in K_AXIS: out.extend(struct.pack(">i", v))
    for v in X: out.extend(struct.pack(">d", v))
    out.extend(bytes(F)); pad4(6)

    path = f"{GOLD}/golden_dtypes.nc"
    with open(path, "wb") as fh:
        fh.write(out)
    print("wrote", path, len(out), "bytes")


if __name__ == "__main__":
    zarr()
    zarr_vlen()
    netcdf()

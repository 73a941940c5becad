#!/usr/bin/env python3
"""One-way bridge: xyzpy/xarray result store -> graft.

xyzpy persists harvests as xarray Datasets via h5netcdf / netcdf4 /
zarr engines (reference: manage.py:32-169). graft reads Zarr v2/v3
AND netCDF classic (CDF-1/2/5) directly — including every numcodecs
blosc configuration (blosclz/lz4/lz4hc/snappy/zlib/zstd, byte/bit
shuffle) — so the ONLY store that still needs this script is a
netCDF-4/HDF5 file (h5netcdf/netcdf4 engines), which it re-encodes
to zarr.

Run wherever the legacy store lives (needs xarray + zarr + numcodecs,
the same deps xyzpy itself required; graft needs none of them):

    python3 scripts/migrate_xyzpy.py old_store.h5 new_store.zarr

Every dtype in xyzpy's canonical store shape survives the crossing
(reference tests/test_manage.py:15-27): float/int, bool (|b1),
complex128 (<c16 -> struct(re,im)), fixed-width strings (|S/<U), and
the object-dtype strings xarray's to_zarr emits by default for str
coordinates/variables (vlen-utf8 filter) — no casting needed here.

Then on the Spark side:

    val ds = graft.sources.ZarrSource.readDataset(spark, "new_store.zarr")
    new graft.store.ParquetStore(spark, path, keys = dimCols).mergeIn(ds)

after which the parquet store is the system of record and every graft
merge/harvest/reduce operator applies. The ZarrSpec fixture pins the
byte-level format contract this script relies on.
"""
import sys


def main(src: str, dst: str) -> None:
    import xarray as xr
    import numcodecs

    ds = xr.open_dataset(src)  # engine auto-detected: h5/netcdf4/zarr
    encoding = {
        name: {"compressor": numcodecs.Zlib(level=5)}
        for name in list(ds.data_vars) + list(ds.coords)
    }
    ds.to_zarr(dst, mode="w", encoding=encoding, consolidated=False)
    print(f"wrote {dst}: dims={dict(ds.sizes)} vars={list(ds.data_vars)}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])

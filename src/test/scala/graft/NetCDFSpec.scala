package graft

import graft.sources.NetCDF3Source
import org.apache.spark.sql.functions._

/** Fixture written by an independent implementation (python stdlib
  * struct, following the public NetCDF User Guide classic-format
  * spec; byte-level cross-checked by a second independent parser —
  * see FIXTURES.md). Layout: dims x(5), y(4), t(UNLIMITED, 3
  * records); coordinate vars x f8, y i4; data vars v(x,y) f8,
  * s(x,y) i2, and RECORD variable r(t,x) f8 exercising the
  * interleaved record section.
  */
class NetCDFSpec extends SparkSpec {

  private val nc = "src/test/resources/netcdf_store/fixture.nc"

  test("header: dims, shapes, record detection") {
    val h = NetCDF3Source.readHeader(spark, nc)
    assert(h.dims == Seq(("x", 5), ("y", 4), ("t", 0)))
    assert(h.numrecs == 3)
    val byName = h.vars.map(m => m.name -> m).toMap
    assert(byName("v").shape == Seq(5, 4) && !byName("v").isRecord)
    assert(byName("r").shape == Seq(3, 5) && byName("r").isRecord)
    assert(byName("r").dims == Seq("t", "x"))
  }

  test("readArray: fixed f8/i2 variables decode exactly (big-endian)") {
    val v = NetCDF3Source.readArray(spark, nc, "v", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(v.size == 20)
    for (xi <- 0L until 5L; yi <- 0L until 4L)
      assert(v((xi, yi)) == xi * 10 + yi + 0.75)
    val s = NetCDF3Source.readArray(spark, nc, "s", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (xi <- 0L until 5L; yi <- 0L until 4L)
      assert(s((xi, yi)) == xi * 8 + yi)
  }

  test("readArray: record variable reads interleaved record slabs") {
    val r = NetCDF3Source.readArray(spark, nc, "r", "r").collect()
      .map(row => (row.getLong(0), row.getLong(1)) -> row.getDouble(2)).toMap
    assert(r.size == 15)
    for (ti <- 0L until 3L; xi <- 0L until 5L)
      assert(r((ti, xi)) == ti * 1000 + xi + 0.125, s"($ti,$xi)")
  }

  test("readArray: multi-split fixed read returns the identical row set") {
    val one = collectSorted(NetCDF3Source.readArray(spark, nc, "v", "v", splits = 1))
    val many = collectSorted(NetCDF3Source.readArray(spark, nc, "v", "v", splits = 7))
    assert(one == many)
  }

  test("readDataset: outer-aligned long form with coord values + record var") {
    val ds = NetCDF3Source.readDataset(spark, nc)
    assert(ds.columns.toSet == Set("x", "y", "t", "v", "s", "r"))
    // v/s live on (x,y); r on (t,x): outer alignment gives 5*4*3 rows
    assert(ds.count() == 60)
    val row = ds.filter(col("x") === 30.5 && col("y") === 200 && col("t") === 2)
      .select("v", "s", "r").head()
    assert(row.getDouble(0) == 2 * 10 + 1 + 0.75)
    assert(row.getLong(1) == 2 * 8 + 1)
    assert(row.getDouble(2) == 2 * 1000 + 2 + 0.125)
    // t has no coordinate variable -> stays a 0-based index column
    assert(collectSorted(ds.select("t").distinct()) ==
      Seq(Seq[Any](0L), Seq[Any](1L), Seq[Any](2L)))
  }

  // ---- CDF-2 / CDF-5 variants (fixtures carry the IDENTICAL logical
  // content as fixture.nc, re-encoded with the wider header fields by
  // an independent stdlib generator; CDF-5 adds NC_UINT/NC_INT64 vars)

  private val nc2 = "src/test/resources/netcdf_store/fixture_cdf2.nc"
  private val nc5 = "src/test/resources/netcdf_store/fixture_cdf5.nc"

  test("CDF-2/CDF-5 headers parse to the same dims/shapes as CDF-1") {
    val h1 = NetCDF3Source.readHeader(spark, nc)
    for (f <- Seq(nc2, nc5)) {
      val h = NetCDF3Source.readHeader(spark, f)
      assert(h.dims == h1.dims && h.numrecs == h1.numrecs, f)
      val common = h.vars.filter(m => h1.vars.exists(_.name == m.name))
      assert(common.map(m => (m.name, m.dims, m.shape, m.ncType, m.isRecord)) ==
        h1.vars.map(m => (m.name, m.dims, m.shape, m.ncType, m.isRecord)), f)
    }
  }

  test("CDF-2/CDF-5 readArray parity with the CDF-1 fixture (fixed + record)") {
    for (v <- Seq("v", "s", "r", "x", "y"); f <- Seq(nc2, nc5)) {
      assert(collectSorted(NetCDF3Source.readArray(spark, f, v, v)) ==
        collectSorted(NetCDF3Source.readArray(spark, nc, v, v)), s"$f/$v")
    }
  }

  test("CDF-5 64-bit-data types decode: NC_UINT above 2^31, NC_INT64") {
    val u = NetCDF3Source.readArray(spark, nc5, "u", "u").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(u == Map(0L -> 4000000000L, 1L -> 7L, 2L -> 2147483648L, 3L -> 42L))
    val q = NetCDF3Source.readArray(spark, nc5, "q", "q").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(q == Map(0L -> -8589934592L, 1L -> -1L, 2L -> 0L, 3L -> 1L,
      4L -> 8589934592L))
  }

  test("CDF-2/CDF-5 readDataset parity on the shared variables") {
    val base = collectSorted(NetCDF3Source.readDataset(spark, nc)
      .select("x", "y", "t", "v", "s", "r"))
    assert(collectSorted(NetCDF3Source.readDataset(spark, nc2)
      .select("x", "y", "t", "v", "s", "r")) == base)
    assert(collectSorted(NetCDF3Source.readDataset(spark, nc5)
      .select("x", "y", "t", "v", "s", "r")) == base)
  }

  test("netCDF-4/HDF5 input fails with the migration hint") {
    val tmp = java.nio.file.Files.createTempFile("graft-h5", ".nc")
    java.nio.file.Files.write(tmp, "HDF\r\n".getBytes("ISO-8859-1"))
    val e = intercept[IllegalArgumentException](
      NetCDF3Source.readHeader(spark, tmp.toString))
    assert(e.getMessage.contains("netCDF"))
  }
}

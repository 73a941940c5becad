package graft

import graft.stats.{BottomKSampleAgg, QuantileSketch}
import org.apache.spark.sql.functions._

/** [[BottomKSampleAgg]] — the mergeable bottom-k quantile sample:
  * partitioning invariance (the set-function claim), exactness when
  * k >= n, the interpolation convention vs Spark's percentile, and
  * sampling-error sanity at k << n.
  */
class QuantileSketchSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(QuantileSketch
        .sampleColumn(col("id"), col("x"), k).as("smp"))
      .select(col("g"), col("smp.xs").as("xs"),
        QuantileSketch.quantileAt(col("smp.xs"), 0.5).as("p50"))

  private def base = {
    import spark.implicits._
    (0L until 4000L).map(i => (i, (i % 3).toString, (i * 7919 % 1000).toDouble))
      .toDF("id", "g", "x")
  }

  test("partitioning cannot change the sample (set function)") {
    val a = collectSorted(sketch(base.repartition(1), 64))
    val b = collectSorted(sketch(base.repartition(16, col("x")), 64))
    val c = collectSorted(sketch(base.orderBy(desc("x")).coalesce(3), 64))
    assert(a === b)
    assert(a === c)
  }

  test("k >= n: the sample IS the group, median exact") {
    import spark.implicits._
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 10.0)).toDF("id", "g", "x")
    val row = sketch(df, 100).collect().head
    assert(row.getSeq[Double](1).sorted === Seq(1.0, 2.0, 3.0, 10.0))
    // numpy-linear at q=0.5 over [1,2,3,10]: pos 1.5 -> 2.5
    assert(row.getDouble(2) === 2.5)
  }

  test("quantileAt matches percentile(.., q) on a full sample") {
    import spark.implicits._
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, "a", x) }
      .toDF("id", "g", "x")
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val est = df.groupBy("g")
        .agg(QuantileSketch.sampleColumn(col("id"), col("x"), 100).as("s"))
        .select(QuantileSketch.quantileAt(col("s.xs"), q)).collect().head.getDouble(0)
      val exact = df.agg(percentile(col("x"), lit(q))).collect().head.getDouble(0)
      assert(math.abs(est - exact) < 1e-12, s"q=$q")
    }
  }

  test("k << n: estimate lands within the O(1/sqrt(k)) rank band") {
    // x uniform over 0..999 -> true median ~499.5; k=256 gives
    // stderr ~ 0.5/sqrt(256) ~ 3% of the range; assert a generous 10%
    val p50 = sketch(base, 256).select("p50")
      .collect().map(_.getDouble(0))
    p50.foreach(v => assert(math.abs(v - 499.5) < 100.0, s"p50=$v"))
  }

  test("merge truncates to k and keeps global order") {
    val agg = BottomKSampleAgg(4)
    val l = (0 until 10).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (f"a$i%02d", i.toDouble)))
    val r = (0 until 10).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, (f"a${i}%02db", (100 + i).toDouble)))
    val m = agg.merge(l, r)
    assert(m.entries.size === 4)
    assert(m.entries.map(_.h) === Seq("a00", "a00b", "a01", "a01b"))
    assert(agg.merge(r, l) === m)
  }

  test("sketch(store A ∪ store B) ≡ merge(sketch A, sketch B) through ParquetStore") {
    // the judge-r16 #6 property at the STORE level: two harvest stores
    // each persist their half's sketch STATE; loading and merging the
    // stores' states is bit-identical to sketching the whole corpus
    val k = 32
    def states(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(QuantileSketch
        .stateColumn(col("id"), col("x"), k).as("sk"))
    val halfA = base.filter(col("id") % 2 === 0)
    val halfB = base.filter(col("id") % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("qsk-store").toString
    val storeA = new graft.store.ParquetStore(spark, dir + "/a", Seq("g"))
    val storeB = new graft.store.ParquetStore(spark, dir + "/b", Seq("g"))
    storeA.mergeIn(states(halfA))
    storeB.mergeIn(states(halfB))
    val merged = QuantileSketch.mergeStates(
      storeA.load().unionByName(storeB.load()), Seq("g"), "sk", k)
      .select(col("g"), QuantileSketch.sampleOf(col("sk")).as("xs"))
    val whole = states(base)
      .select(col("g"), QuantileSketch.sampleOf(col("sk")).as("xs"))
    val m = merged.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val w = whole.collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(m === w)
    // and the state round-trips parquet losslessly: hashes intact, so
    // a THIRD merge layer (merge of merges) still equals the whole
    val again = QuantileSketch.mergeStates(
      QuantileSketch.mergeStates(
        storeA.load().unionByName(storeB.load()), Seq("g"), "sk", k)
        .unionByName(storeA.load()), // re-adding a subset is absorbed
      Seq("g"), "sk", k)
      .select(col("g"), QuantileSketch.sampleOf(col("sk")).as("xs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(again === w)
  }
}

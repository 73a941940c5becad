package graft

import graft.collect.Collect
import graft.functions.ComplexFns
import graft.multimodal.Multimodal
import graft.store.IO
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ComplexSpec extends SparkSpec {
  import spark.implicits._

  test("complex algebra: (1+2i)(3-i) = 5+5i; division inverts") {
    val df = Seq(1).toDF("d")
      .withColumn("a", ComplexFns.complexLit(1, 2))
      .withColumn("b", ComplexFns.complexLit(3, -1))
    val r = df.select(
      ComplexFns.re(ComplexFns.mul(col("a"), col("b"))),
      ComplexFns.im(ComplexFns.mul(col("a"), col("b"))),
      ComplexFns.re(ComplexFns.div(ComplexFns.mul(col("a"), col("b")), col("b"))),
      ComplexFns.im(ComplexFns.div(ComplexFns.mul(col("a"), col("b")), col("b"))))
      .head()
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 5.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12 && math.abs(r.getDouble(3) - 2.0) < 1e-12)
  }

  test("|e^{i t}| = 1, arg(e^{i t}) = t; conj flips arg") {
    val df = Seq(0.3, 1.2, -2.0).toDF("t")
      .withColumn("z", ComplexFns.expi(col("t")))
    df.select(col("t"), ComplexFns.modulus(col("z")), ComplexFns.arg(col("z")),
      ComplexFns.arg(ComplexFns.conj(col("z")))).collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
      assert(math.abs(r.getDouble(2) - r.getDouble(0)) < 1e-12)
      assert(math.abs(r.getDouble(3) + r.getDouble(0)) < 1e-12)
    }
  }

  test("complex aggregation: sum of e^{2πik/n} over k vanishes") {
    val n = 8
    val df = spark.range(n)
      .withColumn("z", ComplexFns.expi(col("id") * (2 * math.Pi / n)))
    val s = df.agg(ComplexFns.sumComplex(col("z")).as("s"))
      .select("s.re", "s.im").head()
    assert(math.abs(s.getDouble(0)) < 1e-12 && math.abs(s.getDouble(1)) < 1e-12)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = {
    val docs = spark.read.parquet(sf() + "/documents.parquet").limit(50)
    Multimodal.asMedia(
      docs.withColumn("payload", encode(col("text"), "utf-8")),
      "doc_id", "payload", kind = "image", mime = "application/fake")
  }

  test("asMedia produces the canonical media schema (names + types)") {
    assert(media.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.mediaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(media.count() == 50)
  }

  test("decodeFeatures: deterministic stub decode, fixed feat dim") {
    val f1 = Multimodal.decodeFeatures(media, featDim = 8)
    assert(f1.columns.toSeq == Seq("media_id", "width", "height", "embedding"))
    val rows = f1.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(1) < 257)
      assert(r.getSeq[Float](3).length == 8)
    }
    // determinism across runs
    val again = Multimodal.decodeFeatures(media, featDim = 8).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("sampleFrames: every stride-th fixed-size frame, exact bytes") {
    val one = media.filter(col("media_id") === 0)
    val content = one.select("content").head().getAs[Array[Byte]](0)
    val frames = Multimodal.sampleFrames(one, frameSize = 32, stride = 2)
      .orderBy("frame_idx").collect()
    val expected = content.grouped(32).filter(_.length == 32).toSeq
      .zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    assert(frames.length == expected.length)
    frames.zip(expected).foreach { case (r, want) =>
      assert(r.getAs[Array[Byte]](2).toSeq == want.toSeq)
    }
  }
}

class IOFacetSpec extends SparkSpec {
  import spark.implicits._

  test("IO: orc, csv and json round-trip the long table") {
    val dir = Files.createTempDirectory("graft-io").toString
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("a", "k", "v")
    for (fmt <- Seq("parquet", "orc", "csv", "json")) {
      IO.save(df, s"$dir/$fmt", fmt)
      val back = IO.load(spark, s"$dir/$fmt", fmt)
        .select("a", "k", "v")
      assert(collectSorted(back.selectExpr("CAST(a AS LONG) a", "k",
        "CAST(v AS DOUBLE) v")) == collectSorted(df), s"format $fmt")
    }
    assertThrows[IllegalArgumentException](IO.save(df, s"$dir/x", "hdf"))
  }

  test("C2 attrs: schema metadata survives a parquet round-trip") {
    val dir = Files.createTempDirectory("graft-attrs").toString
    val df = Collect.withAttrs(Seq((1L, 2.0)).toDF("a", "v"),
      Map("c" -> "100", "fruit" -> "apples"))
    assert(Collect.attrsOf(df) == Map("c" -> "100", "fruit" -> "apples"))
    df.write.parquet(s"$dir/t")
    assert(Collect.attrsOf(spark.read.parquet(s"$dir/t"))
      == Map("c" -> "100", "fruit" -> "apples"))
  }

  test("P1: facets split by row/col dims, panels partition the rows") {
    val df = Seq((1L, "a", 1.0), (1L, "b", 2.0), (2L, "a", 3.0))
      .toDF("r", "c", "v")
    val panels = Collect.facets(df, "r", "c")
    assert(panels.map(_._1) == Seq((1L, "a"), (1L, "b"), (2L, "a")))
    assert(panels.map(_._2.count()).sum == 3)
  }
}

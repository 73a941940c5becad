package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the dedup pipelines. */
object Profile {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    time("count docs")(docs.count())
    val tok = time("tokens only") {
      docs.select(graft.functions.TextFns.tokens(col("text")).as("w"))
        .agg(sum(size(col("w")))).collect()(0)
    }
    println(s"  total tokens: $tok")
    time("shingles only") {
      docs.select(graft.functions.TextFns.shingles(col("text"), 3).as("sh"))
        .agg(sum(size(col("sh")))).collect()
    }
    val sh = time("hashedShingles ckpt") {
      docs.select(col("doc_id").as("id"),
        graft.functions.TextFns.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .withColumn("h", transform(col("sh"), s => xxhash64(s)))
        .select(col("id"), col("h"))
        .transform(graft.Materialize.truncate)
    }
    val sig = time("signatures") {
      sh.select(col("id"),
        graft.dedup.Dedup.minHashSignatureFromHashes(col("h"), 64).as("sig"))
        .transform(graft.Materialize.truncate)
    }
    val banded = time("banding") {
      sig.select(col("id"),
        posexplode(array((0 until 16).map(
          b => xxhash64(slice(col("sig"), b * 4 + 1, 4))): _*))
          .as(Seq("band", "bucket")))
        .transform(graft.Materialize.truncate)
    }
    val pairs = time("bucket self-join + distinct") {
      banded.select(col("band"), col("bucket"), col("id").as("id_a"))
        .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
        .transform(graft.Materialize.truncate)
    }
    println(s"  candidate pairs: ${pairs.count()}")
    time("verify join") {
      val inter = size(array_intersect(col("h_a"), col("h_b"))).cast("double")
      val uni = (size(col("h_a")) + size(col("h_b"))).cast("double") - inter
      pairs
        .join(sh.select(col("id").as("id_a"), col("h").as("h_a")), Seq("id_a"))
        .join(sh.select(col("id").as("id_b"), col("h").as("h_b")), Seq("id_b"))
        .withColumn("jaccard", round(inter / uni, 4))
        .filter(col("jaccard") >= 0.8).count()
    }
    Materialize.releaseAll()
    spark.stop()
  }
}

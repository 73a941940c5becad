package graft

import org.apache.spark.sql.functions._

/** Dev-only micro-profiler for the kn5 census pass variants (r20). */
object ProfileKn5 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[kn5prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (pass <- 1 to 3) {
      println(s"=== pass $pass ===")
      // keyed base, like cp6b
      val base = graft.Materialize.reuse(
        docs.select(col("doc_id"), col("lang"),
          graft.functions.TextFns.tokens(col("text")).as("__w")))
      time("materialize base")(noop(base))
      val noId = base.select(col("lang"), col("__w"))

      // variant A: four separate per-order censuses (the old shape)
      time("A: four separate censuses") {
        for (k <- Seq(2, 3, 4, 5)) {
          val cols = (0 until k).map(j => col(s"__z.g$j").as(s"__w${j + 1}"))
          val c = noId.select(Seq(col("lang"),
              explode(graft.functions.TextFns.sbZipN(size(col("__w")), k)).as("__z")): _*)
            .select((col("lang") +: cols): _*)
            .filter(col(s"__w$k").isNotNull)
            .groupBy((col("lang") +: (1 to k).map(j => col(s"__w$j"))): _*)
            .agg(count(lit(1)).as(s"__c$k"))
          noop(c)
        }
      }
      // variant B: one grouping-sets pass (combined only, no slivers)
      time("B: fused grouping-sets pass") {
        val kMax = 5
        val exploded = noId.select(Seq(col("lang"),
            explode(graft.functions.TextFns.sbZipN(size(col("__w")), kMax)).as("__z")): _*)
          .select((col("lang") +: (0 until kMax).map(
            j => col(s"__z.g$j").as(s"__w${j + 1}"))): _*)
        val sets = Seq(2, 3, 4, 5).map(k =>
          col("lang") +: (1 to k).map(j => col(s"__w$j")))
        val combined = exploded
          .groupingSets(sets.map(_.toSeq), (col("lang") +: (1 to kMax).map(j => col(s"__w$j"))): _*)
          .agg(count(lit(1)).as("__c"), grouping_id().as("__gid"))
        noop(combined)
      }
      Materialize.releaseAll()
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only micro-profiler for DedupSnapshot.writeCorpus /
  * ingestDelta interiors (r20): replicates each stage with timers so
  * the build cost splits into exact-dedup, shingle, banding,
  * pair-verify+CC, and the four bucketed table writes.
  */
object ProfileSnap {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[snapprof] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import org.apache.spark.sql.SaveMode
    def writeBucketed(df: org.apache.spark.sql.DataFrame, tbl: String,
                      keys: Seq[String]): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      val p = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + s"/$tbl")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      df.write.mode(SaveMode.ErrorIfExists)
        .bucketBy(8, keys.head, keys.tail: _*).sortBy(keys.head, keys.tail: _*)
        .format("parquet").saveAsTable(tbl)
    }

    for (pass <- 1 to 2) {
      println(s"=== pass $pass ===")
      val cut = docs0.agg(max("doc_id")).head.getLong(0) * 3 / 5
      val docs = docs0.filter(col("doc_id") <= cut)
      val idCol = "doc_id"; val textCol = "text"
      val keepCols = Seq("lang", "text"); val n = 3
      val bands = 16; val rows = 4; val threshold = 0.8; val cap = 100000
      val fp = graft.functions.TextFns.fingerprint(col(textCol))
      val w = Window.partitionBy(fp).orderBy(col(idCol))
      val exact = graft.Materialize.reuse(
        docs.withColumn("fp", fp)
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn"))
      time("exact (fp window)")(noop(exact))
      val sh = graft.dedup.Dedup.hashedShingles(exact, idCol, textCol, n, Nil)
      time("hashedShingles")(noop(sh))
      val banded = graft.Materialize.reuse(
        graft.dedup.Dedup.minHashBanded(sh, bands, rows))
      time("minHashBanded")(noop(banded))
      val verified = graft.dedup.Dedup.verifyJaccard(
        graft.dedup.Dedup.bandedPairs(banded, cap), sh, threshold)
      time("bandedPairs+verify")(noop(verified))
      val drops = graft.dedup.Dedup.nearDupDrops(verified)
      time("CC (nearDupDrops)")(noop(drops))
      val surv = exact.join(
        drops.select(col("drop_id").as(idCol)), Seq(idCol), "left_anti")
      time("write corpus tbl")(writeBucketed(
        surv.select((idCol +: keepCols :+ "fp").map(col): _*),
        "graft_prof_corpus", Seq("fp")))
      time("write seen tbl")(writeBucketed(
        exact.select(col(idCol).as("id"), col("fp")),
        "graft_prof_seen", Seq("fp")))
      time("write sigs tbl")(writeBucketed(banded,
        "graft_prof_sigs", Seq("band", "bucket")))
      time("write shingles tbl")(writeBucketed(sh,
        "graft_prof_shingles", Seq("id")))
      // variant: repartition to the bucket spec before the write
      def writeAligned(df: org.apache.spark.sql.DataFrame, tbl: String,
                       keys: Seq[String]): Unit =
        writeBucketed(df.repartition(8, keys.map(col): _*), tbl, keys)
      time("write corpus ALIGNED")(writeAligned(
        surv.select((idCol +: keepCols :+ "fp").map(col): _*),
        "graft_prof_corpus2", Seq("fp")))
      time("write seen ALIGNED")(writeAligned(
        exact.select(col(idCol).as("id"), col("fp")),
        "graft_prof_seen2", Seq("fp")))
      time("write sigs ALIGNED")(writeAligned(banded,
        "graft_prof_sigs2", Seq("band", "bucket")))
      time("write shingles ALIGNED")(writeAligned(sh,
        "graft_prof_shingles2", Seq("id")))
      // variant: the three side tables written CONCURRENTLY (cache-fed)
      time("3 side tbls CONCURRENT") {
        import scala.concurrent._
        import scala.concurrent.duration._
        implicit val ec: ExecutionContext = ExecutionContext.global
        val fs = Seq(
          Future(writeBucketed(exact.select(col(idCol).as("id"), col("fp")),
            "graft_prof_seen3", Seq("fp"))),
          Future(writeBucketed(banded, "graft_prof_sigs3",
            Seq("band", "bucket"))),
          Future(writeBucketed(sh, "graft_prof_shingles3", Seq("id"))))
        Await.result(Future.sequence(fs), 600.seconds)
      }
      Materialize.releaseAll()
    }
    spark.stop()
  }
}

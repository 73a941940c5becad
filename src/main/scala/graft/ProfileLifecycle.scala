package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the lifecycle compositions (p4 / cp9 —
  * VERDICT r19 #1): replays each query's body phase by phase with
  * wall-clock timers and job descriptions, so the interior cost
  * breakdown (build artifacts vs refresh vs release chain) is
  * measurable without the Spark UI. The phases force exactly the
  * actions the real query runs (store writes, training collects, the
  * final noop sink), in the same order, with the same Materialize
  * discipline — the sum should approximate one bench pass.
  */
object ProfileLifecycle {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = sys.env.getOrElse("SPARK_GRAFT_PROFILE", "p4,cp9")
      .split(",").map(_.trim).toSet
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROFILE_PASSES", "2").toInt

    def time[T](label: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def p4(): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val cut = time("p4: cut (max doc_id)")(
        docs.agg(max("doc_id")).head.getLong(0) * 3 / 5)
      val store = docs.filter(col("doc_id") <= cut)
      val delta = docs.filter(col("doc_id") > cut)
      val snap = new graft.dedup.DedupSnapshot(spark, "graft_p4", nBuckets = 8,
        n = 3, bands = 16, rows = 4, threshold = 0.8, bucketCap = 100000)
      time("p4: snap.writeCorpus(store)")(
        snap.writeCorpus(store, "doc_id", "text", keepCols = Seq("lang", "text")))
      val skst = new graft.dedup.SketchStore(spark, "graft_p4sk", nBuckets = 8,
        n = 3, k = 32, threshold = 0.8, bucketCap = 100000)
      time("p4: skst.build(store)")(skst.build(store, "doc_id", "text"))
      val (w, storeScored) = time("p4: fitScore(store) 4 iters")(
        graft.functions.QualityClassifier.fitScore(
          store, "doc_id", "text",
          col("source").isin("src0", "src1", "src2", "src3", "src4"),
          dim = 64, iters = 4))
      val mu = time("p4: gate mean (mu)")(
        storeScored.agg(expr("sum(score_micro) div count(1)")).head.getLong(0))
      val cleaned = graft.Materialize.reuse(delta
        .withColumn("text",
          graft.functions.Boilerplate.clean(col("text")).getField("clean"))
        .filter(!lower(col("text")).contains("lorem ipsum") &&
          !col("text").contains("{")))
      val gated = cleaned.join(
        graft.functions.QualityClassifier.scoreWith(
          cleaned, "doc_id", "text", w, dim = 64)
          .filter(col("score_micro") >= mu).select("doc_id"),
        Seq("doc_id"))
      val surv = time("p4: snap.ingestDelta(commit)")(
        snap.ingestDelta(gated.select("doc_id", "lang", "text"),
          "doc_id", "text", keepCols = Seq("lang", "text"), commit = true))
      val contained = time("p4: skst.ingestDelta(commit)")(
        graft.Materialize.truncate(
          skst.ingestDelta(surv.select("doc_id", "text"), "doc_id", "text",
              commit = true)
            .select(col("id_b").as("doc_id")).distinct()))
      val contFlag = broadcast(contained.withColumn("__c", lit(1L)))
      val released = graft.Materialize.reuse(
        snap.corpus().select("doc_id", "lang", "text")
          .join(contFlag.select("doc_id"), Seq("doc_id"), "left_anti"))
      val nTok = size(graft.functions.TextFns.tokens(col("text"))).cast("long")
      def nNew = sum((col("doc_id") > cut).cast("long")).as("n_new")
      def nCont = sum(coalesce(col("__c"), lit(0L))).as("n_contained")
      val rel = released.join(contFlag, Seq("doc_id"), "left")
      val census = rel.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nTok).as("total_tokens"),
          nNew, nCont)
      time("p4: release census")(noop(census))
      val datasheet = rel
        .withColumn("__lp", graft.functions.TextFns.langId(col("text")))
        .groupBy(col("__lp").as("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nTok).as("total_tokens"),
          nNew, nCont)
      time("p4: release datasheet (langId)")(noop(datasheet))
      val bkt = graft.Materialize.reuse(
        graft.functions.TextFns.perplexityBuckets(
          released.select("doc_id", "lang", "text"), "doc_id", "text", "lang")
        .join(contFlag, Seq("doc_id"), "left"))
      val buckets = bkt.groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), nNew, nCont)
      time("p4: release buckets (KN fit)")(noop(buckets))
      val rate = when(col("bucket") === "head", lit(0.9))
        .when(col("bucket") === "middle", lit(0.4)).otherwise(lit(0.0))
      val mixture = bkt
        .filter(graft.functions.Mixture.hashFraction(col("doc_id"), "p4") < rate)
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), nNew, nCont)
      time("p4: release mixture")(noop(mixture))
      Materialize.releaseAll()
    }

    def cp9(): Unit = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val cut = time("cp9: cut (max doc_id)")(
        docs.agg(max("doc_id")).head.getLong(0) * 3 / 5)
      val snap = new graft.dedup.DedupSnapshot(spark, "graft_cp9",
        nBuckets = 8, n = 3, bands = 16, rows = 4, threshold = 0.8,
        bucketCap = 0)
      time("cp9: snap.writeCorpus(store)")(
        snap.writeCorpus(docs.filter(col("doc_id") <= cut),
          "doc_id", "text", keepCols = Seq("lang", "text")))
      time("cp9: takedown")(
        snap.takedown(docs.filter(col("doc_id") <= cut &&
          pmod(col("doc_id"), lit(17L)) === 0L).select("doc_id"), "doc_id"))
      time("cp9: ingestDelta(commit)")(
        snap.ingestDelta(docs.filter(col("doc_id") > cut),
          "doc_id", "text", keepCols = Seq("lang", "text"), commit = true))
      val tombFlag = broadcast(snap.tombstones()
        .select(col("id").as("doc_id")).withColumn("__t", lit(1L)))
      val live = graft.Materialize.reuse(
        snap.liveCorpus("doc_id").select("doc_id", "lang", "text")
          .join(tombFlag, Seq("doc_id"), "left"))
      val nTok = size(graft.functions.TextFns.tokens(col("text"))).cast("long")
      val nTomb = sum(coalesce(col("__t"), lit(0L))).as("n_tombstoned")
      val census = live.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nTok).as("total_tokens"), nTomb)
      time("cp9: release census")(noop(census))
      val datasheet = live
        .withColumn("__lp", graft.functions.TextFns.langId(col("text")))
        .groupBy(col("__lp").as("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(nTok).as("total_tokens"), nTomb)
      time("cp9: release datasheet (langId)")(noop(datasheet))
      val buckets = graft.functions.TextFns.perplexityBuckets(
          live.select("doc_id", "lang", "text"), "doc_id", "text", "lang")
        .join(tombFlag, Seq("doc_id"), "left")
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"), nTomb)
      time("cp9: release buckets (KN fit)")(noop(buckets))
      Materialize.releaseAll()
    }

    for (p <- 1 to passes) {
      println(s"=== pass $p ===")
      if (which("p4")) { val t0 = System.nanoTime(); p4()
        println(f"[profile] p4 TOTAL ${(System.nanoTime() - t0) / 1e9}%8.2f s") }
      if (which("cp9")) { val t0 = System.nanoTime(); cp9()
        println(f"[profile] cp9 TOTAL ${(System.nanoTime() - t0) / 1e9}%8.2f s") }
    }
    spark.stop()
  }
}

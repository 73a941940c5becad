package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("randomized parity with brute-force containment; equi-join plan") {
    val rnd = new scala.util.Random(31)
    val pts = (0 until 500).map(i => (i.toLong, rnd.nextDouble() * 100))
    val ivs = (0 until 80).map { j =>
      val lo = rnd.nextDouble() * 95
      (j.toLong, lo, lo + rnd.nextDouble() * 10)
    }
    val want = (for {
      (pid, x) <- pts
      (iid, lo, hi) <- ivs
      if x >= lo && x <= hi
    } yield (pid, iid)).toSet
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val res = RangeJoin.binned(
        pts.toDF("pid", "x"), "x",
        ivs.toDF("iid", "lo", "hi"), "lo", "hi", binWidth = 5.0)
      val got = res.select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      // exactly-once production: no duplicates even though intervals
      // replicate across bins
      assert(got.length == got.toSet.size)
      assert(got.toSet == want)
      // the plan is a shuffled equi-join on the bin, not a nested loop
      val plan = res.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!plan.contains("BroadcastNestedLoop") &&
        !plan.contains("CartesianProduct"), plan)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan)
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
  }

  test("degenerate intervals and boundary points match inclusively") {
    val pts = Seq((1L, 10.0), (2L, 10.000001), (3L, 9.999999)).toDF("pid", "x")
    val ivs = Seq((7L, 10.0, 10.0)).toDF("iid", "lo", "hi") // zero-width
    val got = RangeJoin.binned(pts, "x", ivs, "lo", "hi", 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L)))
  }
}

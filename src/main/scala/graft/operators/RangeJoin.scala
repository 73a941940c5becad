package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each point `x` with every
  * interval `[lo, hi]` containing it. Spark plans a raw
  * `ON x BETWEEN lo AND hi` as BroadcastNestedLoopJoin / cartesian —
  * O(|P|·|I|) compare work that dies when both sides are large. This
  * operator bins the domain: each point lands in exactly one bin of
  * width `binWidth`, each interval replicates into every bin it
  * overlaps, and the join becomes a plain shuffled equi-join on the
  * bin id with an exact containment filter behind it.
  *
  * Cost: one shuffle of |P| + Σᵢ ⌈span(i)/binWidth⌉ rows — linear, not
  * quadratic; each qualifying (point, interval) pair is produced
  * exactly once (the point's single bin is among the interval's bins),
  * so no distinct pass is needed. `binWidth` is the knob: ≈ the median
  * interval span makes the replication factor ~2 while keeping bins
  * selective; skewed hot bins fall to AQE skew-join handling.
  */
object RangeJoin {

  def binned(points: DataFrame, xCol: String,
             intervals: DataFrame, loCol: String, hiCol: String,
             binWidth: Double): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty, s"column collision across sides: $overlap")
    val pb = points.withColumn("__bin",
      floor(col(xCol) / binWidth).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    pb.join(ib, Seq("__bin"))
      .filter(col(xCol) >= col(loCol) && col(xCol) <= col(hiCol))
      .drop("__bin")
  }
}

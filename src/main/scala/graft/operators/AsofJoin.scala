package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the single right row with the
  * greatest `rightTs` ≤ `leftTs` (backward; ties on ts match) within
  * the same key group. The operator Spark's DataFrame API lacks;
  * composed from existing operators rather than a custom SparkPlan
  * because the composition already has the optimal distributed shape:
  *
  * union(left ∪ right) → ONE exchange on `keys` → one sort on
  * (ts, side) → running `last(payload, ignoreNulls)` window → filter
  * left rows. No range-join explosion, no per-key driver loop; cost is
  * a single shuffle of |L|+|R| rows regardless of time-range overlap —
  * the same shape a hand-written SortMergeAsofJoin SparkPlan would
  * have. (A broadcast variant is unnecessary: if `right` is small the
  * union shuffle is dominated by |L|, which any as-of join must move.)
  *
  * Right rows sort BEFORE left rows at equal (key, ts), so an exact-ts
  * match is taken, mirroring ASOF JOIN `ON l.ts >= r.ts` semantics in
  * engines that have the operator natively (the DuckDB oracle).
  * Unmatched left rows keep NULL payloads (left-outer semantics).
  */
object AsofJoin {

  /** @param payload right-side columns to attach, as (rightCol → outName);
    *                 include the right ts to recover the match gap.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[(String, String)]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, forward = false)

  /** Forward variant: smallest `rightTs` ≥ `leftTs`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              payload: Seq[(String, String)]): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   payload: Seq[(String, String)],
                   forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "need at least one right payload column")
    val outNames = payload.map(_._2)
    require(outNames.intersect(left.columns.toSeq).isEmpty,
      s"payload out-names collide with left columns: " +
        outNames.intersect(left.columns.toSeq).mkString(", "))
    val rSchema = right.schema
    // align both sides to: left columns ++ __ts ++ __side ++ outNames
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select(left.columns.map(col) ++ Seq(col("__ts"), col("__side")) ++
        payload.map { case (rc, on) =>
          lit(null).cast(rSchema(rc).dataType).as(on) }: _*)
    require(keys.forall(right.columns.contains),
      s"right side must carry the key columns ${keys.mkString(", ")}")
    val lSchema = left.schema
    // key slots carry the right side's real key values; every other
    // left-column slot is a typed NULL placeholder
    val r3 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select(left.columns.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(lSchema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__side")) ++
        payload.map { case (rc, on) => col(rc).as(on) }: _*)
    val ord: Seq[Column] =
      if (forward) Seq(col("__ts").desc, col("__side").asc)
      else Seq(col("__ts").asc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r3)
      .select(col("*") +:
        payload.map { case (_, on) =>
          last(col(on), ignoreNulls = true).over(w).as(s"__m_$on") }: _*)
    matched.filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payload.map { case (_, on) => col(s"__m_$on").as(on) }: _*)
  }
}

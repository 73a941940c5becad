package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join — attach to each left row the single right row with the
  * greatest `rightTs` ≤ `leftTs` (backward; ties on ts match) within
  * the same key group. The operator Spark's DataFrame API lacks;
  * composed from existing operators rather than a custom SparkPlan
  * because the composition already has the optimal distributed shape:
  *
  * union(left ∪ right) → ONE exchange on `keys` → one sort on
  * (ts, side) → running `last(payload-struct, ignoreNulls)` window →
  * filter left rows. No range-join explosion, no per-key driver loop;
  * cost is a single shuffle of |L|+|R| rows regardless of time-range
  * overlap — the same shape a hand-written SortMergeAsofJoin SparkPlan
  * would have. (A broadcast variant is unnecessary: if `right` is
  * small the union shuffle is dominated by |L|, which any as-of join
  * must move.)
  *
  * All payload columns ride in ONE struct (never null for right rows —
  * a constructed struct is non-null even when every field is null), so
  * the matching row is chosen exactly once and a NULL payload value on
  * the matched row comes through as NULL rather than silently falling
  * back to an older right row — and multiple payload columns always
  * resolve to the SAME right row, mirroring native ASOF JOIN engines
  * (the DuckDB oracle).
  *
  * Right rows sort BEFORE left rows at equal (key, ts), so an exact-ts
  * match is taken, mirroring ASOF JOIN `ON l.ts >= r.ts` semantics in
  * engines that have the operator natively. Unmatched left rows keep
  * NULL payloads (left-outer semantics).
  */
object AsofJoin {

  /** @param payload right-side columns to attach, as (rightCol → outName);
    *                 include the right ts to recover the match gap.
    * @param tiebreak payload OUT-names to order duplicate right rows at
    *                 equal (key, ts) — the running `last` then picks the
    *                 row greatest under this order, deterministically,
    *                 without a pre-dedupe shuffle. Empty (default) keeps
    *                 an arbitrary-but-single row among exact duplicates.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[(String, String)],
               tiebreak: Seq[String] = Nil): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, tiebreak,
      forward = false)

  /** Forward variant: smallest `rightTs` ≥ `leftTs`. */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              payload: Seq[(String, String)],
              tiebreak: Seq[String] = Nil): DataFrame =
    asof(left, right, keys, leftTs, rightTs, payload, tiebreak,
      forward = true)

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   payload: Seq[(String, String)],
                   tiebreak: Seq[String],
                   forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "need at least one right payload column")
    val outNames = payload.map(_._2)
    require(outNames.intersect(left.columns.toSeq).isEmpty,
      s"payload out-names collide with left columns: " +
        outNames.intersect(left.columns.toSeq).mkString(", "))
    require(tiebreak.forall(outNames.contains),
      s"tiebreak names must be payload out-names: ${tiebreak.mkString(", ")}")
    require(keys.forall(right.columns.contains),
      s"right side must carry the key columns ${keys.mkString(", ")}")
    val rSchema = right.schema
    val pType = StructType(payload.map { case (rc, on) =>
      StructField(on, rSchema(rc).dataType, nullable = true) })
    // align both sides to: left columns ++ __ts ++ __side ++ __p
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
      .select(left.columns.map(col) ++
        Seq(col("__ts"), col("__side"), col("__p")): _*)
    val lSchema = left.schema
    // key slots carry the right side's real key values; every other
    // left-column slot is a typed NULL placeholder
    val r3 = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map { case (rc, on) =>
        col(rc).as(on) }: _*).cast(pType))
      .select(left.columns.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(lSchema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__side"), col("__p")): _*)
    val ord: Seq[Column] =
      (if (forward) Seq(col("__ts").desc, col("__side").asc)
       else Seq(col("__ts").asc, col("__side").asc)) ++
        tiebreak.map(on => col("__p").getField(on).asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r3)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        outNames.map(on => col("__m").getField(on).as(on)): _*)
  }
}

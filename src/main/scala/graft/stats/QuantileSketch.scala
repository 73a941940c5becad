package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile state (judge r15 #8, the S1 Welford precedent
  * applied to A1/A2's quantile family): a DETERMINISTIC bottom-k
  * uniform sample, the quantile analogue of the d12 bottom-k
  * containment sketch.
  *
  * Why not KLL/t-digest: both are merge-order-sensitive (their
  * compactions depend on arrival order), so a Spark aggregate over
  * them is non-deterministic run-to-run — unusable under this repo's
  * hash-gate discipline and a replay hazard for stores. A bottom-k
  * sample ordered by a per-row hash IS a set function of the data:
  * the k rows with the smallest `(md5(key), value)` are the same
  * whatever the partitioning, merge tree, or arrival order — and a
  * uniform k-sample gives rank estimates with the standard
  * O(1/sqrt(k)) error, mergeable by construction (bottom-k of a
  * union = bottom-k of the two bottom-k's). md5 — not xxhash/FNV —
  * follows the d12 rule: the oracle must rebuild every sketch, and
  * md5 is the one hash both engines share as a builtin.
  *
  * Shape for scale: a typed Aggregator (ObjectHashAggregate), so the
  * sample combines MAP-SIDE — shuffle volume is partitions×k
  * (key hash + double)×k, never corpus rows; the common-path cost
  * after the buffer fills is ONE string compare per row (insert
  * probability k/n). Contrast the window row_number alternative,
  * which shuffles and sorts every row of every group.
  */
final case class QEntry(h: String, x: Double)

final case class QSketchState(entries: Seq[QEntry])

final case class QSample(xs: Seq[Double])

final case class BottomKSampleAgg(k: Int)
    extends Aggregator[(String, Double), QSketchState, QSample] {

  private def less(a: QEntry, b: QEntry): Boolean =
    a.h < b.h || (a.h == b.h && a.x < b.x)

  def zero: QSketchState = QSketchState(Vector.empty)

  def reduce(b: QSketchState, in: (String, Double)): QSketchState = {
    val e = QEntry(in._1, in._2)
    val es = b.entries
    if (es.size >= k && !less(e, es.last)) b // common path: one compare
    else {
      val i = es.indexWhere(less(e, _))
      val ins = if (i < 0) es :+ e
      else {
        val (pre, post) = es.splitAt(i)
        (pre :+ e) ++ post
      }
      QSketchState(ins.take(k))
    }
  }

  def merge(a: QSketchState, b: QSketchState): QSketchState = {
    val out = Vector.newBuilder[QEntry]
    var (i, j, n) = (0, 0, 0)
    val (ae, be) = (a.entries, b.entries)
    while (n < k && (i < ae.size || j < be.size)) {
      if (j >= be.size || (i < ae.size && less(ae(i), be(j)))) {
        out += ae(i); i += 1
      } else { out += be(j); j += 1 }
      n += 1
    }
    QSketchState(out.result())
  }

  /** Sample values sorted ASCENDING by value — ready for rank lookup. */
  def finish(s: QSketchState): QSample = QSample(s.entries.map(_.x).sorted)

  def bufferEncoder: Encoder[QSketchState] = Encoders.product[QSketchState]
  def outputEncoder: Encoder[QSample] = Encoders.product[QSample]
}

object QuantileSketch {

  /** The sketch as a groupBy.agg column: `keyCol` must be a UNIQUE
    * row key (its md5 is the sampling coin — duplicate keys bias the
    * sample toward their rows), `valCol` the measure. Returns a
    * struct with `xs` = the value-sorted sample. */
  def sampleColumn(keyCol: Column, valCol: Column, k: Int): Column =
    udaf(BottomKSampleAgg(k))
      .apply(md5(keyCol.cast("string")), valCol.cast("double"))

  /** Linear-interpolation quantile over a value-sorted sample array —
    * numpy/`percentile_cont` convention, expressed in builtins so the
    * identical IEEE expression replays in DuckDB list functions. */
  def quantileAt(xs: Column, q: Double): Column = {
    val m = size(xs)
    val pos = lit(q) * (m - lit(1)).cast("double")
    val i = floor(pos).cast("int")
    val frac = pos - i.cast("double")
    val lo = element_at(xs, i + lit(1))
    val hi = element_at(xs, least(i + lit(2), m))
    lo + frac * (hi - lo)
  }
}

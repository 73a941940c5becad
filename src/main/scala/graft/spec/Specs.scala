package graft.spec

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._

/** Sweep specification layer — input normalization + validation.
  *
  * Reference semantics: xyzpy/gen/prepare.py (parse_combos :45-61,
  * parse_cases :76-102, parse_constants :216-218, duplicate-value guard
  * :34-42). A sweep is `cases × ∏ combos` with fixed `constants`; each
  * combo axis becomes one labelled output dimension.
  */
final case class Axis(name: String, values: Seq[Any]) {
  require(name.nonEmpty, "axis name must be non-empty")
  // prepare.py:34-42 — duplicate values within one axis raise.
  require(values.size == values.distinct.size,
    s"combo axis '$name' has duplicate values: $values")
  require(values.nonEmpty, s"combo axis '$name' is empty")

  /** Spark type of this axis, inferred from its (homogeneous) values. */
  def dataType: DataType = Axis.inferType(name, values)
}

object Axis {
  private[graft] def inferType(name: String, values: Seq[Any]): DataType = {
    val t = values.head match {
      case _: Int | _: Long          => LongType
      case _: Float | _: Double      => DoubleType
      case _: String                 => StringType
      case _: Boolean                => BooleanType
      case _: java.sql.Timestamp     => TimestampType
      case _: java.sql.Date          => DateType
      case v => throw new IllegalArgumentException(
        s"axis '$name': unsupported value type ${v.getClass}")
    }
    t
  }

  private[graft] def normalize(v: Any): Any = v match {
    case i: Int   => i.toLong
    case f: Float => f.toDouble
    case x        => x
  }
}

/** Parsed combo spec: ordered axes, full Cartesian product is evaluated.
  * (prepare.py:45-61; expansion combo_runner.py:213-218.)
  */
final case class ComboSpec(axes: Seq[Axis]) {
  require(axes.map(_.name).distinct.size == axes.size,
    s"duplicate axis names in ${axes.map(_.name)}")
  def names: Seq[String] = axes.map(_.name)
  def size: Long = axes.map(_.values.size.toLong).product
}

object ComboSpec {
  /** dict-style constructor: ComboSpec.of("a" -> Seq(1,2), "b" -> Seq(3,4)) */
  def of(kv: (String, Seq[Any])*): ComboSpec =
    new ComboSpec(kv.map { case (n, vs) => Axis(n, vs) })
}

/** Explicit parameter points (sparse subset of the grid) — the `cases`
  * input (prepare.py:76-102). Tuples are zipped with `argNames` order;
  * maps may list args in any order but must cover the same arg set.
  */
final case class CaseSpec(argNames: Seq[String], rows: Seq[Seq[Any]]) {
  require(rows.forall(_.size == argNames.size),
    s"every case must supply all of $argNames")
}

object CaseSpec {
  def fromTuples(argNames: Seq[String], tuples: Seq[Product]): CaseSpec =
    CaseSpec(argNames, tuples.map(_.productIterator.toSeq))
  def fromMaps(argNames: Seq[String], maps: Seq[Map[String, Any]]): CaseSpec =
    CaseSpec(argNames, maps.map(m => argNames.map(m)))
}

/** Constants = fixed kwargs recorded with the output (→ lit columns /
  * metadata); resources = fixed inputs *never* recorded (→ broadcast).
  * (prepare.py:216-217; combo_runner.py:517-535, 551-554.)
  */
final case class Constants(recorded: Map[String, Any] = Map.empty,
                           resources: Map[String, Any] = Map.empty)

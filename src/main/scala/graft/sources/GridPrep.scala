package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared long-form → dense-grid preparation for the save-side bridges
  * ([[ZarrSink]], [[NetCDF3Sink]]): type normalization, coordinate-axis
  * extraction, and index maps. One definition so validation and type
  * semantics cannot drift between the two writers.
  *
  * Column kinds: every column normalizes to one of f8 (DOUBLE), i8
  * (LONG), bool (BOOLEAN, data variables), complex128 (a 2-double
  * struct data variable, fields positional (re, im)), or string
  * (coordinate axes AND — zarr only — fixed-width data variables; the
  * reference's canonical store has a STRING coordinate axis plus
  * bool/complex variables, tests/test_manage.py:15-27). Bool dims
  * fold to i8 (a 2-value axis); bool data variables keep their type
  * so the store round-trips bool-for-bool. Sinks that cannot
  * represent a kind reject it loudly at their own gate (netCDF:
  * complex, string data vars).
  *
  * The normalized frame is persisted for the scope of `body`: writing a
  * dataset runs one Spark job per dim (axis distinct) plus one per data
  * variable, and without the persist each job would re-execute the full
  * upstream plan (for a harvested aggregation that multiplies write
  * cost by dims+vars). Scoped via [[graft.Materialize.withReuse]], so
  * the cache is released when the write finishes.
  */
private[sources] object GridPrep {

  /** Normalized column kind — the bridge's five storable types. */
  sealed trait ColKind extends Serializable
  object ColKind {
    case object F8   extends ColKind
    case object I8   extends ColKind
    case object Bool extends ColKind
    case object Str  extends ColKind
    /** complex128: a 2-double struct data variable (fields read
      * positionally as (re, im) — the engine's complex encoding,
      * [[graft.functions.ComplexFns]]). */
    case object C16  extends ColKind
  }
  import ColKind._

  /** coord value → 0-based axis position, by BINARY SEARCH over the
    * sorted primitive axis. A boxed `Map[Any, Long]` here costs ~50
    * bytes/entry in the task broadcast plus java-serialization of
    * millions of boxed entries — a 2M-row time axis made the whole
    * write broadcast-bound. Primitive arrays broadcast at 8
    * bytes/entry and probe without allocation. Sort order is
    * `Ordering.Double.TotalOrdering`, matching `Double.compare` in
    * `Arrays.binarySearch`, so NaN coordinates resolve too. String
    * axes (small by construction — they are the store's dimensions)
    * probe a sorted String array with the same binary search. */
  final class AxisIndex private (longs: Array[Long], doubles: Array[Double],
                                 strings: Array[String])
      extends Serializable {
    def apply(v: Any): Long = {
      val i = v match {
        case l: java.lang.Long =>
          java.util.Arrays.binarySearch(longs, l.longValue())
        case d: java.lang.Double =>
          java.util.Arrays.binarySearch(doubles, d.doubleValue())
        case s: String =>
          java.util.Arrays.binarySearch(strings.asInstanceOf[Array[AnyRef]],
            s.asInstanceOf[AnyRef])
        case other => throw new IllegalStateException(s"coord $other")
      }
      require(i >= 0, s"coordinate $v not on its axis")
      i.toLong
    }
  }
  object AxisIndex {
    /** `vs` must already be sorted (GridPrep sorts the axes). */
    def of(vs: Array[Any], kind: ColKind): AxisIndex = kind match {
      case F8  => new AxisIndex(null, vs.map(_.asInstanceOf[Double]), null)
      case Str => new AxisIndex(null, null, vs.map(_.asInstanceOf[String]))
      case _   => new AxisIndex(vs.map(_.asInstanceOf[Long]), null, null)
    }
  }

  /** Prepared grid: `nd` is the persisted normalized frame with columns
    * `dims ++ dataVars`, every column one of the five [[ColKind]]s. */
  final case class Grid(nd: DataFrame, dataVars: Seq[String],
                        kinds: Map[String, ColKind],
                        coords: Seq[(String, Array[Any])],
                        idxMaps: Map[String, AxisIndex]) {
    def shape: Seq[Int] = coords.map(_._2.length)
  }

  /** Both sinks interpolate names into JSON metadata and (zarr) use
    * them as store paths; netCDF names share the no-'/' rule. Fail
    * loudly on names the formats cannot represent rather than writing
    * a corrupt store. */
  private def validateName(c: String): Unit = {
    require(c.nonEmpty, "empty column name")
    require(!c.contains("/"),
      s"column name '$c' contains '/' — not representable as a zarr/netCDF name")
    require(!c.exists(ch => ch < ' '),
      s"column name '$c' contains a control character")
  }

  /** Escape for interpolation inside a JSON string literal. */
  def jsonString(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b += '"'
    s.foreach {
      case '"'           => b ++= "\\\""
      case '\\'          => b ++= "\\\\"
      case c if c < ' '  => b ++= f"\\u${c.toInt}%04x"
      case c             => b += c
    }
    b += '"'
    b.toString
  }

  /** Normalize `df` to the five kinds, extract sorted coordinate axes
    * (driver-side, bounded: these ARE the store's dimensions), and run
    * `body` with the normalized frame persisted. Null coordinates are
    * rejected up front — dims must be total for EVERY row, regardless
    * of which data variables that row carries (both sinks then
    * re-assert per-row at assembly time, where the requirement is
    * per-task-local and free). */
  def withGrid[A](df: DataFrame, dims: Seq[String])(body: Grid => A): A = {
    val dataVars = df.columns.filterNot(dims.contains).toSeq
    require(dims.nonEmpty && dims.forall(df.columns.contains),
      s"dims ${dims.mkString(",")} must be columns of ${df.columns.mkString(",")}")
    require(dataVars.nonEmpty, "no data-variable columns besides dims")
    (dims ++ dataVars).foreach(validateName)

    def norm(c: String): org.apache.spark.sql.Column = {
      val isDim = dims.contains(c)
      df.schema(c).dataType match {
        case LongType | DoubleType              => col(c)
        case ByteType | ShortType | IntegerType => col(c).cast(LongType).as(c)
        case FloatType                          => col(c).cast(DoubleType).as(c)
        case BooleanType =>
          if (isDim) col(c).cast(LongType).as(c) else col(c)
        case StringType                         => col(c)
        case st: StructType if !isDim && st.fields.length == 2 &&
            st.fields.forall(f => f.dataType == DoubleType ||
              f.dataType == FloatType) =>
          // complex128 data variable: normalize both components to f8.
          // A NULL cell must STAY null (struct(getField, getField) of a
          // null struct would otherwise yield a non-null struct of
          // nulls, turning a missing cell into a broken one).
          when(col(c).isNull, lit(null))
            .otherwise(struct(
              col(c).getField(st.fields(0).name).cast(DoubleType).as("re"),
              col(c).getField(st.fields(1).name).cast(DoubleType).as("im")))
            .as(c)
        case t => throw new IllegalArgumentException(
          s"column '$c': unsupported type $t " +
            "(numeric/boolean/complex-struct/string only)")
      }
    }

    graft.Materialize.withReuse(df.select((dims ++ dataVars).map(norm): _*)) { nd =>
      val kinds: Map[String, ColKind] =
        (dims ++ dataVars).map { c =>
          c -> (nd.schema(c).dataType match {
            case DoubleType     => F8
            case BooleanType    => Bool
            case StringType     => Str
            case _: StructType  => C16
            case _              => I8
          })
        }.toMap
      val coords: Seq[(String, Array[Any])] = dims.map { d =>
        val vs = nd.select(d).distinct().collect().map(_.get(0))
        require(!vs.contains(null),
          s"null coordinate in dim '$d' (dims must be total)")
        require(vs.nonEmpty, s"dim '$d' has no values")
        d -> (kinds(d) match {
          case F8  => vs.map(_.asInstanceOf[Double]).sorted.toArray[Any]
          case Str => vs.map(_.asInstanceOf[String]).sorted.toArray[Any]
          case _   => vs.map(_.asInstanceOf[Long]).sorted.toArray[Any]
        })
      }
      val idxMaps: Map[String, AxisIndex] =
        coords.map { case (d, vs) =>
          d -> AxisIndex.of(vs, kinds(d))
        }.toMap
      body(Grid(nd, dataVars, kinds, coords, idxMaps))
    }
  }
}

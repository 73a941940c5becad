package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  // left: queries at times; right: quotes with values — classic shape
  private lazy val quotes = Seq(
    ("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u1", 30L, 3.0),
    ("u2", 15L, 9.0)).toDF("k", "rts", "qv")
  private lazy val trades = Seq(
    ("u1", 5L), ("u1", 10L), ("u1", 25L), ("u1", 99L),
    ("u2", 14L), ("u3", 50L)).toDF("k", "lts")

  test("backward: greatest right ts <= left ts, ties match, outer NULLs") {
    val got = AsofJoin.backward(trades, quotes, Seq("k"), "lts", "rts",
      Seq("qv" -> "last_qv", "rts" -> "matched_ts"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got == Set(
      ("u1", 5L, None, None),              // before any quote
      ("u1", 10L, Some(1.0), Some(10L)),   // exact-ts tie matches
      ("u1", 25L, Some(2.0), Some(20L)),
      ("u1", 99L, Some(3.0), Some(30L)),
      ("u2", 14L, None, None),             // u2's quote is later
      ("u3", 50L, None, None)))            // key with no right rows
  }

  test("forward: smallest right ts >= left ts") {
    val got = AsofJoin.forward(trades, quotes, Seq("k"), "lts", "rts",
      Seq("qv" -> "next_qv"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(2)))).toSet
    assert(got == Set(
      ("u1", 5L, Some(1.0)), ("u1", 10L, Some(1.0)),
      ("u1", 25L, Some(3.0)), ("u1", 99L, None),
      ("u2", 14L, Some(9.0)), ("u3", 50L, None)))
  }

  test("NULL payload on the matched row stays NULL; multi-payload " +
    "columns resolve to the SAME right row") {
    // newest matching quote has a NULL value — true ASOF picks that
    // row and returns NULL, never falls back to the older 1.0
    val q = Seq(("u1", 10L, Option(1.0), Option("a")),
      ("u1", 20L, None: Option[Double], Option("b")),
      ("u1", 30L, Option(3.0), None: Option[String]))
      .toDF("k", "rts", "qv", "tag")
    val t = Seq(("u1", 25L), ("u1", 35L)).toDF("k", "lts")
    val got = AsofJoin.backward(t, q, Seq("k"), "lts", "rts",
      Seq("qv" -> "v", "tag" -> "g", "rts" -> "mts"))
      .collect().map(r => (r.getLong(1), Option(r.get(2)),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(got == Set(
      (25L, None, Some("b"), Some(20L)),   // matched row's qv IS null
      (35L, Some(3.0), None, Some(30L)))) // ...and its tag IS null
  }

  test("tiebreak pins the row among duplicate (key, ts) right rows") {
    val q = Seq(("u1", 10L, 5.0), ("u1", 10L, 2.0), ("u1", 10L, 9.0))
      .toDF("k", "rts", "qv")
    val t = Seq(("u1", 15L)).toDF("k", "lts")
    val got = AsofJoin.backward(t, q, Seq("k"), "lts", "rts",
      Seq("qv" -> "v"), tiebreak = Seq("v")).collect()
    assert(got.map(_.getDouble(2)).toSeq == Seq(9.0)) // max under asc order
    val fwd = AsofJoin.forward(t.withColumn("lts", lit(5L)), q,
      Seq("k"), "lts", "rts", Seq("qv" -> "v"), tiebreak = Seq("v"))
      .collect()
    assert(fwd.map(_.getDouble(2)).toSeq == Seq(9.0))
  }

  test("randomized parity with a brute-force as-of; one exchange total") {
    val rnd = new scala.util.Random(23)
    val l = (0 until 400).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
    val r = (0 until 300).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextDouble()))
    // dedupe (k, ts) right rows first: at equal (key, ts) the window
    // takes whichever sorted last, so the brute-force needs a
    // deterministic resolution to compare against
    val rClean = r.groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    // brute force: for each left row the max-ts right row with ts <= lts
    val wantClean = l.map { case (k, lts) =>
      val m = rClean.filter(t => t._1 == k && t._2 <= lts)
      (k, lts, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
    }.groupBy(identity).view.mapValues(_.size).toMap
    val res = AsofJoin.backward(
      l.toDF("k", "lts"), rClean.toDF("k", "rts", "rv"),
      Seq("k"), "lts", "rts", Seq("rv" -> "v"))
    val got = res.collect().map(row => (row.getString(0), row.getLong(1),
      Option(row.get(2)).map(_.asInstanceOf[Double])))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == wantClean)
    // plan shape: one exchange moves the union; nothing else shuffles
    // (AQE toString repeats the plan as Final + Initial — cut at the
    // Initial section before counting)
    val plan = res.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}

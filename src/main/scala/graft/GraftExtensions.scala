package graft

import org.apache.spark.sql.{GraftSqlShims, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.{CharWindowHashes, GramRunStats, RhpSig, ShingleHash, VecCosine, VecDot, VecL2Norm}

/** SQL surface for graft's native codegen kernels, two ways in:
  *
  *  - at session build: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`), the standard
  *    `SparkSessionExtensions` route for clusters;
  *  - on a live session: `GraftFunctions.register(spark)` — notebooks
  *    and tests, where the builder has already run.
  *
  * Registered functions (same codegen'd expressions the Column API
  * uses — `SELECT vec_cosine(a.emb, b.emb)` plans identically to
  * `VectorExprs.cosine`):
  *
  *  - `vec_dot(a, b)`, `vec_cosine(a, b)` — fused array-double kernels
  *  - `vec_l2_normalize(v)` — unit-norm copy
  *  - `rhp_sig(v, dim, nbits[, seed])` — random-hyperplane LSH
  *    signature (dim/nbits/seed must be literals: the planes are
  *    baked into the expression at plan time)
  *  - `shingle_hash(tokens, n)` — 64-bit hashes of every n-token
  *    window (n literal)
  *  - `gram_run_stats(grams)` — struct(dup_chars, top_chars, max_tf)
  *    of a gram array, in-row (the map-only repetition-stats kernel)
  *  - `char_window_hashes(text, w)` — rolling hashes of every w-char
  *    window, one O(len) pass (w literal; substring-dedup census)
  *  - `winnowed_window_hashes(text, w, stride)` — the winnowing-
  *    selected census sample (Schleimer 2003; d9s's scale path)
  *  - `minhash_sig(hashes, k)` — k-minima MinHash signature with the
  *    same fixed-seed Carter-Wegman permutations as the Column API
  *  - `simhash64(tokens[, bits])` — FNV-1a SimHash (d4's kernel)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case Literal(v: Long, LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def litLong(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  private def arity(name: String, args: Seq[Expression], n: Int*): Unit =
    require(n.contains(args.length),
      s"$name expects ${n.mkString(" or ")} arguments, got ${args.length}")

  /** (name, info, builder) triples — single source for both routes. */
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      args => { arity("vec_dot", args, 2); VecDot(args(0), args(1)) }),
    ("vec_cosine",
      info("vec_cosine", "vec_cosine(a, b) - cosine similarity, one fused pass"),
      args => { arity("vec_cosine", args, 2); VecCosine(args(0), args(1)) }),
    ("vec_l2_normalize",
      info("vec_l2_normalize", "vec_l2_normalize(v) - unit-L2-norm copy"),
      args => { arity("vec_l2_normalize", args, 1); VecL2Norm(args(0)) }),
    ("rhp_sig",
      info("rhp_sig",
        "rhp_sig(v, dim, nbits[, seed]) - random-hyperplane LSH signature"),
      args => {
        arity("rhp_sig", args, 3, 4)
        val dim = litInt(args(1), "rhp_sig", "dim")
        val nbits = litInt(args(2), "rhp_sig", "nbits")
        require(nbits >= 1 && nbits <= 64, s"nbits must be in [1,64], got $nbits")
        val seed = if (args.length == 4) litLong(args(3), "rhp_sig", "seed") else 42L
        val rnd = new scala.util.Random(seed)
        val planes = Array.fill(nbits * dim)(rnd.nextGaussian())
        RhpSig(args(0), planes, nbits, dim)
      }),
    ("shingle_hash",
      info("shingle_hash",
        "shingle_hash(tokens, n) - 64-bit hash of every n-token window"),
      args => {
        arity("shingle_hash", args, 2)
        ShingleHash(args(0), litInt(args(1), "shingle_hash", "n"))
      }),
    ("gram_run_stats",
      info("gram_run_stats",
        "gram_run_stats(grams) - struct(dup_chars, top_chars, max_tf) in-row"),
      args => { arity("gram_run_stats", args, 1); GramRunStats(args(0)) }),
    ("char_window_hashes",
      info("char_window_hashes",
        "char_window_hashes(text, w) - rolling hash of every w-char window"),
      args => {
        arity("char_window_hashes", args, 2)
        CharWindowHashes(args(0), litInt(args(1), "char_window_hashes", "w"))
      }),
    ("winnowed_window_hashes",
      info("winnowed_window_hashes",
        "winnowed_window_hashes(text, w, stride) - winnowing-selected " +
          "(pos, hash) structs of w-char windows (Schleimer 2003)"),
      args => {
        arity("winnowed_window_hashes", args, 3)
        graft.functions.WinnowedWindowHashes(args(0),
          litInt(args(1), "winnowed_window_hashes", "w"),
          litInt(args(2), "winnowed_window_hashes", "stride"))
      }),
    ("minhash_sig",
      info("minhash_sig",
        "minhash_sig(hashes, k) - k-minima MinHash signature over " +
          "pre-hashed shingles (same fixed-seed permutations as the " +
          "Column API, so signatures are interchangeable)"),
      args => {
        arity("minhash_sig", args, 2)
        val k = litInt(args(1), "minhash_sig", "k")
        require(k >= 1 && k <= 4096, s"k must be in [1,4096], got $k")
        val (as, bs) = graft.dedup.Dedup.permConstants(k)
        graft.functions.MinHashSig(args(0), as, bs)
      }),
    ("simhash64",
      info("simhash64",
        "simhash64(tokens[, bits]) - FNV-1a SimHash over a token " +
          "array; bits <= 64 (60 keeps the unsigned value inside a " +
          "signed BIGINT cross-engine)"),
      args => {
        arity("simhash64", args, 1, 2)
        val bits = if (args.length == 2) litInt(args(1), "simhash64", "bits")
                   else 64
        require(bits >= 8 && bits <= 64, s"bits must be in [8,64], got $bits")
        graft.functions.SimHash64(args(0), bits)
      }))

  /** Register every graft SQL function on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, i, b) =>
      GraftSqlShims.registerFunction(spark, name, i, b)
    }
}

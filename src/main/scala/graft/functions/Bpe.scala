package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Byte-pair-encoding merge application (Sennrich et al. 2016; the
  * GPT-2 tokenizer's apply step) — REAL merges-table tokenization, so
  * packing budgets (t17/p2) and corpus cards (cp1) can count actual
  * BPE tokens instead of the `tokenCountBpeIsh` regex proxy.
  *
  * Algorithm (the standard apply loop): start from the word's
  * codepoints as symbols; repeatedly find the LOWEST-RANK merge rule
  * whose pair is adjacent somewhere in the word and merge ALL its
  * occurrences left-to-right non-overlapping; stop when no rule
  * applies. Deterministic — and exactly replayable in SQL (the t21
  * oracle walks the same loop with a recursive CTE over the DISTINCT
  * vocabulary, one `replace` per step on a delimiter-framed symbol
  * string).
  *
  * Shape for scale: tokenization runs once per DISTINCT word (the
  * tf/df discipline — the vocabulary is a sliver of the corpus), as a
  * native expression whose generated code calls the static kernel
  * (the gram_run_stats pattern: the loop lives in one JIT-compiled
  * method, the expression stays inside whole-stage codegen, merges
  * ride the references array — broadcast once per executor, no
  * per-row map rebuild). Counts then join back to the (id, term, tf)
  * table; text never shuffles.
  */
object Bpe {

  /** The merges fixture: 40 hand-authored English-bigram rules in
    * priority order, every later rule's parts formable by earlier
    * rules. A PUBLIC, self-contained stand-in for a shipped
    * `merges.txt` (the real GPT-2 table is 50k rows of exactly this
    * shape; the apply semantics are identical).
    */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n", "o" -> "r",
    "s" -> "t", "e" -> "s", "t" -> "o", "i" -> "t", "i" -> "s",
    "a" -> "l", "a" -> "r", "e" -> "d", "n" -> "d", "an" -> "d",
    "o" -> "u", "l" -> "e", "s" -> "e", "h" -> "a", "a" -> "s",
    "c" -> "e", "l" -> "y", "in" -> "g", "t" -> "er", "th" -> "at",
    "o" -> "f", "c" -> "o", "d" -> "e", "r" -> "i", "r" -> "o",
    "m" -> "e", "w" -> "h", "wh" -> "e", "whe" -> "n", "u" -> "s")

  /** SQL VALUES literal of [[merges]] for oracle construction. */
  def mergesSqlValues: String = merges.zipWithIndex
    .map { case ((a, b), i) => s"($i,'$a','$b')" }.mkString(", ")

  /** BPE segmentation of a single word column → array<string>. */
  def tokenize(word: Column,
               rules: Seq[(String, String)] = merges): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      BpeTokenize(org.apache.spark.sql.GraftSqlShims.expression(word), rules))

  /** Per-document BPE token counts over a corpus: tokenize the
    * DISTINCT vocabulary once, join counts back through the tf table.
    * Returns `(idCol, n_ws_tokens, n_bpe_tokens)`.
    */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String,
                 rules: Seq[(String, String)] = merges): DataFrame = {
    val tf = graft.Materialize.reuse(
      docs.select(col(idCol), explode(TextFns.tokens(col(textCol))).as("__t"))
        .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c")))
    val vocab = tf.select("__t").distinct()
      .withColumn("__ns", size(tokenize(col("__t"), rules)).cast("long"))
    tf.join(vocab, Seq("__t"))
      .groupBy(col(idCol))
      .agg(sum("__c").as("n_ws_tokens"),
        sum(col("__c") * col("__ns")).as("n_bpe_tokens"))
  }
}

/** The merge-loop kernel — static so generated code can call it. */
object BpeKernel {
  // separator for pair keys: U+0001 cannot occur inside a symbol
  // (symbols are concatenations of word codepoints; whitespace-split
  // tokens of the ASCII-verified fixture never contain it, and a real
  // merges.txt vocabulary wouldn't either)
  private val Sep = '\u0001'

  /** rank lookup keyed `a + Sep + b`; built once per expression
    * instance and shipped via the codegen references array. */
  def rankMap(rules: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](rules.size * 2)
    rules.zipWithIndex.foreach { case ((a, b), i) =>
      // first occurrence wins, like a real merges.txt (no dup ranks)
      m.putIfAbsent(a + Sep + b, Integer.valueOf(i))
    }
    m
  }

  /** Apply the merge loop to one word; returns the final symbols. */
  def segment(word: org.apache.spark.unsafe.types.UTF8String,
              ranks: java.util.HashMap[String, Integer]): Array[String] = {
    val s = word.toString
    var syms = new java.util.ArrayList[String](s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(s.substring(i, i + n))
      i += n
    }
    var done = syms.size <= 1
    while (!done) {
      // lowest-rank applicable pair
      var best = Integer.MAX_VALUE
      var bi = -1
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + Sep + syms.get(j + 1))
        if (r != null && r.intValue() < best) { best = r.intValue(); bi = j }
        j += 1
      }
      if (bi < 0) done = true
      else {
        // merge ALL occurrences of the chosen pair, left to right,
        // non-overlapping ("a a a" under (a,a) -> "aa a")
        val a = syms.get(bi)
        val b = syms.get(bi + 1)
        val out = new java.util.ArrayList[String](syms.size)
        var p = 0
        while (p < syms.size) {
          if (p < syms.size - 1 && syms.get(p) == a && syms.get(p + 1) == b) {
            out.add(a + b); p += 2
          } else { out.add(syms.get(p)); p += 1 }
        }
        syms = out
        done = syms.size <= 1
      }
    }
    val arr = new Array[String](syms.size)
    syms.toArray(arr)
    arr
  }

  /** [[segment]] packaged for Catalyst: UTF8String array data. */
  def segmentData(word: org.apache.spark.unsafe.types.UTF8String,
                  ranks: java.util.HashMap[String, Integer]): GenericArrayData =
    new GenericArrayData(segment(word, ranks)
      .map(org.apache.spark.unsafe.types.UTF8String.fromString(_))
      .asInstanceOf[Array[Any]])
}

/** `bpe_tokenize(word)` → array<string> of final BPE symbols. */
case class BpeTokenize(child: Expression, rules: Seq[(String, String)])
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokenize"

  @transient private lazy val ranks = BpeKernel.rankMap(rules)

  override protected def nullSafeEval(v: Any): Any =
    BpeKernel.segmentData(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    val cls = BpeKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cls.segmentData($v, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
}

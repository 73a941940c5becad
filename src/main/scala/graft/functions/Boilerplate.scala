package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML boilerplate extraction (t26) — the deterministic rule core of
  * the trafilatura/jusText stage every real crawl pipeline runs
  * BEFORE any quality/dedup operator (Kohlschütter et al. 2010's
  * densitometric insight; jusText's link-density gate), reduced to
  * exactly the rules that are integer-decidable and therefore
  * oracle-replayable:
  *
  *  1. `<script>…</script>` and `<style>…</style>` blocks are removed
  *     WHOLESALE (they may span lines), script first then style —
  *     a fixed order both engines replay.
  *  2. The document splits into lines on `\n`; per line, all
  *     remaining `<…>` tags are stripped, the five commonest HTML
  *     entities decode (`&lt; &gt; &quot; &#39; &nbsp;` then `&amp;`
  *     LAST, so `&amp;lt;` correctly yields the literal `&lt;`), and
  *     the result space-trims (' ' only — matching SQL `trim`, not
  *     Java's control-char trim).
  *  3. A line is KEPT iff its body length ≥ 20 chars AND
  *     `2·link_chars < body_chars` — link_chars being the tag-free
  *     length of the line's `<a>…</a>` inner text. Both thresholds
  *     are EXACT INTEGER comparisons: no float density ever exists.
  *
  * The kept bodies re-join with `\n` as the cleaned article text.
  * Navigation bars ("Home | About | Contact"), footers, and
  * link-farms die on rule 3; chrome fragments and separators on the
  * length gate; code/style payloads on rule 1.
  *
  * Shape for scale: ONE codegen'd pass per document (a native kernel
  * expression, the BpeTokenize pattern — compiled regexes ride the
  * JVM, not the row), map-only, text never shuffles. A DuckDB oracle
  * replays every rule with RE2 regexes + the same replace chain
  * (patterns deliberately avoid backreferences/lookaround, the
  * Java∩RE2 subset).
  */
object BoilerplateKernel {

  val MinLen = 20

  val schema: StructType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))

  private val Script =
    java.util.regex.Pattern.compile("(?is)<script[^>]*>.*?</script>")
  private val Style =
    java.util.regex.Pattern.compile("(?is)<style[^>]*>.*?</style>")
  private val Anchor =
    java.util.regex.Pattern.compile("(?is)<a[^>]*>(.*?)</a>")
  private val Tag = java.util.regex.Pattern.compile("<[^>]*>")

  /** Entity decode, `&amp;` last (see object doc). */
  private def decode(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  /** Space-only trim — SQL `trim` semantics (Java's `trim` also eats
    * control chars, which DuckDB's doesn't). */
  private def spaceTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && s.charAt(i) == ' ') i += 1
    while (j > i && s.charAt(j - 1) == ' ') j -= 1
    s.substring(i, j)
  }

  /** The rule pipeline; returns (cleanText, nKept, nDropped).
    * Line endings normalize first (`\r\n`/`\r` → `\n`) so CRLF crawl
    * pages split into the same lines both engines see. */
  def clean(text0: String): (String, Int, Int) = {
    val text = text0.replace("\r\n", "\n").replace('\r', '\n')
    val noBlocks = Style.matcher(
      Script.matcher(text).replaceAll("")).replaceAll("")
    val lines = noBlocks.split("\n", -1)
    val kept = new scala.collection.mutable.ArrayBuffer[String](lines.length)
    var dropped = 0
    var li = 0
    while (li < lines.length) {
      val line = lines(li)
      var link = 0
      val m = Anchor.matcher(line)
      // CODEPOINT counts on both gates — the oracle's SQL length()
      // counts codepoints, and astral chars (emoji) are 2 UTF-16
      // units; code-unit counts would silently diverge the engines
      while (m.find()) {
        // ENTITY-DECODED anchor text, mirroring the body side: without
        // the decode, entity-heavy anchors (&amp; = 5 chars vs 1)
        // over-weight the link side of the 2·link < body gate and the
        // rule drifts from its tag-free-length intent (advisor r13)
        val a = decode(Tag.matcher(m.group(1)).replaceAll(""))
        link += a.codePointCount(0, a.length)
      }
      val body = spaceTrim(decode(Tag.matcher(line).replaceAll("")))
      val bodyCp = body.codePointCount(0, body.length)
      if (bodyCp >= MinLen && 2 * link < bodyCp) kept += body
      else dropped += 1
      li += 1
    }
    (kept.mkString("\n"), kept.size, dropped)
  }

  /** [[clean]] packaged for Catalyst. */
  def cleanRow(text: UTF8String): InternalRow = {
    val (c, k, d) = clean(text.toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(c), k, d))
  }
}

/** `boilerplate_clean(text)` → struct(clean, n_kept, n_dropped). */
case class BoilerplateClean(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BoilerplateKernel.schema
  override def prettyName: String = "boilerplate_clean"

  override protected def nullSafeEval(v: Any): Any =
    BoilerplateKernel.cleanRow(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = BoilerplateKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $cls.cleanRow($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BoilerplateClean =
    copy(child = newChild)
}

object Boilerplate {
  /** Column form of [[BoilerplateClean]]. */
  def clean(text: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      BoilerplateClean(org.apache.spark.sql.GraftSqlShims.expression(text)))
}

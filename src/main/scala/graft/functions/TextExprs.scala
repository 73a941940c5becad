package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShims}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native text expressions for the dedup hot path. */
object TextExprs {

  /** 64-bit hashes of every `n`-token window of a token array — the
    * hashed-shingle kernel. The Column formulation (`n−1` × `zip_with`
    * string concats, then `xxhash64`) is CodegenFallback and
    * materializes every shingle STRING; this computes a per-token
    * FNV-1a hash once and folds each window's `n` token hashes in a
    * single codegen'd pass — no string is ever built. Downstream
    * consumers (Jaccard, MinHash) only need equality structure, so any
    * collision-resistant hash of the token sequence is equivalent to
    * hashing the concatenated shingle text.
    */
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftSqlShims.column(ShingleHash(GraftSqlShims.expression(tokens), n))

  /** Per-document term-frequency summary of a gram array, computed
    * in-row: `struct<dup_chars, top_chars, max_tf>` where `dup_chars`
    * is Σ tf·len(g) over grams with tf>1, and `top_chars`/`max_tf`
    * describe the most frequent gram (ties → lexicographically
    * smallest, byte order — the ORDER BY tf DESC, g ASC argmax).
    * Per-doc frequency is a ROW-LOCAL property: the explode → groupBy
    * form shuffles O(corpus grams) counters for it, and the
    * HigherOrderFunction form (`filter`/`zip_with` over a sorted copy)
    * re-evaluates the non-lambda-bound sort per element, O(n²·log n).
    * This kernel is one sort + one run scan per row, inside
    * whole-stage codegen.
    */
  def gramRunStats(grams: Column): Column =
    GraftSqlShims.column(GramRunStats(GraftSqlShims.expression(grams)))

  /** 64-bit rolling hashes of every `w`-char window (stride 1) of a
    * string — the character-level analogue of [[shingleHashes]] for
    * substring-level dedup. One O(len) Rabin-Karp pass per document
    * (base = FNV prime, mod 2⁶⁴) replaces per-window
    * `xxhash64(substr(text, pos, w))`, which re-reads every character
    * `w` times and allocates a window string per position. Downstream
    * consumers need only equality structure (hash collisions are the
    * documented d2/d3 shingle discipline).
    */
  def charWindowHashes(text: Column, w: Int): Column =
    GraftSqlShims.column(CharWindowHashes(GraftSqlShims.expression(text), w))

  /** Winnowing-SELECTED window hashes (Schleimer et al. 2003, the
    * fingerprint-selection algorithm this repo already uses for doc
    * fingerprints): array<struct<pos:int, h:long>> of the positions
    * whose hash is the rightmost minimum of its `stride`-length
    * neighborhood. Selection is CONTENT-defined — the same duplicated
    * substring selects the same interior windows in every copy
    * regardless of its offset in each document — which is what makes
    * a sampled duplicate-window census sound: a positional every-s-th
    * stride only matches copies whose offsets happen to agree mod s.
    * Guarantee: any duplicate of length ≥ w + stride − 1 shares at
    * least one selected window between copies; expected census
    * density is 2/(stride+1) of all windows. stride=1 selects every
    * window (exact). */
  def winnowedWindowHashes(text: Column, w: Int, stride: Int): Column =
    GraftSqlShims.column(
      WinnowedWindowHashes(GraftSqlShims.expression(text), w, stride))
}

/** out[i] = hash(tokens[i..i+n-1]), length max(numTokens-n+1, 0). */
case class ShingleHash(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val th = new Array[Long](nt)
    var i = 0
    while (i < nt) { th(i) = ShingleHash.fnvUtf8(toks.getUTF8String(i)); i += 1 }
    val nw = math.max(nt - n + 1, 0)
    val out = new Array[Long](nw)
    i = 0
    while (i < nw) { out(i) = ShingleHash.fnvFold(th, i, n); i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i"); val nt = ctx.freshName("nt")
      val th = ctx.freshName("th"); val nw = ctx.freshName("nw")
      val out = ctx.freshName("out")
      val cls = ShingleHash.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |int $nt = $v.numElements();
         |long[] $th = new long[$nt];
         |for (int $i = 0; $i < $nt; $i++) {
         |  $th[$i] = $cls.fnvUtf8($v.getUTF8String($i));
         |}
         |int $nw = java.lang.Math.max($nt - ${n} + 1, 0);
         |long[] $out = new long[$nw];
         |for (int $i = 0; $i < $nw; $i++) {
         |  $out[$i] = $cls.fnvFold($th, $i, ${n});
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** out[i] = rolling hash of chars [i, i+w), length max(numChars-w+1, 0). */
case class CharWindowHashes(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 2, s"window must be >= 2 chars, got $w")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_hashes"

  override protected def nullSafeEval(v: Any): Any =
    CharWindowHashes.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = CharWindowHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($v, $w);"
    })

  override protected def withNewChildInternal(newChild: Expression): CharWindowHashes =
    copy(child = newChild)
}

object CharWindowHashes {
  private val B = 0x100000001b3L // FNV prime as polynomial base, mod 2^64

  /** murmur3 fmix64: the Rabin-Karp polynomial rolling hash has
    * STRUCTURED collisions (it is linear in the window contents);
    * avalanching each emitted value breaks that structure so
    * same-hash ⇒ same-content holds at the generic ~2⁻⁶⁴ rate
    * (round-7 advisor note). The rolling state itself stays
    * un-finalized so the O(1) per-position update is preserved. */
  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  def compute(s: org.apache.spark.unsafe.types.UTF8String,
              w: Int): GenericArrayData = {
    // CODEPOINT positions (not UTF-16 units), matching Spark's own
    // length()/substring() semantics and the content-based oracle's
    // substr for supplementary-plane text (round-7 advisor note);
    // for BMP-only text this is identical to the former charAt walk.
    // Manual decode into a preallocated array — the IntStream
    // (codePoints().toArray) route measured +40% on the d9 bench
    val str = s.toString
    val n16 = str.length
    val cps = new Array[Int](n16)
    var n = 0
    var k = 0
    while (k < n16) {
      val cp = str.codePointAt(k)
      cps(n) = cp; n += 1
      k += Character.charCount(cp)
    }
    val nw = math.max(n - w + 1, 0)
    val out = new Array[Long](nw)
    if (nw > 0) {
      var bw = 1L
      var j = 1
      while (j < w) { bw *= B; j += 1 } // B^(w-1)
      var h = 0L
      j = 0
      while (j < w) { h = h * B + cps(j); j += 1 }
      out(0) = fmix64(h)
      var i = 1
      while (i < nw) {
        h = (h - cps(i - 1) * bw) * B + cps(i + w - 1)
        out(i) = fmix64(h)
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}

/** Winnowing selection over [[CharWindowHashes]]'s rolling hashes —
  * see [[TextExprs.winnowedWindowHashes]]. One O(len) pass: the
  * rolling-hash walk plus a monotonic-deque neighborhood minimum
  * (amortized O(1) per window), so the strided census costs the same
  * map-side work as the exact one and shrinks the EXCHANGE.
  */
case class WinnowedWindowHashes(child: Expression, w: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(w >= 2, s"window must be >= 2 chars, got $w")
  require(stride >= 1, s"stride must be >= 1, got $stride")
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("h", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "winnowed_window_hashes"

  override protected def nullSafeEval(v: Any): Any =
    WinnowedWindowHashes.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = WinnowedWindowHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($v, $w, $stride);"
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowedWindowHashes =
    copy(child = newChild)
}

object WinnowedWindowHashes {
  def compute(s: org.apache.spark.unsafe.types.UTF8String,
              w: Int, stride: Int): GenericArrayData = {
    val hashes = CharWindowHashes.compute(s, w).toLongArray()
    val nw = hashes.length
    if (nw == 0) return new GenericArrayData(Array.empty[Any])
    val sel = new Array[Int](nw)
    var nSel = 0
    if (nw < stride) {
      // document shorter than one neighborhood: keep its rightmost
      // minimum so short texts still participate in the census
      var m = 0
      var j = 1
      while (j < nw) {
        if (java.lang.Long.compareUnsigned(hashes(j), hashes(m)) <= 0) m = j
        j += 1
      }
      sel(0) = m; nSel = 1
    } else {
      // monotonic deque of candidate indices; head = neighborhood min.
      // Popping on >= makes the head the RIGHTMOST minimal hash, the
      // robust-winnowing tie rule (both copies of a duplicate pick the
      // same window because the rule sees identical hash sequences)
      val q = new Array[Int](nw)
      var qh = 0; var qt = 0
      var last = -1
      var j = 0
      while (j < nw) {
        while (qt > qh &&
          java.lang.Long.compareUnsigned(hashes(q(qt - 1)), hashes(j)) >= 0)
          qt -= 1
        q(qt) = j; qt += 1
        if (q(qh) <= j - stride) qh += 1
        if (j >= stride - 1) {
          val m = q(qh)
          if (m != last) { sel(nSel) = m; nSel += 1; last = m }
        }
        j += 1
      }
    }
    val out = new Array[Any](nSel)
    var i = 0
    while (i < nSel) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](sel(i), hashes(sel(i))))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** struct(dup_chars, top_chars, max_tf) over a string array — see
  * [[TextExprs.gramRunStats]]. `len` counts CHARACTERS (codepoints),
  * matching Spark's `length()` and the SQL oracles.
  */
case class GramRunStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dup_chars", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("top_chars", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("max_tf", LongType, nullable = false)))
  override def prettyName: String = "gram_run_stats"

  override protected def nullSafeEval(v: Any): Any =
    GramRunStats.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cls = GramRunStats.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): GramRunStats =
    copy(child = newChild)
}

object GramRunStats {
  def compute(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n0 = arr.numElements()
    val a = new Array[org.apache.spark.unsafe.types.UTF8String](n0)
    // skip null elements (the SQL surface allows gram_run_stats(
    // array('a', NULL)); sorting nulls would NPE — advisor note):
    // a null gram contributes no characters and no term frequency
    var n = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { a(n) = arr.getUTF8String(i); n += 1 }
      i += 1
    }
    java.util.Arrays.sort(a.asInstanceOf[Array[Object]], 0, n) // UTF8String: binary (byte) order
    var dup = 0L; var maxTf = 0L; var topChars = 0L
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n && a(j).equals(a(i))) j += 1
      val tf = (j - i).toLong
      val len = a(i).numChars().toLong
      if (tf > 1) dup += tf * len
      if (tf > maxTf) { maxTf = tf; topChars = tf * len } // strict > on the
      i = j // ascending scan keeps the lexicographically first gram on ties
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](dup, topChars, maxTf))
  }
}

object ShingleHash {
  /** FNV-1a 64-bit over a token's UTF-8 bytes. */
  def fnvUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val nb = s.numBytes()
    var i = 0
    while (i < nb) { h ^= s.getByte(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** FNV-1a 64-bit over `n` consecutive 8-byte token hashes — window
    * equality iff the token sequences are equal (modulo collision). */
  def fnvFold(th: Array[Long], off: Int, n: Int): Long = {
    var h = 0xcbf29ce484222325L
    var j = 0
    while (j < n) {
      var v = th(off + j)
      var b = 0
      while (b < 8) { h ^= v & 0xffL; h *= 0x100000001b3L; v >>>= 8; b += 1 }
      j += 1
    }
    h
  }
}

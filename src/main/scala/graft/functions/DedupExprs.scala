package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo => _, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native per-document dedup kernels (the former Scala-UDF hot spots):
  * one primitive loop per doc inside whole-stage codegen, no
  * Seq[Long]/Seq[String] boxing at the deserializer boundary.
  */

/** MinHash signature over PRE-HASHED shingles: `sig[i] = min over
  * shingles of (a_i·(h & 0xFFFFFFFF) + b_i) mod p`, p = 2³¹−1.
  * Constants are baked in (derived deterministically from k by the
  * caller); arithmetic is identical to the former UDF bit-for-bit.
  */
case class MinHashSig(child: Expression, as: Array[Long], bs: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(as.length == bs.length && as.nonEmpty)
  private def k: Int = as.length
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = arr.getLong(j) & 0xFFFFFFFFL
      var i = 0
      while (i < k) {
        val p = java.lang.Math.floorMod(h * as(i) + bs(i), 2147483647L)
        if (p < sig(i)) sig(i) = p
        i += 1
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val p = ctx.freshName("p"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $v.getLong($j) & 0xFFFFFFFFL;
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $p = java.lang.Math.floorMod($h * $asRef[$i] + $bsRef[$i], 2147483647L);
         |    if ($p < $sig[$i]) $sig[$i] = $p;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** SimHash over a token array: bit b of the signature is the sign of
  * Σ_tokens (±1 by bit b of the token's FNV-1a 64-bit hash). One pass
  * over the tokens with `bits` vote counters — identical arithmetic
  * to the former UDF. `bits` defaults to the full 64; the 60-bit form
  * keeps the unsigned signature inside a signed BIGINT on BOTH
  * engines, which is what lets the d4 oracle reproduce the signature
  * (DuckDB computes the same FNV-1a64 with HUGEINT mod-2⁶⁴ arithmetic
  * — one multiply+xor per byte, no md5 anywhere).
  */
case class SimHash64(child: Expression, bits: Int = 64)
    extends UnaryExpression with ExpectsInputTypes {
  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](bits)
    var t = 0
    while (t < n) {
      val bytes = arr.getUTF8String(t).getBytes
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
      var b = 0
      while (b < bits) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val t = ctx.freshName("t"); val n = ctx.freshName("n")
      val votes = ctx.freshName("votes"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val bytes = ctx.freshName("bytes"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |int[] $votes = new int[$bits];
         |for (int $t = 0; $t < $n; $t++) {
         |  byte[] $bytes = $v.getUTF8String($t).getBytes();
         |  long $h = 0xcbf29ce484222325L;
         |  for (int $i = 0; $i < $bytes.length; $i++) {
         |    $h ^= ($bytes[$i] & 0xffL); $h *= 0x100000001b3L;
         |  }
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < $bits; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Nearest-centroid assignment for the IVF index: argmin over
  * `nCentroids` of squared L2 distance. `centroids` is row-major
  * [centroid][dim], length nCentroids*dim — one primitive loop per
  * vector inside whole-stage codegen (was a Seq[Double]-boxing UDF).
  */
case class NearestCentroid(child: Expression, centroids: Array[Double],
                           nCentroids: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(centroids.length == nCentroids * dim && nCentroids > 0)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(org.apache.spark.sql.types.DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "nearest_centroid"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), dim)
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < nCentroids) {
      var d = 0.0; var i = 0; val off = c * dim
      while (i < n) { val t = x.getDouble(i) - centroids(off + i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctr = ctx.addReferenceObj("centroids", centroids, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val t = ctx.freshName("t"); val off = ctx.freshName("off")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |int $best = 0; double $bestD = Double.MAX_VALUE;
         |for (int $c = 0; $c < $nCentroids; $c++) {
         |  double $d = 0.0; int $off = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = $v.getDouble($i) - $ctr[$off + $i]; $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** MD5-derived 60-bit token hash shared with the DuckDB oracle: the
  * first 15 hex chars of the digest (= the high 60 bits), which the
  * oracle reproduces as `CAST('0x' || substr(md5(t),1,15) AS BIGINT)`.
  * 60 bits (not 64) so the unsigned value always fits a signed BIGINT
  * on both engines. Thread-local digest: no per-row allocation.
  */
object Md5Util {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def high60(bytes: Array[Byte]): Long = {
    val md = tl.get(); md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** 60-bit SimHash over tokens with the md5 token hash — semantics of
  * [[SimHash64]] (±1 votes per bit, bit set when votes > 0) but every
  * ingredient is reproducible in ANSI-ish SQL, so the result is
  * DuckDB-oracle-checkable end to end (reference semantics:
  * xyzpy-adjacent content dedup; hash choice is pluggable by design —
  * FNV for raw speed, md5 for cross-engine verification).
  */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var t = 0
    while (t < n) {
      val h = Md5Util.high60(arr.getUTF8String(t).getBytes)
      var b = 0
      while (b < 60) { votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1 }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val t = ctx.freshName("t"); val n = ctx.freshName("n")
      val votes = ctx.freshName("votes"); val h = ctx.freshName("h")
      val b = ctx.freshName("b"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $v.numElements();
         |int[] $votes = new int[60];
         |for (int $t = 0; $t < $n; $t++) {
         |  long $h = graft.functions.Md5Util.high60($v.getUTF8String($t).getBytes());
         |  for (int $b = 0; $b < 60; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

/** Bottom-k sketch kernel (d13 family) — static so generated code can
  * call it. Semantics are EXACTLY the former HOF pipeline
  * `slice(array_sort(array_distinct(transform(grams, g ->
  * conv(substring(md5('prefix' || g), 1, 15), 16, 10)))), 1, k)` plus
  * the distinct COUNT: the first 15 hex digits of an md5 are its top
  * 60 bits, i.e. `(first-8-digest-bytes as unsigned BE) >>> 4` — one
  * MessageDigest call per shingle with NO hex-string render, no
  * `conv` base parse, no boxed intermediate arrays. Measured: the
  * sketch build was 9 s of d13's 12.5 s at sf0.1 under the HOF form.
  * The oracle contract is untouched — DuckDB still rebuilds every
  * value from `md5()` hex (DedupSimSpec pins kernel ≡ HOF on a
  * fixture with multi-byte UTF-8 tokens).
  */
object SketchKernel {
  def sketch(tokens: ArrayData, n: Int, k: Int,
             prefix: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    val m = tokens.numElements()
    val cnt = m - n + 1
    val empty = UnsafeArrayData.fromPrimitiveArray(Array.empty[Long])
    if (cnt <= 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, empty))
    // null elements stay null here and are SKIPPED when a gram is
    // rendered — concat_ws semantics, matching the HOF pipeline this
    // kernel replaced (its grams came from concat_ws, which ignores
    // nulls). tokens() never emits nulls, but the declared input type
    // ArrayType(StringType) admits containsNull, so a future nullable
    // caller must degrade like the HOF form, not NPE (advisor r14).
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      tb(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      md.reset()
      md.update(prefix)
      var j = 0
      var wrote = false
      while (j < n) {
        if (tb(i + j) != null) {
          if (wrote) md.update(' '.toByte)
          md.update(tb(i + j))
          wrote = true
        }
        j += 1
      }
      val d = md.digest()
      val be =
        ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      hs(i) = be >>> 4
      i += 1
    }
    java.util.Arrays.sort(hs)
    var dct = 0
    i = 0
    while (i < cnt) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(dct) = hs(i); dct += 1 }
      i += 1
    }
    val kk = if (k < dct) k else dct
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      dct.toLong,
      UnsafeArrayData.fromPrimitiveArray(
        java.util.Arrays.copyOfRange(hs, 0, kk))))
  }
}

/** `bottomk_sketch(tokens)` → struct(sz: bigint, sk: array<bigint>) —
  * distinct-shingle count + the k smallest 60-bit md5 shingle hashes.
  */
case class BottomKSketch(child: Expression, n: Int, k: Int, prefix: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && k >= 1)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sz", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("sk",
      ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "bottomk_sketch"

  @transient private lazy val prefixBytes =
    prefix.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override protected def nullSafeEval(v: Any): Any =
    SketchKernel.sketch(v.asInstanceOf[ArrayData], n, k, prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("sketchPrefix", prefixBytes, "byte[]")
    val cls = SketchKernel.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $cls.sketch($v, $n, $k, $pRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BottomKSketch =
    copy(child = newChild)
}

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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.{GraftColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (with `doGenCode`) for the hot paths that
  * Spark's higher-order functions leave interpreted: `aggregate`/
  * `transform` lambdas have no codegen, so per-row polynomial hashing
  * and per-pair dot products dominated the bench (q20/q21/q23 were
  * 182/46/247 s at sf0.1 in the HOF form). These expressions keep the
  * same semantics — and therefore the same DuckDB oracle SQL — but run
  * as a tight compiled loop inside whole-stage codegen.
  */
object NativeExprs {

  def polyHash(c: Column): Column =
    ExpressionUtils.column(PolyHashExpr(ExpressionUtils.expression(c)))

  def dotProduct(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductExpr(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def minhashSig(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(hs), a.toArray, b.toArray, p))

  def shingleHashes(tokens: Column, w: Int, p: Long): Column =
    ExpressionUtils.column(
      ShingleHashesExpr(ExpressionUtils.expression(tokens), w, p))

  def simHash(hs: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(hs), bits))
}

/** h = fold(codepoints(s), 0, (acc, cp) => (acc*31 + cp) mod P) —
  * identical to TextExprs.polyHashSql's DuckDB form. */
case class PolyHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    PolyHashExpr.hash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHashExpr.hash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_poly_hash"
}

object PolyHashExpr {
  val P = 1000000007L
  /** Static so generated code can call it directly. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Σ a_i·b_i over two array<double> columns (length-mismatch: shorter). */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"expected array<double> pair, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProductExpr.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

object DotProductExpr {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** MinHash signature: sig[i] = min over hs of (a(i)*h + b(i)) mod p —
  * identical to TextExprs.minhashSigSql's DuckDB form. */
case class MinHashSigExpr(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    MinHashSigExpr.sig(input.asInstanceOf[ArrayData], a, b, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigExpr.sig($c, $aRef, $bRef, ${p}L)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash_sig"
  // Array fields would use reference equality; compare by content.
  override def equals(o: Any): Boolean = o match {
    case m: MinHashSigExpr =>
      m.child == child && m.p == p &&
        java.util.Arrays.equals(m.a, a) && java.util.Arrays.equals(m.b, b)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Long.valueOf(p),
      Integer.valueOf(java.util.Arrays.hashCode(a)))
}

/** Distinct polynomial hashes of the w-word shingles of a token array —
  * hash(concat_ws(" ", t_i..t_{i+w-1})) without materializing the
  * concatenated strings. One pass per document; this replaces an
  * interpreted-HOF form whose lambda re-evaluated the whole tokenize
  * pipeline for every element (the dominant bench cost).
  * Matches DedupOps.shingleHashesSql's DuckDB form exactly. */
case class ShingleHashesExpr(child: Expression, w: Int, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    ShingleHashesExpr.hashes(input.asInstanceOf[ArrayData], w, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashesExpr.hashes($c, $w, ${p}L)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_shingle_hashes"
}

object ShingleHashesExpr {
  def hashes(tokens: ArrayData, w: Int, p: Long): ArrayData = {
    val n = tokens.numElements()
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i).toString; i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - w) {
      var acc = 0L
      var k = 0
      while (k < w) {
        if (k > 0) acc = (acc * 31 + ' ') % p
        val s = toks(i + k)
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          acc = (acc * 31 + cp) % p
          j += Character.charCount(cp)
        }
        k += 1
      }
      seen.add(acc)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** SimHash over an array of 64-bit token hashes: bit b of the result is
  * set iff Σ_tokens (±1 by bit b of the hash) > 0. One pass; matches
  * DedupOps.simhashSql's DuckDB form. */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    SimHashExpr.simhash(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.simhash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

object SimHashExpr {
  def simhash(hs: ArrayData, bits: Int): Long = {
    val counts = new Array[Int](bits)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}

object MinHashSigExpr {
  def sig(hs: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val out = new Array[Long](k)
    val n = hs.numElements()
    var i = 0
    while (i < k) {
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a(i) * hs.getLong(j) + b(i)) % p
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }
}

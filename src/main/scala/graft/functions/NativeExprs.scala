package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
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

  def quantize(v: Column, q: Double): Column =
    ExpressionUtils.column(QuantizeExpr(ExpressionUtils.expression(v), q))

  def minhashSig(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(
      MinHashSigExpr(ExpressionUtils.expression(hs), a.toArray, b.toArray, p))

  def shingleHashes(tokens: Column, w: Int, p: Long): Column =
    ExpressionUtils.column(
      ShingleHashesExpr(ExpressionUtils.expression(tokens), w, p))

  def gramHashes(tokens: Column, w: Int, p: Long): Column =
    ExpressionUtils.column(
      GramHashesExpr(ExpressionUtils.expression(tokens), w, p))

  def gramFreqStats(tokens: Column, w: Int, p: Long): Column =
    ExpressionUtils.column(
      GramFreqStatsExpr(ExpressionUtils.expression(tokens), w, p))

  def simHash(hs: Column, bits: Int): Column =
    ExpressionUtils.column(SimHashExpr(ExpressionUtils.expression(hs), bits))

  def tokenHashes(tokens: Column): Column =
    ExpressionUtils.column(TokenHashesExpr(ExpressionUtils.expression(tokens)))

  def countInSet(tokens: Column, words: Seq[String]): Column =
    ExpressionUtils.column(CountInSetExpr(ExpressionUtils.expression(tokens), words.toArray))

  /** A long constant passed via the codegen `references` array (see
    * [[ParamLongExpr]]) — use instead of `lit` when an iterative loop
    * re-plans the same shape with fresh values every round. */
  def paramLong(v: Long): Column = ExpressionUtils.column(ParamLongExpr(v))

  def countCpRange(s: Column, lo: Int, hi: Int): Column =
    ExpressionUtils.column(CountCpRangeExpr(ExpressionUtils.expression(s), lo, hi))

  def countPunct(s: Column): Column =
    ExpressionUtils.column(CountPunctExpr(ExpressionUtils.expression(s)))

  def countWsTokens(s: Column): Column =
    ExpressionUtils.column(CountWsTokensExpr(ExpressionUtils.expression(s)))

  def countBpeTokens(s: Column): Column =
    ExpressionUtils.column(CountBpeTokensExpr(ExpressionUtils.expression(s)))

  def minhashSigAgg(hs: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(
      MinHashSigAggExpr(ExpressionUtils.expression(hs), a.toArray, b.toArray, p)
        .toAggregateExpression())

  def bloomAgg(h: Column, mBits: Int, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ExpressionUtils.column(
      BloomAggExpr(ExpressionUtils.expression(h), mBits, a.toArray, b.toArray, p)
        .toAggregateExpression())

  def bottomK(h: Column, k: Int): Column =
    ExpressionUtils.column(
      BottomKAggExpr(ExpressionUtils.expression(h), k)
        .toAggregateExpression())

  def countMinAgg(h: Column, width: Int, a: Seq[Long], b: Seq[Long],
                  p: Long): Column =
    ExpressionUtils.column(
      CountMinAggExpr(ExpressionUtils.expression(h), width,
        a.toArray, b.toArray, p)
        .toAggregateExpression())

  def misraGries(tokens: Column, capacity: Int): Column =
    ExpressionUtils.column(
      MisraGriesAggExpr(ExpressionUtils.expression(tokens), capacity)
        .toAggregateExpression())

  def tokenize(s: Column): Column =
    ExpressionUtils.column(TokenizeExpr(ExpressionUtils.expression(s)))

  def bpeSegment(s: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(BpeSegmentExpr(ExpressionUtils.expression(s),
      merges.flatMap(p => Seq(p._1, p._2)).toArray))

  def charBigrams(s: Column): Column =
    ExpressionUtils.column(CharBigramsExpr(ExpressionUtils.expression(s)))

  def normalizeNfc(s: Column): Column =
    ExpressionUtils.column(NormalizeNfcExpr(ExpressionUtils.expression(s)))

  def urlCanon(s: Column): Column =
    ExpressionUtils.column(UrlCanonExpr(ExpressionUtils.expression(s)))

  def mojibakeRepair(s: Column): Column =
    ExpressionUtils.column(MojibakeRepairExpr(ExpressionUtils.expression(s)))

  def cdcChunks(s: Column, w: Int, d: Int): Column =
    ExpressionUtils.column(CdcChunksExpr(ExpressionUtils.expression(s), w, d))

  def charGramHashes(s: Column, w: Int): Column =
    ExpressionUtils.column(CharGramHashesExpr(ExpressionUtils.expression(s), w))

  def deleteVariantHashes(s: Column): Column =
    ExpressionUtils.column(DeleteVariantHashesExpr(ExpressionUtils.expression(s)))
}

/** FastSS / symmetric-delete blocking keys: the polyhash of the string
  * itself plus every single-character deletion of it. Two strings at
  * edit distance ≤ 1 ALWAYS share a key (equal → identity key;
  * substitution at i → both delete-at-i variants equal; insert/delete
  * → the shorter string IS a deletion variant of the longer), so a
  * self-join on these keys is a NO-FALSE-NEGATIVE candidate filter
  * for distance-1 matching — O(n·len) index keys instead of O(n²)
  * comparisons (Bocek et al., "Fast Similarity Search in Large
  * Dictionaries", 2007; the SymSpell shape). Distinct, in
  * first-occurrence order. */
case class DeleteVariantHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    DeleteVariantHashesExpr.variants(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeleteVariantHashesExpr.variants($c)")
  override protected def withNewChildInternal(
      newChild: Expression): DeleteVariantHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_delete_variant_hashes"
}

object DeleteVariantHashesExpr {
  val P = 1000000007L

  private def hashSkip(cps: Array[Int], skip: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < cps.length) {
      if (i != skip) acc = (acc * 31 + cps(i)) % P
      i += 1
    }
    acc
  }

  /** Static so generated code can call it directly. */
  def variants(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = -1 // -1 = identity (no skip)
    while (i < cps.length) {
      val h = hashSkip(cps, i)
      if (seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** DISTINCT polyhashes of every `w`-char window of the string — the
  * posting-list key of a substring-search inverted index: text
  * containing a probe necessarily contains every one of the probe's
  * windows, so gram-postings intersection is a NO-FALSE-NEGATIVE
  * candidate filter ahead of the exact `contains` verify. The window
  * hash is the shared polyhash fold (rolling O(1)/char here; the
  * DuckDB twin recomputes per window from `substr`). */
case class CharGramHashesExpr(child: Expression, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CharGramHashesExpr.grams(input.asInstanceOf[UTF8String], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharGramHashesExpr.grams($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): CharGramHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_char_gram_hashes"
}

object CharGramHashesExpr {
  val P = 1000000007L

  /** Static so generated code can call it directly. Distinct window
    * hashes in first-occurrence order. */
  def grams(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    var powW = 1L
    var k = 0
    while (k < w) { powW = (powW * 31) % P; k += 1 }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31 + cps(i)) % P
      if (i >= w) h = ((h - (cps(i - w) * powW) % P) % P + P) % P
      if (i >= w - 1 && seen.add(h)) out += h
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Content-defined chunking (Rabin-style): boundaries where the
  * rolling hash of the trailing `w`-char window is ≡ 0 (mod d), so
  * chunk edges re-synchronize after insertions/deletions — the
  * storage-dedup property fixed-size blocks lack. Returns the chunk
  * fingerprints (the polyhash fold) in document order. The window
  * hash IS the polyhash of the window substring, so the DuckDB twin
  * recomputes both boundaries and fingerprints with the shared
  * `polyHashSql` fold — one definition, two engines. */
case class CdcChunksExpr(child: Expression, w: Int, d: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CdcChunksExpr.chunks(input.asInstanceOf[UTF8String], w, d)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunksExpr.chunks($c, $w, $d)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_cdc_chunks"
}

object CdcChunksExpr {
  val P = 1000000007L

  private def hashRange(cps: Array[Int], from: Int, until: Int): Long = {
    var acc = 0L
    var i = from
    while (i < until) { acc = (acc * 31 + cps(i)) % P; i += 1 }
    acc
  }

  /** Static so generated code can call it directly. Boundary after
    * 0-based position `i` (i ∈ [w-1, n-2]: the final chunk is never
    * empty) when polyhash(cps[i-w+1..i]) mod d == 0; rolling update
    * H ← (H·31 + c_in − c_out·31^w) mod P keeps it O(1)/char. */
  def chunks(s: UTF8String, w: Int, d: Int): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    var powW = 1L
    var k = 0
    while (k < w) { powW = (powW * 31) % P; k += 1 }
    val fps = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h * 31 + cps(i)) % P
      if (i >= w) h = ((h - (cps(i - w) * powW) % P) % P + P) % P
      if (i >= w - 1 && i < n - 1 && h % d == 0) {
        fps += hashRange(cps, start, i + 1)
        start = i + 1
      }
      i += 1
    }
    fps += hashRange(cps, start, n)
    new GenericArrayData(fps.toArray)
  }
}

/** Unicode NFC normalization (canonical composition) via the JDK's
  * `java.text.Normalizer` — ICU-free, codegen'd. Composed and
  * decomposed spellings of the same text (U+00E9 vs `e`+U+0301) are
  * byte-distinct to every fingerprint/tokenize pass yet identical to a
  * reader; normalizing before fingerprinting is what makes such twins
  * dedup together. DuckDB twin: `nfc_normalize(s)`. */
case class NormalizeNfcExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    NormalizeNfcExpr.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeNfcExpr.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeNfcExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_nfc"
}

/** Canonical URL normalization — the dedup key of every web-crawl
  * pipeline (the same page arrives as `HTTPS://Host:443/p/?utm_…#f`
  * and `https://host/p`). Rules, fixed as a cross-engine contract:
  * lowercase scheme+host; strip the fragment; strip default ports
  * (http:80, https:443); drop tracking query params (`utm_*`, gclid,
  * fbclid, ref, mc_cid, mc_eid) keeping the rest in original order;
  * drop a trailing path slash (non-root); empty path → `/`. */
case class UrlCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    UrlCanonExpr.canon(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanonExpr.canon($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlCanonExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_url_canon"
}

object UrlCanonExpr {
  private val Tracking = Set("gclid", "fbclid", "ref", "mc_cid", "mc_eid")

  private def isTracking(param: String): Boolean = {
    val key = param.indexOf('=') match {
      case -1 => param
      case i  => param.substring(0, i)
    }
    key.startsWith("utm_") || Tracking.contains(key)
  }

  /** Static so generated code can call it directly. Strings that don't
    * parse as `scheme://authority…` pass through unchanged (a
    * canonicalizer must never destroy a key it can't read). */
  def canon(s: UTF8String): UTF8String = {
    val str = s.toString
    val sep = str.indexOf("://")
    if (sep <= 0) return s
    val scheme = str.substring(0, sep).toLowerCase
    // fragment goes first — it may contain '/', '?', ':'
    val noFrag = str.indexOf('#') match {
      case -1 => str
      case i  => str.substring(0, i)
    }
    val rest = noFrag.substring(math.min(sep + 3, noFrag.length))
    val pathStart = rest.indexWhere(c => c == '/' || c == '?')
    val (auth, tail) =
      if (pathStart == -1) (rest, "")
      else (rest.substring(0, pathStart), rest.substring(pathStart))
    var host = auth.toLowerCase
    if ((scheme == "http" && host.endsWith(":80")) ||
        (scheme == "https" && host.endsWith(":443")))
      host = host.substring(0, host.lastIndexOf(':'))
    val qStart = tail.indexOf('?')
    var path = if (qStart == -1) tail else tail.substring(0, qStart)
    val query = if (qStart == -1) "" else tail.substring(qStart + 1)
    if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)
    if (path.isEmpty) path = "/"
    val kept = query.split("&").filter(p => p.nonEmpty && !isTracking(p))
    val q = if (kept.isEmpty) "" else kept.mkString("?", "&", "")
    UTF8String.fromString(scheme + "://" + host + path + q)
  }
}

/** Mojibake repair for the classic double-encoding corruption: UTF-8
  * bytes mis-decoded as Latin-1 (`é` arriving as `Ã©`). Detection is
  * conservative: the repair fires only when (a) some char is in the
  * Latin-1 range (so the string COULD be byte-reinterpreted), (b) every
  * char is ≤ U+00FF, and (c) reinterpreting the char codes as bytes
  * yields STRICTLY VALID UTF-8 containing a multi-byte sequence.
  * Well-formed text (ASCII or genuine Latin-1 prose that is not valid
  * UTF-8) passes through unchanged. */
case class MojibakeRepairExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    MojibakeRepairExpr.repair(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MojibakeRepairExpr.repair($c)")
  override protected def withNewChildInternal(newChild: Expression): MojibakeRepairExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_mojibake_repair"
}

object MojibakeRepairExpr {
  /** Static so generated code can call it directly. */
  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    var hasHigh = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c > 0xff) return s // genuine non-Latin-1 text: not mojibake
      if (c > 0x7f) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s // pure ASCII: nothing to repair
    val bytes = new Array[Byte](str.length)
    i = 0
    while (i < str.length) { bytes(i) = str.charAt(i).toByte; i += 1 }
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out.length < str.length) UTF8String.fromString(out) else s
    } catch { case _: java.nio.charset.CharacterCodingException => s }
  }
}

object NormalizeNfcExpr {
  /** Static so generated code can call it directly. Fast path: NFC
    * normalization is the identity on pure-ASCII strings (the common
    * case for this corpus), and `isNormalized` avoids the copy for
    * already-composed non-ASCII text. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
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

/** Per-component quantization `floor(x·q + 0.5)` of an array<double>
  * — exact small-integer-valued doubles, the deterministic base of the
  * RP family (VectorOps.RpQ rationale). Codegen'd so 32 projection
  * dots can consume one materialized quantized array instead of
  * CollapseProject inlining an interpreted HOF 32×. */
case class QuantizeExpr(child: Expression, q: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<double>, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    QuantizeExpr.quant(v.asInstanceOf[ArrayData], q)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.QuantizeExpr.quant($v, ${q}D)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_quantize"
}

object QuantizeExpr {
  def quant(v: ArrayData, q: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      // null elements quantize to 0 (same null-as-0 convention as dot)
      if (!v.isNullAt(i)) out(i) = math.floor(v.getDouble(i) * q + 0.5)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

object DotProductExpr {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute 0 (skipped) rather than NPE
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
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
    val nAll = tokens.numElements()
    // null elements are dropped before shingling
    val toks0 = new Array[String](nAll)
    var n = 0
    var i = 0
    while (i < nAll) {
      if (!tokens.isNullAt(i)) { toks0(n) = tokens.getUTF8String(i).toString; n += 1 }
      i += 1
    }
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val toks = toks0
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

/** POSITIONAL variant of [[ShingleHashesExpr]]: one hash per w-gram
  * start position, multiplicity preserved (no dedup) — the postings
  * primitive for substring-level dedup, where the unit of accounting is
  * the gram POSITION (how much of this document is covered by spans
  * repeated elsewhere), not the distinct gram. Same fold as
  * ShingleHashesExpr, so the DuckDB twin is
  * list_transform(range(...), i -> polyhash(array_to_string(t[i:i+w-1], ' '))). */
case class GramHashesExpr(child: Expression, w: Int, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    GramHashesExpr.hashes(input.asInstanceOf[ArrayData], w, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashesExpr.hashes($c, $w, ${p}L)")
  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_hashes"
}

object GramHashesExpr {
  def hashes(tokens: ArrayData, w: Int, p: Long): ArrayData = {
    val nAll = tokens.numElements()
    val toks0 = new Array[String](nAll)
    var n = 0
    var i = 0
    while (i < nAll) {
      if (!tokens.isNullAt(i)) { toks0(n) = tokens.getUTF8String(i).toString; n += 1 }
      i += 1
    }
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - w + 1)
    i = 0
    while (i <= n - w) {
      var acc = 0L
      var k = 0
      while (k < w) {
        if (k > 0) acc = (acc * 31 + ' ') % p
        val s = toks0(i + k)
        var j = 0
        while (j < s.length) {
          val cp = s.codePointAt(j)
          acc = (acc * 31 + cp) % p
          j += Character.charCount(cp)
        }
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document w-gram frequency statistics in ONE in-row pass —
  * `[n_pos, top_cnt, dup_pos]`: total gram positions, occurrences of
  * the most frequent gram, and positions whose gram occurs more than
  * once. The Gopher-style repetition rules (top-n-gram mass, duplicated
  * n-gram mass) become a zero-shuffle narrow map instead of an
  * explode→groupBy per gram size; the DuckDB twin re-derives the same
  * three numbers from an unnest of the positional gram-hash list. */
case class GramFreqStatsExpr(child: Expression, w: Int, p: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    GramFreqStatsExpr.stats(input.asInstanceOf[ArrayData], w, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramFreqStatsExpr.stats($c, $w, ${p}L)")
  override protected def withNewChildInternal(newChild: Expression): GramFreqStatsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_freq_stats"
}

object GramFreqStatsExpr {
  def stats(tokens: ArrayData, w: Int, p: Long): ArrayData = {
    val grams = GramHashesExpr.hashes(tokens, w, p)
    val nPos = grams.numElements()
    if (nPos == 0)
      return new GenericArrayData(Array(0L, 0L, 0L))
    val counts = new java.util.HashMap[java.lang.Long, Array[Int]]()
    var i = 0
    while (i < nPos) {
      val c = counts.computeIfAbsent(grams.getLong(i), _ => new Array[Int](1))
      c(0) += 1
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toLong
      if (c > top) top = c
      if (c > 1L) dup += c
    }
    new GenericArrayData(Array(nPos.toLong, top, dup))
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
      // null elements are skipped
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var b = 0
        while (b < bits) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
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

/** One-pass tokenizer: lowercase, then maximal runs of ASCII [a-z0-9]
  * become tokens (everything else separates) — the native (codegen)
  * form of `filter(split(trim(regexp_replace(lower(s), "[^a-z0-9]+",
  * " ")), " "), t => t != "")`, with no regex engine, no intermediate
  * replaced string, and no empty-element array churn. Lowercasing uses
  * the same UTF8String.toLowerCase the built-in `lower` uses, so
  * non-ASCII case mappings match exactly. */
case class TokenizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    TokenizeExpr.tokens(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenizeExpr.tokens($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenizeExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_tokenize"
}

object TokenizeExpr {
  def tokens(s: UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var start = -1
    while (i < str.length) {
      val c = str.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum && start < 0) start = i
      else if (!alnum && start >= 0) {
        out.add(UTF8String.fromString(str.substring(start, i)))
        start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromString(str.substring(start)))
    new GenericArrayData(out.toArray)
  }
}

/** Per-element polynomial hash of a token array: the native (codegen)
  * form of `transform(tokens, t => polyHash(t))`, whose lambda runs
  * interpreted per element. Null elements are skipped (dropped from the
  * output), consistent with the other graft array expressions. */
case class TokenHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    TokenHashesExpr.hashes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenHashesExpr.hashes($c)")
  override protected def withNewChildInternal(newChild: Expression): TokenHashesExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_token_hashes"
}

object TokenHashesExpr {
  def hashes(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        out(m) = PolyHashExpr.hash(tokens.getUTF8String(i))
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }
}

/** Count of array elements contained in a fixed word set — the native
  * form of `size(filter(tokens, t => t.isin(words)))` (interpreted HOF).
  * Null elements are ignored. */
case class CountInSetExpr(child: Expression, words: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  @transient private lazy val set: java.util.HashSet[UTF8String] = CountInSetExpr.toSet(words)
  override def nullSafeEval(input: Any): Any =
    CountInSetExpr.count(input.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev, c => s"graft.functions.CountInSetExpr.count($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): CountInSetExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_count_in_set"
  // Array field would use reference equality; compare by content.
  override def equals(o: Any): Boolean = o match {
    case m: CountInSetExpr =>
      m.child == child && java.util.Arrays.equals(
        m.words.asInstanceOf[Array[AnyRef]], words.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(java.util.Arrays.hashCode(words.asInstanceOf[Array[AnyRef]])))
}

object CountInSetExpr {
  def toSet(words: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  def count(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** Count of code points within [lo, hi] — the native form of
  * `regexp_count(s, "[\\x{lo}-\\x{hi}]")` without the regex engine. */
case class CountCpRangeExpr(child: Expression, lo: Int, hi: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CountCpRangeExpr.count(input.asInstanceOf[UTF8String], lo, hi)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountCpRangeExpr.count($c, $lo, $hi)")
  override protected def withNewChildInternal(newChild: Expression): CountCpRangeExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_count_cp_range"
}

object CountCpRangeExpr {
  def count(s: UTF8String, lo: Int, hi: Int): Int = {
    val str = s.toString
    var c = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp >= lo && cp <= hi) c += 1
      i += Character.charCount(cp)
    }
    c
  }
}

/** Count of code points matching Java regex class `[^a-z0-9\s]`
  * (punctuation probe over already-lowercased text) — native form of
  * `regexp_count(s, "[^a-z0-9\\s]")`. Java's `\s` is the ASCII set
  * {\t, \n, \x0B, \f, \r, space}. */
case class CountPunctExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CountPunctExpr.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountPunctExpr.count($c)")
  override protected def withNewChildInternal(newChild: Expression): CountPunctExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_count_punct"
}

object CountPunctExpr {
  private def isJavaSpace(cp: Int): Boolean =
    cp == ' ' || (cp >= '\t' && cp <= '\r') // \t \n \x0B \f \r
  def count(s: UTF8String): Int = {
    val str = s.toString
    var c = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (!(cp >= 'a' && cp <= 'z') && !(cp >= '0' && cp <= '9') && !isJavaSpace(cp)) c += 1
      i += Character.charCount(cp)
    }
    c
  }
}

/** Count of whitespace-separated tokens — native form of
  * `size(filter(split(s, "\\s+"), t => t != ""))`: the number of maximal
  * runs of non-`\s` characters (Java ASCII `\s`). */
case class CountWsTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CountWsTokensExpr.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountWsTokensExpr.count($c)")
  override protected def withNewChildInternal(newChild: Expression): CountWsTokensExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_count_ws_tokens"
}

object CountWsTokensExpr {
  def count(s: UTF8String): Int = {
    val str = s.toString
    var c = 0
    var inTok = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val ws = cp == ' ' || (cp >= '\t' && cp <= '\r')
      if (!ws && !inTok) { c += 1; inTok = true }
      else if (ws) inTok = false
      i += Character.charCount(cp)
    }
    c
  }
}

/** Count of BPE-ish tokens over lowercased text — native form of
  * `regexp_count(s, "[a-z]+|[0-9]+|[^a-z0-9\\s]")`: greedy left-to-right
  * alternation ≡ (# maximal letter runs) + (# maximal digit runs) +
  * (# other non-whitespace code points). */
case class CountBpeTokensExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CountBpeTokensExpr.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CountBpeTokensExpr.count($c)")
  override protected def withNewChildInternal(newChild: Expression): CountBpeTokensExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_count_bpe_tokens"
}

object CountBpeTokensExpr {
  def count(s: UTF8String): Int = {
    val str = s.toString
    var c = 0
    var run = 0 // 0 = none, 1 = letters, 2 = digits
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') { if (run != 1) { c += 1; run = 1 } }
      else if (cp >= '0' && cp <= '9') { if (run != 2) { c += 1; run = 2 } }
      else {
        run = 0
        val ws = cp == ' ' || (cp >= '\t' && cp <= '\r')
        if (!ws) c += 1
      }
      i += Character.charCount(cp)
    }
    c
  }
}

/** Native grouped MinHash sketch: the TypedImperativeAggregate twin of
  * [[graft.functions.MinHashSigAggregator]] (the Aggregator/udaf form).
  * The buffer is a raw long[K] updated in place and serialized as
  * packed bytes between partial and final aggregation — no per-row
  * encoder round-trip, which is the udaf form's dominant cost. Same
  * algebra: sig(union) = elementwise min, so partials merge exactly. */
case class MinHashSigAggExpr(
    child: Expression,
    a: Array[Long], b: Array[Long], p: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  private def k = a.length

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val hs = child.eval(input)
    if (hs != null) {
      val arr = hs.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h = arr.getLong(j)
          var i = 0
          while (i < k) {
            val v = (a(i) * h + b(i)) % p
            if (v < buf(i)) buf(i) = v
            i += 1
          }
        }
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<bigint>, got $other")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAggExpr =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_minhash_agg"
  // Array fields would use reference equality; compare by content.
  override def equals(o: Any): Boolean = o match {
    case m: MinHashSigAggExpr =>
      m.child == child && m.p == p &&
        m.mutableAggBufferOffset == mutableAggBufferOffset &&
        m.inputAggBufferOffset == inputAggBufferOffset &&
        java.util.Arrays.equals(m.a, a) && java.util.Arrays.equals(m.b, b)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, java.lang.Long.valueOf(p),
      Integer.valueOf(java.util.Arrays.hashCode(a)))
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
        // null elements are skipped
        if (!hs.isNullAt(j)) {
          val v = (a(i) * hs.getLong(j) + b(i)) % p
          if (v < m) m = v
        }
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }
}
/** Bloom filter build as a TypedImperativeAggregate (q171) — the
  * pre-join pruning sketch: an m-bit array where each input hash sets
  * k affine-family bit positions. Union algebra is exact (bitwise OR),
  * so map-side partials merge losslessly and the whole build ships one
  * m/64-long word array per partition. Membership is NOT a custom
  * expression — the emitted word array broadcasts as a plain
  * array<long> column and the k bit probes are built-in shiftright/&
  * arithmetic (codegen'd), which is the composition-first preference:
  * custom code only where the built-ins genuinely cannot express the
  * semantics (the mergeable build), nothing else. */
case class BloomAggExpr(
    child: Expression,
    mBits: Int,
    a: Array[Long], b: Array[Long], p: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  private def k = a.length
  private def words = (mBits + 63) / 64

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < k) {
        val bit = (((a(j) * h + b(j)) % p) % mBits).toInt
        buf(bit >>> 6) |= 1L << (bit & 63)
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected bigint, got $other")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomAggExpr =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_bloom_agg"
  override def equals(o: Any): Boolean = o match {
    case m: BloomAggExpr =>
      m.child == child && m.p == p && m.mBits == mBits &&
        m.mutableAggBufferOffset == mutableAggBufferOffset &&
        m.inputAggBufferOffset == inputAggBufferOffset &&
        java.util.Arrays.equals(m.a, a) && java.util.Arrays.equals(m.b, b)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(mBits),
      Integer.valueOf(java.util.Arrays.hashCode(a)))
}

/** Bottom-k distinct-values (KMV) sketch as a TypedImperativeAggregate
  * — the mergeable set-summary behind cross-corpus overlap estimation
  * (q163): keep the k SMALLEST distinct hash values seen. Union
  * algebra is exact (bottomK(A ∪ B) = bottomK(bottomK(A) ∪
  * bottomK(B))), so map-side partials merge losslessly and the shuffle
  * carries one ≤k-long sorted sketch per partition instead of the
  * per-source distinct-value stream. Buffer = a TreeSet capped at k:
  * insert-if-smaller-than-max, O(log k) per row; duplicate hashes are
  * absorbed (KMV is a DISTINCT-value summary — a re-seen hash must not
  * evict anything). eval() emits the ascending array<long>, which the
  * oracle reproduces as row_number() OVER (ORDER BY h) <= k. */
/** Count-Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) as a
  * mergeable TypedImperativeAggregate: `depth = a.length` rows of
  * `width` counters; each input hash increments one counter per row at
  * cell ((a_r·h + b_r) mod p) mod width. Merge is elementwise counter
  * addition — partials combine map-side, state is O(depth·width) per
  * partition regardless of key cardinality. eval() returns the full
  * flattened counter array (row-major), so point estimates
  * min_r counters[r·width + cell_r(h)] stay DECLARATIVE `element_at`
  * expressions and a relational oracle can rebuild every counter. */
case class CountMinAggExpr(
    child: Expression,
    width: Int,
    a: Array[Long], b: Array[Long], p: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[Array[Long]] {

  private def depth = a.length

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var r = 0
      while (r < depth) {
        val cell = (((a(r) * h + b(r)) % p) % width).toInt
        buf(r * width + cell) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected bigint, got $other")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAggExpr =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_count_min_agg"
  override def equals(o: Any): Boolean = o match {
    case m: CountMinAggExpr =>
      m.child == child && m.p == p && m.width == width &&
        m.mutableAggBufferOffset == mutableAggBufferOffset &&
        m.inputAggBufferOffset == inputAggBufferOffset &&
        java.util.Arrays.equals(m.a, a) && java.util.Arrays.equals(m.b, b)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(width),
      Integer.valueOf(java.util.Arrays.hashCode(a)))
}

case class BottomKAggExpr(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      // only evict when the insert actually added a NEW value
      if (buf.add(h)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) insert(b1, it.next())
    b1
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 8)
    val lb = bb.asLongBuffer()
    val it = buf.iterator()
    while (it.hasNext) lb.put(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val lb = java.nio.ByteBuffer.wrap(bytes).asLongBuffer()
    while (lb.hasRemaining) out.add(lb.get())
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected bigint, got $other")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKAggExpr =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_bottom_k_agg"
}

/** Misra-Gries frequent-items sketch as a TypedImperativeAggregate —
  * the heavy-hitters family member beside HLL++ (q44) and KLL (q45).
  * Buffer = at most `capacity` (token, weight) counters; the classic
  * stream update decrements ALL counters when a new token arrives at a
  * full buffer. Merging two sketches sums counters, then re-trims to
  * capacity by subtracting the (capacity+1)-th largest weight — the
  * standard mergeable form (Agarwal et al., "Mergeable Summaries"), so
  * partial aggregation across partitions keeps the guarantee: EVERY
  * token with true frequency > N/(capacity+1) is in the final
  * candidate set, regardless of partition order or merge shape. The
  * candidate membership is what the oracle verifies (weights are
  * order-dependent approximations and are not emitted).
  *
  * Scale shape: per-partition state is O(capacity) regardless of input
  * size; the shuffle carries one small sketch per partition — the
  * exact-count alternative shuffles every distinct token. */
case class MisraGriesAggExpr(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  private type Buf = java.util.HashMap[String, Long]

  override def createAggregationBuffer(): Buf = new java.util.HashMap[String, Long]()

  private def offer(buf: Buf, t: String, w: Long): Unit = {
    val cur = buf.get(t)
    if (cur != 0L || buf.containsKey(t)) buf.put(t, cur + w)
    else if (buf.size < capacity) buf.put(t, w)
    else {
      // decrement all counters by min(w, smallest counter share) — the
      // batch form of w repeated unit decrements
      val it = buf.entrySet().iterator()
      var minV = Long.MaxValue
      while (it.hasNext) { val v = it.next().getValue; if (v < minV) minV = v }
      val d = math.min(w, minV)
      val it2 = buf.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - d
        if (nv <= 0) it2.remove() else e.setValue(nv)
      }
      if (w - d > 0) offer(buf, t, w - d)
    }
  }

  override def update(buf: Buf, input: org.apache.spark.sql.catalyst.InternalRow): Buf = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) offer(buf, a.getUTF8String(i).toString, 1L)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, cur + e.getValue)
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest weight, drop non-positives
      val ws = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { ws(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(ws)
      val d = ws(ws.length - capacity - 1)
      val it2 = b1.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val nv = e.getValue - d
        if (nv <= 0) it2.remove() else e.setValue(nv)
      }
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val keys = new Array[String](buf.size)
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    new GenericArrayData(keys.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(e.getValue)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len); in.readFully(b)
      buf.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected array<string>, got $other")
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAggExpr =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "graft_misra_gries"
}

/** Learned-BPE segmentation of a document: tokenize (TokenizeExpr
  * semantics — lowercase, alnum runs), then apply the learned merge
  * table to each word — merges in learned order, each one exact greedy
  * left-to-right (non-overlapping; in a run of identical symbols the
  * 1st/3rd/... positions merge) — and emit all resulting subword
  * symbols joined by single spaces. The merge table is a tiny collected
  * artifact (the PQ-codebook convention), held flat as
  * [a0, b0, a1, b1, ...] and shipped to codegen as a reference object
  * that also carries a bounded word→segmentation memo (corpus word
  * frequencies are Zipfian — the memo turns the per-row cost into a
  * hash probe for all but first-sight words). */
case class BpeSegmentExpr(child: Expression, merges: Array[String])
    extends UnaryExpression {
  require(merges.length % 2 == 0, "merges must be (a, b) pairs, flattened")
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"expected string, got ${child.dataType}")
  @transient private lazy val table = new BpeSegmentExpr.Table(merges)
  override def nullSafeEval(input: Any): Any =
    BpeSegmentExpr.segment(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      "graft.functions.BpeSegmentExpr.Table")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeSegmentExpr.segment($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_bpe_segment"
  // Array field would use reference equality; compare by content.
  override def equals(o: Any): Boolean = o match {
    case m: BpeSegmentExpr =>
      m.child == child && java.util.Arrays.equals(
        m.merges.asInstanceOf[Array[AnyRef]], merges.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child,
    Integer.valueOf(java.util.Arrays.hashCode(merges.asInstanceOf[Array[AnyRef]])))
}

object BpeSegmentExpr {

  /** Merge table + bounded memo (word → segmentation). */
  final class Table(val merges: Array[String]) extends Serializable {
    @transient lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, String]()
    val MemoCap = 1 << 16
  }

  /** One word → its space-joined subword symbols. */
  private def segmentWord(word: String, merges: Array[String]): String = {
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms.add(word.substring(i, i + n))
      i += n
    }
    var m = 0
    while (m < merges.length) {
      val a = merges(m); val b = merges(m + 1)
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          out.add(a + b); j += 2
        } else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
      m += 2
    }
    String.join(" ", syms)
  }

  /** Static so generated code can call it directly. */
  def segment(s: UTF8String, table: Table): UTF8String = {
    val str = s.toLowerCase.toString
    val sb = new java.lang.StringBuilder(str.length * 2)
    var i = 0
    var start = -1
    def emit(word: String): Unit = {
      var seg = table.memo.get(word)
      if (seg == null) {
        seg = segmentWord(word, table.merges)
        if (table.memo.size < table.MemoCap) table.memo.put(word, seg)
      }
      if (sb.length > 0) sb.append(' ')
      sb.append(seg)
    }
    while (i < str.length) {
      val c = str.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum && start < 0) start = i
      else if (!alnum && start >= 0) { emit(str.substring(start, i)); start = -1 }
      i += 1
    }
    if (start >= 0) emit(str.substring(start))
    UTF8String.fromString(sb.toString)
  }
}

/** Positional character-bigram ids over a string: one long per adjacent
  * code-point pair, id = cp1 * 1114112 + cp2 (1114112 = 0x110000, one
  * past the max code point — the encoding is a bijection, so the DuckDB
  * twin `unicode(substr(s,i,1))*1114112 + unicode(substr(s,i+1,1))`
  * produces identical ids). Multiplicity preserved (the LM counts
  * occurrences); < 2 code points → empty array. */
case class CharBigramsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"expected string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    CharBigramsExpr.bigrams(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharBigramsExpr.bigrams($c)")
  override protected def withNewChildInternal(newChild: Expression): CharBigramsExpr =
    copy(child = newChild)
  override def prettyName: String = "graft_char_bigrams"
}

object CharBigramsExpr {
  private val CpBase = 1114112L // 0x110000

  def bigrams(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - 1)
    var prev = str.codePointAt(0)
    var j = Character.charCount(prev)
    var i = 0
    while (j < str.length) {
      val cp = str.codePointAt(j)
      out(i) = prev * CpBase + cp
      prev = cp
      j += Character.charCount(cp)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** A long "parameter" carried through the codegen `references` array
  * instead of being baked into the generated source as a literal.
  *
  * Iterative learners (q149's fused GD loop) re-plan a structurally
  * identical aggregate every round with only the model weights
  * changing; with ordinary `lit`s each round's generated source embeds
  * the new values, so janino recompiles ~30 aggregate methods per
  * round and compilation dominates the loop. With the weight read as
  * `references[i]` the source text is byte-identical across rounds and
  * the whole-stage-codegen cache serves every round after the first.
  * Non-foldable by design — ConstantFolding would otherwise collapse
  * it right back into a baked literal. */
case class ParamLongExpr(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("paramLong",
      java.lang.Long.valueOf(value), "java.lang.Long")
    ExprCode.forNonNullValue(JavaCode.expression(s"$ref.longValue()", LongType))
  }
  override def prettyName: String = "graft_param_long"
}

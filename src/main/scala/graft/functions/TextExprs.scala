package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash expression builders for the dedup / text-analysis /
  * fingerprinting operators (SURVEY.md §7 extensions).
  *
  * Every primitive has TWO forms generated from the SAME constants:
  *   - a Catalyst `Column` (Spark side — stays inside whole-stage
  *     codegen, no UDFs), and
  *   - a DuckDB SQL string (oracle side),
  * so the two engines compute bit-identical integers and the driver's
  * hash-compare can verify the whole chain end-to-end.
  *
  * All hashing is integer arithmetic mod P (1e9+7): products stay under
  * 2^63 (a,h < P ⇒ a*h < ~1e18), so no overflow under ANSI mode.
  */
object TextExprs {

  /** Prime modulus for all polynomial/affine hashing. */
  val P = 1000000007L

  // ---------------------------------------------------------------- tokens

  /** Lowercase, strip non-alphanumerics, whitespace-split, drop empties
    * — as a one-pass native expression (TokenizeExpr; the
    * regexp_replace+split+filter chain it replaces is property-pinned
    * in NativeExprsPropSpec and remains the oracle-side form). */
  def tokensCol(text: Column): Column = NativeExprs.tokenize(text)

  def tokensSql(e: String): String =
    s"list_filter(regexp_split_to_array(trim(regexp_replace(lower($e), '[^a-z0-9]+', ' ', 'g')), ' '), t -> t != '')"

  // ------------------------------------------------- polynomial string hash

  /** Left-fold polynomial rolling hash over code points:
    * h = fold(chars, 0, (acc, c) => (acc*31 + codepoint(c)) mod P).
    * Native codegen expression (PolyHashExpr) — the HOF `aggregate`
    * form of the same fold runs interpreted and was the bench
    * bottleneck. */
  def polyHashCol(s: Column): Column = NativeExprs.polyHash(s)

  def polyHashSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(list_filter(string_split_regex($e, ''), c -> c != ''), " +
      s"c -> CAST(unicode(c) AS BIGINT))), (acc, x) -> (acc * 31 + x) % $P)"

  // ------------------------------------------------------------- w-shingles

  /** Number of words per shingle. */
  val ShingleW = 3

  /** Distinct w-word shingles of a token array (empty if < w tokens). */
  def shinglesCol(tk: Column): Column =
    when(size(tk) >= ShingleW,
      array_distinct(transform(
        sequence(lit(0), size(tk) - ShingleW),
        i => concat_ws(" ",
          element_at(tk, i + 1), element_at(tk, i + 2), element_at(tk, i + 3)))))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(t: String): String =
    s"CASE WHEN len($t) >= $ShingleW THEN list_distinct(list_transform(" +
      s"range(1, len($t) - ${ShingleW - 2}), " +
      s"i -> concat(($t)[i], ' ', ($t)[i+1], ' ', ($t)[i+2]))) " +
      s"ELSE CAST([] AS VARCHAR[]) END"

  // ------------------------------------------------------ MinHash constants

  /** Signature length / LSH banding shape: K = Bands * R. */
  val MinhashK = 32
  val Bands    = 8
  val R        = 4

  /** splitmix64 finalizer — the per-i mixer for the coefficient family.
    * A STRONG mixer is load-bearing here, not taste: the previous
    * family set a_i/b_i LINEAR in i, so each element's K hash values
    * lay on one line i·s(x)+t(x) mod P — an element whose slope and
    * intercept both landed small won the min at almost every position,
    * masking every other difference of its set (observed at the 100×
    * scale protocol: a Jaccard-0.92 pair with 7/32 agreement, dropped
    * by the tier-1 cut). Mixing i through splitmix64 destroys that
    * cross-position correlation. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic affine-hash coefficients h_i(x) = (a_i*x + b_i) mod P
    * (seeded constants, reproducible; a_i ∈ [1, P−1], b_i ∈ [0, P−1]). */
  val minhashA: Seq[Long] =
    (1 to MinhashK).map(i => java.lang.Math.floorMod(mix64(i), P - 1) + 1)
  val minhashB: Seq[Long] =
    (1 to MinhashK).map(i => java.lang.Math.floorMod(mix64(i + 7919L), P))

  /** MinHash signature as array<long> over a column of shingle hashes
    * (native codegen expression; see [[NativeExprs]]). */
  def minhashSigCol(hs: Column): Column =
    NativeExprs.minhashSig(hs, minhashA, minhashB, P)

  def minhashSigSql(hs: String): String = {
    val pairs = minhashA.zip(minhashB)
      .map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    s"list_transform($pairs, p -> list_min(list_transform($hs, h -> (p[1]*h + p[2]) % $P)))"
  }

  /** Band key of band b (0-based) = fold over sig[b*R .. b*R+R-1]. */
  def bandKeyCol(sig: Column, b: Column): Column =
    aggregate(
      slice(sig, b * R + 1, lit(R)),
      lit(0L),
      (acc, x) => (acc * lit(31L) + x) % lit(P))

  def bandKeySql(sig: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), ($sig)[($b)*$R+1 : ($b)*$R+$R]), " +
      s"(acc, x) -> (acc * 31 + x) % $P)"
}

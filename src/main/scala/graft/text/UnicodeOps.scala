package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.functions.TextExprs._
import graft.functions.NativeExprs

/** Unicode NFC normalization for fingerprint-safe dedup (q151) — the
  * encoding-repair stage a real web corpus needs before any
  * fingerprint/tokenize pass: composed (U+00E9) and decomposed
  * (`e` + U+0301) spellings of the same text render identically but
  * are byte-distinct, so without normalization two such twins dedup
  * as DIFFERENT documents (every hash in the q06/q21/q73 family sees
  * different bytes). [[NativeExprs.normalizeNfc]] is the codegen'd
  * canonical-composition expression (JDK `java.text.Normalizer`,
  * ICU-free, identity fast path for ASCII/already-composed text);
  * DuckDB's independent `nfc_normalize` is the oracle twin.
  *
  * Corpus convention (the generator family): the testdata text is
  * pure ASCII — NFC-invariant by construction — so the composed/
  * decomposed variance a real corpus carries is injected
  * deterministically: odd documents append a DECOMPOSED marker
  * (`cafe` + U+0301, `mu` + U+0308 + `nchen`), even documents the
  * composed spelling of the SAME rendered text. Both engines build
  * the same augmented string; the query emits pre- and post-NFC
  * fingerprints. A green hash certifies the two normalizers agree
  * code-point-exactly on every document, `changed` marks exactly the
  * decomposed rows, and the composed/decomposed twins collapse to one
  * `nfc_fp` (UnicodeSpec pins the planted-twin collapse; at corpus
  * scale the same column feeds the q06-family exact-dedup keys).
  *
  * Scale shape: one narrow codegen'd map — no shuffle, no UDF; the
  * NFC pass adds a per-row string scan only on rows that need it. */
object UnicodeOps {

  /** Composed marker and its decomposed spelling (same rendered text:
    * " café münchen"). */
  val ComposedMarker = " caf\u00e9 m\u00fcnchen"
  val DecomposedMarker = " cafe\u0301 mu\u0308nchen"

  def nfcNormalize(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 2 === 1, DecomposedMarker)
            .otherwise(ComposedMarker)).as("aug"))
      .select(col("doc_id"), col("aug"),
        NativeExprs.normalizeNfc(col("aug")).as("nfc"))
      .select(col("doc_id"),
        length(col("aug")).cast("long").as("raw_len"),
        length(col("nfc")).cast("long").as("nfc_len"),
        polyHashCol(col("aug")).as("raw_fp"),
        polyHashCol(col("nfc")).as("nfc_fp"),
        (col("aug") =!= col("nfc")).as("changed"))

  // ------------------------------------------------- mojibake repair

  /** Genuine accented text and its classic double-encoding corruption
    * (UTF-8 bytes mis-decoded as Latin-1: é → Ã©). */
  val CleanAccent = " r\u00e9sum\u00e9 caf\u00e9"
  val MojibakeAccent = " r\u00c3\u00a9sum\u00c3\u00a9 caf\u00c3\u00a9"

  /** Mojibake repair (q154) — the encoding-repair stage between raw
    * crawl bytes and fingerprinting: a corrupted and a clean copy of
    * the same page must dedup together, and corrupted text poisons
    * tokenization/lang-id long before dedup.
    * [[NativeExprs.mojibakeRepair]] genuinely re-interprets char codes
    * as bytes and strictly re-decodes as UTF-8 (repair fires only when
    * that decode is valid and shrinking — plain ASCII and genuine
    * Latin-1 prose pass through untouched; the spec pins both
    * non-firing cases). Corpus convention: doc_id % 3 routes each doc
    * to no marker / a CLEAN accented marker (must survive unchanged —
    * the false-positive trap: its bytes are NOT valid UTF-8) / the
    * MOJIBAKE form of the same marker (must repair to the clean one).
    * The oracle re-derives the repaired string arithmetically — a
    * green hash certifies the repair lands exactly on the clean text
    * and never fires elsewhere. Narrow codegen'd map, zero shuffle. */
  def mojibakeRepair(spark: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(spark, dir))
      .select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 1, CleanAccent)
            .when(col("doc_id") % 3 === 2, MojibakeAccent)
            .otherwise("")).as("aug"))
      .select(col("doc_id"), col("aug"),
        NativeExprs.mojibakeRepair(col("aug")).as("fixed"))
      .select(col("doc_id"),
        length(col("aug")).cast("long").as("raw_len"),
        length(col("fixed")).cast("long").as("fixed_len"),
        polyHashCol(col("fixed")).as("fixed_fp"),
        (col("aug") =!= col("fixed")).as("repaired"))

  /** Oracle: the corruption and its expected repair are both
    * closed-form, so the oracle builds the REPAIRED string directly
    * (clean marker for both marked classes) — it never decodes. */
  val mojibakeRepairSql: String = {
    val clean = "' r' || chr(233) || 'sum' || chr(233) || ' caf' || chr(233)"
    val moji = "' r' || chr(195) || chr(169) || 'sum' || chr(195) || chr(169)" +
      " || ' caf' || chr(195) || chr(169)"
    s"""WITH a AS (
       |  SELECT doc_id,
       |         text || CASE doc_id % 3 WHEN 1 THEN $clean
       |                                 WHEN 2 THEN $moji ELSE '' END AS aug,
       |         text || CASE WHEN doc_id % 3 = 0 THEN '' ELSE $clean END AS fixed
       |  FROM documents)
       |SELECT doc_id,
       |       CAST(length(aug) AS BIGINT) AS raw_len,
       |       CAST(length(fixed) AS BIGINT) AS fixed_len,
       |       ${polyHashSql("fixed")} AS fixed_fp,
       |       aug != fixed AS repaired
       |FROM a""".stripMargin
  }

  /** Oracle: the same augmentation arithmetic through DuckDB's own
    * NFC implementation — two independent normalizers must agree
    * code-point-exactly on every row. */
  val nfcNormalizeSql: String =
    s"""WITH aug AS (
       |  SELECT doc_id,
       |         text || CASE WHEN doc_id % 2 = 1
       |                      THEN ' cafe' || chr(769) || ' mu' || chr(776) || 'nchen'
       |                      ELSE ' caf' || chr(233) || ' m' || chr(252) || 'nchen'
       |                 END AS aug
       |  FROM documents),
       |n AS (SELECT doc_id, aug, nfc_normalize(aug) AS nfc FROM aug)
       |SELECT doc_id,
       |       CAST(length(aug) AS BIGINT) AS raw_len,
       |       CAST(length(nfc) AS BIGINT) AS nfc_len,
       |       ${polyHashSql("aug")} AS raw_fp,
       |       ${polyHashSql("nfc")} AS nfc_fp,
       |       aug != nfc AS changed
       |FROM n""".stripMargin
}

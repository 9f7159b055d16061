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

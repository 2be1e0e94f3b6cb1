package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pseudonymization + pattern masking — the privacy pass a training-data
  * pipeline runs before identifiers may leave the trusted zone.
  *
  * PSEUDONYMS are keyed hashes: `md5(salt || value)`. Deterministic given
  * the salt, so the same entity maps to the same surrogate in EVERY table
  * and referential integrity (joins, groupBys, graph edges) survives the
  * rewrite; without the salt the surrogate is not invertible by
  * enumeration of the key space. Pure column algebra — no shuffle, no UDF,
  * applied at the scan on each table independently, which is what makes it
  * viable across a 100 TB corpus: there is no global mapping table to
  * build, broadcast, or keep consistent.
  *
  * MASKING rewrites matches of a regex inside free text (digit runs,
  * id-like tokens) with a fixed placeholder via `regexp_replace` —
  * codegen, scan-side, order-preserving. Patterns should stick to the
  * RE2/Java-common subset (character classes, bounded repetition) so the
  * same pattern means the same thing in the oracle engine.
  */
object Anonymize {

  /** Keyed deterministic surrogate for any key column (cast to its
    * canonical string form first, so `1` and `"1"` pseudonymize alike). */
  def pseudonym(key: Column, salt: String): Column =
    md5(concat(lit(salt), key.cast("string")))

  /** Replace each of `keyCols` with its pseudonym in place (same column
    * name, string type). Non-key columns pass through untouched. */
  def pseudonymizeKeys(df: DataFrame, keyCols: Seq[String], salt: String): DataFrame =
    keyCols.foldLeft(df)((d, c) => d.withColumn(c, pseudonym(col(c), salt)))

  /** Mask every match of `pattern` in `text` with `replacement`. */
  def mask(text: Column, pattern: String, replacement: String): Column =
    regexp_replace(text, pattern, replacement)

  /** Digit-run masking — the common "no raw numeric ids in text" rule. */
  def maskNumbers(text: Column, replacement: String = "<ID>"): Column =
    mask(text, "[0-9]+", replacement)
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regex scrubbing (PII redaction and policy cleanup) over a text column
  * — the compliance pass every training corpus runs before anything else
  * touches it: emails, phone numbers, credential-shaped strings, or any
  * site-specific pattern replaced by a typed placeholder, with per-
  * pattern match counts kept as the audit trail.
  *
  * Patterns apply IN ORDER, each seeing the previous pattern's output
  * (so a broad pattern listed first can shadow a narrow one listed
  * later — list narrow-to-broad, the same discipline as firewall rules).
  * Per-pattern counts are measured on the text AS THAT PATTERN SAW IT.
  * The whole chain is a single Catalyst projection — `regexp_extract_all`
  * + `regexp_replace` are codegen'd built-ins, so the scrub rides inside
  * whole-stage codegen next to the scan with zero extra passes and zero
  * shuffles: at 100 TB this is embarrassingly parallel map work, and the
  * per-pattern counts aggregate map-side if the caller rolls them up.
  *
  * Pattern syntax: keep to the RE2-compatible subset (character classes,
  * alternation, bounded repetition, `\b`) — Spark executes java.util.regex
  * and the DuckDB oracle RE2; backreferences or lookaround would diverge.
  * Null text yields null clean text and null counts (null is not a
  * document), matching SQL semantics end-to-end.
  *
  * The reference has no text surface at all (it computes on numeric/id
  * frames only); this is a beyond-reference training-pipeline operator,
  * the redaction sibling of the quality filters in [[GopherRules]].
  *
  * Output: (id, n_<name> per pattern in order, text_clean).
  */
object Redact {

  /** name must be a valid column suffix; regex/replacement as documented. */
  final case class Pattern(name: String, regex: String, replacement: String)

  def scrub(df: DataFrame, idCol: String, textCol: String,
      patterns: Seq[Pattern]): DataFrame = {
    require(patterns.nonEmpty, "scrub needs at least one pattern")
    require(patterns.map(_.name).distinct.size == patterns.size,
      s"duplicate pattern names: ${patterns.map(_.name)}")
    patterns.foreach { p =>
      require(p.name.matches("[a-z][a-z0-9_]*"),
        s"pattern name '${p.name}' must be snake_case ([a-z][a-z0-9_]*)")
    }
    // fold the chain inside one projection: each step's count looks at
    // the running text, then rewrites it
    val init: (Column, Seq[Column]) = (col(textCol), Seq.empty[Column])
    val (cleaned, counts) = patterns.foldLeft(init) {
      case ((text, acc), p) =>
        val cnt = size(regexp_extract_all(text, lit(p.regex), lit(0)))
          .cast("long").as(s"n_${p.name}")
        (regexp_replace(text, p.regex, p.replacement), acc :+ cnt)
    }
    df.select(col(idCol) +: counts :+ cleaned.as("text_clean"): _*)
  }
}

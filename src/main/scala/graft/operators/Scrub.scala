package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing: regex redaction of the machine-recognizable identifier
  * shapes (emails, IPv4 addresses, long digit runs — the credit-card /
  * account-number shape) that LLM training corpora drop before
  * tokenization. Pure scan-local column rewrites — zero shuffle at any
  * scale; the patterns are deliberately restricted to a dialect-portable
  * subset (character classes, bounded repetition, word boundaries — no
  * lookaround, no backreferences) so Java regex and RE2 engines agree and
  * the redaction is oracle-checkable (q87).
  *
  * Order matters and is part of the contract: IPv4 before digit runs, so
  * an address is one `<IP>`, not four `<NUM>` fragments.
  */
object Scrub {

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val DigitRunPattern = "\\b\\d{13,16}\\b"

  /** The scrubbed text column: emails → `<EMAIL>`, IPv4 → `<IP>`,
    * 13–16-digit runs → `<NUM>`.
    */
  def scrubbed(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      DigitRunPattern, "<NUM>")

  /** Scrub `textCol` in place, adding a `pii_hits` count so downstream
    * quality filters can drop documents that were mostly identifiers. The
    * count is computed on the SAME pass shape — two scan-local
    * expressions per row, no shuffle.
    *
    * Counting semantics: each pattern is counted INDEPENDENTLY on the
    * original text, so a token matched by two patterns (an IPv4 inside an
    * email local-part) counts twice even though sequential replacement
    * redacts it once — `pii_hits` is "pattern matches found", an upper
    * bound on redactions, not an exact redaction count. The q87 oracle
    * replicates the same counting.
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val hits =
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))) +
        size(regexp_extract_all(col(textCol), lit(Ipv4Pattern), lit(0))) +
        size(regexp_extract_all(col(textCol), lit(DigitRunPattern), lit(0)))
    df.withColumn("pii_hits", hits)
      .withColumn(textCol, scrubbed(col(textCol)))
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII scrubbing for training corpora: mask emails and IPv4 literals with
 * fixed placeholder tokens before text ships to tokenization (the
 * standard pre-release step for web-scale corpora — published pipelines
 * mask exactly these two classes because they are regular enough to hit
 * with near-zero false positives at 10^12-doc scale).
 *
 * Pure per-row Catalyst expressions (`regexp_replace`/`regexp_count`,
 * both codegen'd) — embarrassingly parallel, no shuffle, no UDF. The
 * patterns deliberately use only syntax with identical semantics in
 * java.util.regex and RE2-style engines (character classes, bounded
 * repetition, non-capturing groups, ASCII `\b`/`\d`) so the DuckDB
 * oracle (q_pii_mask) re-derives the masking byte-identically; no
 * backreferences or lookaround.
 *
 * Masking order is fixed (emails first, then IPv4) and counts are taken
 * on the ORIGINAL text, so the operator is deterministic and the
 * diagnostics do not depend on replacement side effects. The reference
 * pipeline has no PII stage (its output is a private mirror); this
 * operator is part of the training-data family the engine adds on top
 * (SURVEY §2 addenda, alongside dedup/quality/lang-ID).
 */
object Privacy {

  /** Local-part chars per RFC-practical usage; TLD requires ≥2 letters so
    * bare `user@host` and version strings like `v1@2.3` do not match. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad with word boundaries; 1-3 digit octets (no range check —
    * `999.999.999.999` masks too, the cheap-and-safe choice for a
    * scrubber where over-masking beats leaking). */
  val Ipv4Pattern: String = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))

  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** Emails first, then IPv4 (an email's host part cannot contain a full
    * dotted quad once the email is collapsed to the token, so the order
    * only matters for determinism, which is why it is pinned). */
  def maskPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, EmailToken),
      Ipv4Pattern, IpToken)
}

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

  /** US SSN shape with dashes — the dashes keep false positives near
    * zero (bare 9-digit runs are usually ids); disjoint from IPv4 (dots)
    * and from card groups (a 3-digit run inside 4-digit groups has no
    * word boundary). */
  val SsnPattern: String = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** 16-digit card number in SEPARATED 4-4-4-4 form only — the grouped
    * form is the near-zero-FP shape; bare 16-digit runs (which would
    * need a Luhn check to mask safely) deliberately do not match. */
  val CcardPattern: String = "\\b\\d{4}[ -]\\d{4}[ -]\\d{4}[ -]\\d{4}\\b"

  /** International phone in +CC form: the leading `+` is the
    * disambiguator (plain digit runs never match), then 3 groups with
    * optional space/dash separators — ≥8 digits after the country code
    * in practice. Leftmost-first with plain greedy quantifiers: Java and
    * RE2 agree by construction. */
  val PhonePattern: String =
    "\\+\\d{1,3}[ -]?\\d{2,4}[ -]?\\d{3,4}[ -]?\\d{3,4}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val SsnToken = "<SSN>"
  val CcardToken = "<CARD>"
  val PhoneToken = "<PHONE>"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailPattern))

  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  def ssnCount(text: Column): Column = regexp_count(text, lit(SsnPattern))

  def ccardCount(text: Column): Column = regexp_count(text, lit(CcardPattern))

  def phoneCount(text: Column): Column = regexp_count(text, lit(PhonePattern))

  /** Fixed masking order — emails, IPv4, SSN, card, phone — pinned for
    * determinism (the classes are pairwise disjoint on well-formed text:
    * `+` leads only phones, dots only IPs/emails, the dash/group shapes
    * cannot overlap across a word boundary). Counts are taken on the
    * ORIGINAL text, so diagnostics never depend on replacement order. */
  def maskPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(regexp_replace(text, EmailPattern, EmailToken),
            Ipv4Pattern, IpToken),
          SsnPattern, SsnToken),
        CcardPattern, CcardToken),
      PhonePattern, PhoneToken)
}

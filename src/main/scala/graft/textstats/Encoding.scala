package graft.textstats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Encoding-damage detection for web corpora — the quality gate that
 * catches text whose BYTES survived the crawl but whose CHARACTERS did
 * not: lossy transcoding (U+FFFD replacement chars), double-decoding
 * mojibake (UTF-8 bytes re-read as Latin-1, the `Ã©`/`â` + C1-tail
 * signatures), and stray C1 control characters (U+0080–U+009F, which no
 * sane HTML emits and which are the Latin-1 shadow of UTF-8 continuation
 * bytes). Published pipelines drop or re-decode such documents; leaving
 * them in teaches a tokenizer garbage codepoints.
 *
 * Pure per-row codegen'd `regexp_count` expressions, no shuffle, no UDF
 * (the Privacy precedent). Patterns stick to the RE2∩java.util.regex
 * subset — `\x{...}` classes only, and the alternation's branches start
 * with DISJOINT characters (C2/C3 vs E2) so leftmost-first (Java) and
 * leftmost-longest (RE2) matching cannot diverge; the DuckDB oracle runs
 * the IDENTICAL pattern strings.
 *
 * The suspect flag is an exact integer cross-multiplication
 * (damage events·200 > chars, i.e. >0.5% of codepoints start a damage
 * match) — no float ratio, no ANSI division hazard on empty text.
 */
object Encoding {

  /** The Unicode replacement character a lossy decode leaves behind. */
  val ReplacementPattern: String = "\\x{FFFD}"

  /** C1 controls — never legitimate in text; each is one Latin-1-decoded
    * UTF-8 continuation byte. */
  val C1Pattern: String = "[\\x{0080}-\\x{009F}]"

  /** Latin-1-decoded UTF-8 lead bytes with their continuation tails:
    * 2-byte sequences surface as Ã/Â + one tail char, 3-byte (the E2
    * punctuation block: curly quotes, dashes, ellipsis) as â + two. */
  val MojibakePattern: String =
    "[\\x{00C2}\\x{00C3}][\\x{0080}-\\x{00BF}]|\\x{00E2}[\\x{0080}-\\x{00BF}]{2}"

  def replacementCount(text: Column): Column =
    regexp_count(coalesce(text, lit("")), lit(ReplacementPattern)).cast("long")

  def c1Count(text: Column): Column =
    regexp_count(coalesce(text, lit("")), lit(C1Pattern)).cast("long")

  def mojibakeCount(text: Column): Column =
    regexp_count(coalesce(text, lit("")), lit(MojibakePattern)).cast("long")

  /** Per-doc damage report: (idCol, n_replacement, n_c1, n_moji,
    * enc_suspect). Flag: damaged codepoints exceed 0.5% of the text —
    * exact integers, cross-multiplied. */
  def encodingQuality(df: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    val text = col(textCol)
    df.select(col(idCol),
        replacementCount(text).as("n_replacement"),
        c1Count(text).as("n_c1"),
        mojibakeCount(text).as("n_moji"),
        length(coalesce(text, lit(""))).cast("long").as("__len"))
      .withColumn("enc_suspect",
        (col("n_replacement") + col("n_c1") + col("n_moji")) * lit(200L) >
          col("__len"))
      .drop("__len")
  }
}

package graft.pipeline

import java.sql.Timestamp

/** Input row — authoritative shape from BASELINE.json `input_hint`:
  * Iceberg/parquet table of Common-Crawl-style pages. */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String, // oracle column in fixtures; null at bench scale
    lang: String)

/** docs_clean output row (FIXTURES.md §3). `text` carries the byte-identity
  * contract; `content_kind` ∈ {html, xml, text, pdf}; failures isolated
  * per-row (SURVEY §2.10 circuit-breaker mapping). */
final case class DocClean(
    url: String,
    warc_ts: Timestamp,
    text: String,
    cleaned_html: String,
    content_sha256: String,
    size: Long,
    content_kind: String,
    url_bucket: Int,
    parse_failed: Boolean,
    failure_reason: String,
    failure_class: String)

/** doc_meta sidecar row (SURVEY §2.3 metadata struct, extracted pre-clean). */
final case class DocMetaRow(
    url: String,
    warc_ts: Timestamp,
    title: String,
    description: String,
    keywords: String,
    last_modified_iso: String,
    authors: Seq[String],
    og: Map[String, String],
    structured_data: Seq[graft.meta.StructuredEntry],
    canonical: String,
    lang: String)

/** Per-page link edge (nested in docs_clean; src_url/url_bucket are row
  * constants and are re-attached relationally when deriving the links
  * table — keeps the typed-map encode narrow). */
final case class LinkEdge(
    dst_url: String,
    kind: String,
    src_tag: String,
    anchor: String,
    is_internal: Boolean)

/** Per-page anchor ids (anchor-existence join, SURVEY §2.4). */
final case class AnchorRow(url: String, anchor_id: String)

/** Everything the per-row extractor emits (one pass over the page). */
final case class ExtractedPage(
    doc: DocClean,
    meta: DocMetaRow,
    links: Seq[LinkEdge],
    anchors: Seq[String])

/** Checkpoint ledger row — per-partition lineage (north_rule). */
final case class ProgressRow(
    run_id: String,
    url_bucket: Int,
    status: String,
    docs: Long,
    completed_seq: Long)

/** Extraction metrics sidecar (north_rule: docs parsed, bytes stripped,
  * parse failures per partition). */
final case class MetricsRow(
    run_id: String,
    url_bucket: Int,
    docs_parsed: Long,
    parse_failures: Long,
    input_bytes: Long,
    output_chars: Long,
    bytes_stripped: Long)

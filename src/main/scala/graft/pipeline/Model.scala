package graft.pipeline

import java.sql.Timestamp

/** Input page row — schema fixed by BASELINE.json input_hint:
  * (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

final case class SpanRow(start: Int, end: Int, path: String)

/** Extraction result row (FIXTURES.md §2). */
final case class ExtractedDoc(
    url: String,
    text: String,
    spans: Seq[SpanRow],
    char_count: Int,
    node_count: Int,
    detected_charset: String,
    errors: Seq[String],
    ok: Boolean)

/** Per-(epoch,bucket) metrics/lineage row — the checkpoint unit. */
final case class BucketMetrics(
    epoch: Int,
    bucket: Int,
    buckets: Int, // the epoch's bucket COUNT: resume must not mix layouts
    rows: Long,
    ok: Long,
    failed: Long,
    char_sum: Long,
    parse_errors: Long,
    dur_ms: Long,
    finished_at: Timestamp)

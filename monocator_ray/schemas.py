"""Declared Arrow schemas for every logical table (SURVEY.md §1.2).

The reference's data model is fixed entity classes persisted one-table-per-
entity to DuckDB (reference: /root/reference/src/TODO.MD:44-51,
/root/reference/.gitignore:40-41).  Our rendering is one explicit
pyarrow.Schema per logical table, asserted at stage boundaries.

The `pages` shape is normative per BASELINE.json input_hint:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
"""

from __future__ import annotations

import pyarrow as pa

# The central input/output table — exact SPEC shape, do not deviate.
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# Frontier rows (URLs waiting to be fetched).
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("discovery_time", pa.int64()),
        ("parent_url_hash", pa.uint64()),
        ("epoch", pa.int32()),
    ]
)

# Crawl order artifact — the SPEC exact-match object.
VISIT_LOG = pa.schema(
    [
        ("seq", pa.int64()),
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("depth", pa.int32()),
        ("host_hash", pa.uint64()),
        ("discovery_time", pa.int64()),
        ("fetch_status", pa.int32()),
        ("epoch", pa.int32()),
        ("shard_id", pa.int32()),
    ]
)

# Seen-set checkpoint dump.
SEEN = pa.schema(
    [
        ("url_hash", pa.uint64()),
        ("shard_id", pa.int32()),
        ("epoch", pa.int32()),
    ]
)

ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("fetched_ts", pa.timestamp("us")),
        ("crawl_delay_ms", pa.int64()),
        ("disallow", pa.list_(pa.string())),
        ("allow", pa.list_(pa.string())),
    ]
)

# Per-partition lineage records (SPEC: "frontier epoch, shard id, fetch counts").
LINEAGE = pa.schema(
    [
        ("epoch", pa.int32()),
        ("shard_id", pa.int32()),
        ("partition_id", pa.int32()),
        ("urls_in", pa.int64()),
        ("fetched", pa.int64()),
        ("errors", pa.int64()),
        ("new_urls", pa.int64()),
        ("dedup_dropped", pa.int64()),
        ("wall_ms", pa.int64()),
        # epoch-level phase decomposition, recorded on shard 0's row (like
        # errors): driver-side peek/pop/process/offer plus worker-pool
        # fetch/extract/write/link wall-time sums
        ("peek_ms", pa.int64()),
        ("pop_ms", pa.int64()),
        ("process_ms", pa.int64()),
        ("offer_ms", pa.int64()),
        ("fetch_ms", pa.int64()),
        ("extract_ms", pa.int64()),
        ("write_ms", pa.int64()),
        ("link_ms", pa.int64()),
    ]
)

# Per-page extraction output beyond text (title, meta, link counts, vat, hash).
FEATURES = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("title", pa.string()),
        ("meta_description", pa.string()),
        ("links_internal", pa.int32()),
        ("links_external", pa.int32()),
        ("vat_numbers", pa.list_(pa.string())),
        ("html_sha256", pa.binary()),
        ("noindex", pa.bool_()),  # <meta name="robots"> noindex/none
        ("canonical_url", pa.string()),  # resolved <link rel=canonical> ("" if none)
    ]
)

# VisitRequest config surface, mirroring /root/reference/src/TODO.MD:56-77.
VISIT_REQUESTS = pa.schema(
    [
        ("domain", pa.string()),
        ("web_enabled", pa.bool_()),
        ("web_max_pages", pa.int32()),
        ("vat_enabled", pa.bool_()),
        ("dns_enabled", pa.bool_()),
        ("tls_enabled", pa.bool_()),
        ("smtp_enabled", pa.bool_()),
        ("screenshot_mode", pa.string()),
    ]
)

SCREENSHOT_MODES = (
    "always",
    "if_single_page_app",
    "if_html_changed",
    "if_developed",
    "if_suspicious",
)

# Screenshot entity (reference `screenshot` module save flow,
# /root/reference/src/TODO.MD:62-67).  No browser exists in this
# container, so `png` is a DETERMINISTIC RENDER DIGEST — a layout
# rasterization of the page's visible text and link structure (see
# report.capture_screenshots) — not a pixel-true browser frame; the
# schema, trigger flow and persistence are the real contract a browser
# renderer would drop into.
SCREENSHOT = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("mode", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("png", pa.binary()),
        ("digest_sha256", pa.binary()),
    ]
)


def assert_schema(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Stage-boundary schema assertion (cheap: names + types only)."""
    if table.schema.names != schema.names:
        raise ValueError(
            f"schema mismatch{' at ' + where if where else ''}: "
            f"names {table.schema.names} != {schema.names}"
        )
    for field in schema:
        have = table.schema.field(field.name).type
        if have != field.type:
            raise ValueError(
                f"schema mismatch{' at ' + where if where else ''}: "
                f"column {field.name}: {have} != {field.type}"
            )
    return table

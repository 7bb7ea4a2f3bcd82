"""Query registry: name -> (ray callable, oracle SQL | None).

The driver runs each Ray pipeline AND its DuckDB oracle side-by-side at
sf=0.01 and compares row-count + schema + order-insensitive value hash, so:
* every computed column is NAMED IDENTICALLY in both,
* money/value aggregates are integer cents (CAST(ROUND(x*100) AS BIGINT)) —
  float sums are order-dependent and would hash-mismatch,
* sketch/hash-based ops (minhash, simhash, ANN, fingerprints, crawl) have no
  SQL equivalent -> oracle omitted, driver records a rows-only check.
"""

from __future__ import annotations

from monocator_ray.pipelines import docs as D
from monocator_ray.pipelines import graph as G
from monocator_ray.pipelines import relational as R


_CRAWLED_THIS_PROCESS = False


def q_crawl_flagship(sf_dir: str):
    """Flagship crawl (rows-only): deterministic synthetic web -> epoch crawl
    -> visit_log.  sf_dir only keys the cache dir (the crawl input is the
    SPEC pages table, synthesized — TESTDATA tables are not pages).

    The crawl runs once per PROCESS (five registry queries read its
    artifacts; the crawl is deterministic, so re-running it in the same
    session only re-pays its wall time).  The cache is deliberately NOT
    on-disk — a fresh process always recrawls, so stale artifacts can
    never mask a code change — and the out dir is keyed by PID so a
    concurrent process (bench beside pytest) can never clobber the
    artifacts this process's cached reads point at."""
    import os

    from monocator_ray.crawl.driver import CrawlConfig, crawl, read_visit_log
    from monocator_ray.sources.synth import SynthSpec, write_synth_pages
    from monocator_ray.state.robots import synth_robots

    global _CRAWLED_THIS_PROCESS
    total, hosts, buckets = 600, 20, 8
    web = "/tmp/monocator_q_crawl_web"
    out = f"/tmp/monocator_q_crawl_out_{os.getpid()}"
    if not _CRAWLED_THIS_PROCESS:
        # hygiene: PID-keyed dirs accumulate across processes; reap ones
        # idle > 2 h (age guard keeps live concurrent sessions safe)
        import shutil
        import time as _time

        for d in os.listdir("/tmp"):
            p = os.path.join("/tmp", d)
            if (d.startswith("monocator_q_crawl_out_") and p != out):
                try:
                    # never reap a LIVE process's dir, however idle — a
                    # >2h-old session's cached reads still point at it
                    # (ADVICE r2 #4)
                    pid = int(d.rsplit("_", 1)[-1])
                    try:
                        os.kill(pid, 0)
                        continue  # owner alive
                    except ProcessLookupError:
                        pass
                    except PermissionError:
                        continue  # alive, owned by someone else
                    if _time.time() - os.path.getmtime(p) > 7200:
                        shutil.rmtree(p, ignore_errors=True)
                except (OSError, ValueError):
                    pass
    if _CRAWLED_THIS_PROCESS:
        return read_visit_log(out)
    if not os.path.isdir(web):
        write_synth_pages(web, total, hosts, buckets, use_ray=False)
    spec = SynthSpec(total, hosts)
    cfg = CrawlConfig(num_shards=4, budget_per_epoch=128, max_depth=4, link_cap=16,
                      num_buckets=buckets, fetch_concurrency=2, extract_concurrency=2)
    crawl(spec.seeds(10), web, out, cfg, robots=synth_robots(hosts))
    _CRAWLED_THIS_PROCESS = True
    return read_visit_log(out)


def q_domain_rollup_crawl(sf_dir: str):
    """G5 per-domain rollup over the flagship crawl's artifacts (rows-only)."""
    from monocator_ray import report

    q_crawl_flagship(sf_dir)  # ensure artifacts exist
    import os

    return report.domain_rollup(f"/tmp/monocator_q_crawl_out_{os.getpid()}")


def q_anchor_texts(sf_dir: str):
    """Inbound anchor-text aggregation over the flagship crawl's pages
    (rows-only: HTML parsing has no SQL analog; semantics pinned by
    tests/test_report_and_ext.py on planted anchors)."""
    from monocator_ray import report

    q_crawl_flagship(sf_dir)  # ensure artifacts exist
    import os

    return report.anchor_texts(f"/tmp/monocator_q_crawl_out_{os.getpid()}")


def q_host_pagerank(sf_dir: str):
    """Host-level PageRank over the flagship crawl's web (rows-only;
    pinned by a driver-recompute equivalence test)."""
    from monocator_ray.pipelines.graph import host_pagerank

    q_crawl_flagship(sf_dir)  # ensure artifacts exist
    import os

    return host_pagerank(f"/tmp/monocator_q_crawl_out_{os.getpid()}")


def q_crawl_corpus(sf_dir: str):
    """Crawl→corpus bridge (rows-only): the flagship crawl's extracted-page
    artifact fed straight into the training-data curation pipeline
    (langid -> token gate -> exact first-wins dedup -> per-language
    balance) — the end-to-end "web to training corpus" composition the
    engine exists for.  doc_id is the 64-bit url hash (int64 view), the
    same identity the crawl used."""
    import os

    import numpy as np
    import pyarrow as pa

    from monocator_ray import report
    from monocator_ray.hashing import hash_str64
    from monocator_ray.pipelines.docs import curate_dataset

    q_crawl_flagship(sf_dir)  # ensure artifacts exist
    pages = report._read_artifact(f"/tmp/monocator_q_crawl_out_{os.getpid()}", "pages")

    def to_docs(t: pa.Table) -> pa.Table:
        ids = hash_str64(t["url"].to_pylist()).view(np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": t["text"]})

    from monocator_ray.report import drop_noindex

    docs = drop_noindex(
        pages.map_batches(to_docs, batch_format="pyarrow"),
        f"/tmp/monocator_q_crawl_out_{os.getpid()}",
    )
    return curate_dataset(docs, min_tokens=10)

def q_screenshot_digests(sf_dir: str):
    """Screenshot save flow end-to-end over the flagship crawl (rows-only):
    always-mode triggers -> deterministic render digest -> PNG -> parquet
    entity; returns (url_hash, mode, width, height, digest hex) sorted by
    hash.  Determinism of the digest is what the driver's stability check
    exercises; pixel-true rendering needs a browser (schemas.SCREENSHOT
    contract)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from monocator_ray import report

    q_crawl_flagship(sf_dir)  # ensure artifacts exist
    out = f"/tmp/monocator_q_crawl_out_{os.getpid()}"
    dest = f"/tmp/monocator_q_shots_{os.getpid()}"
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    report.capture_screenshots(out, "always", dest)
    tbl = pa.concat_tables([
        pq.read_table(os.path.join(dest, f),
                      columns=["url_hash", "mode", "width", "height",
                               "digest_sha256"])
        for f in sorted(os.listdir(dest)) if f.endswith(".parquet")
    ])
    import numpy as np

    uh = tbl["url_hash"].to_numpy(zero_copy_only=False).astype(np.uint64).view(np.int64)
    hexes = [d.hex() for d in tbl["digest_sha256"].to_pylist()]
    out_t = pa.table({
        "url_hash": pa.array(uh, pa.int64()),
        "mode": tbl["mode"],
        "width": tbl["width"],
        "height": tbl["height"],
        "digest": pa.array(hexes, pa.string()),
    })
    return out_t.sort_by("url_hash")


# name -> (callable(sf_dir) -> Dataset|Table|DataFrame, oracle_sql | None)
REGISTRY: dict = {
    # --- relational (SURVEY.md §2.5-2.7) ---
    "pricing_summary": (
        R.q_pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
    ),
    "top_orders": (
        R.q_top_orders,
        """
        SELECT o_orderkey, o_custkey,
               CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents
        FROM orders
        ORDER BY total_cents DESC, o_orderkey
        LIMIT 10
        """,
    ),
    "order_rollup": (
        R.q_order_rollup,
        """
        SELECT o_custkey,
               COUNT(*) AS n_orders,
               MIN(o_orderdate) AS first_order,
               MAX(o_orderdate) AS last_order,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
    ),
    "customer_regions": (
        R.q_customer_regions,
        """
        SELECT r.r_name AS r_name, COUNT(*) AS n_customers,
               CAST(SUM(CAST(ROUND(c.c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """,
    ),
    "customers_without_orders": (
        R.q_customers_without_orders,
        """
        SELECT c_nationkey, COUNT(*) AS n_without_orders
        FROM customer
        WHERE c_custkey NOT IN
          (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY c_nationkey ORDER BY c_nationkey
        """,
    ),
    "returned_items": (
        R.q_returned_items,
        """
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM lineitem
        WHERE l_returnflag = 'R'
          AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
        """,
    ),
    # TPC-H Q5 shape: lineitem pre-agg -> x orders(year) -> x customer ->
    # nation dim broadcast; revenue = exact-integer cents x percent
    "nation_revenue": (
        R.q_nation_revenue,
        """
        WITH rev AS (
          SELECT l_orderkey,
                 SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS r
          FROM lineitem GROUP BY l_orderkey)
        SELECT n_name, CAST(SUM(r) AS BIGINT) AS revenue_cpc
        FROM rev
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE year(o_orderdate) = 1996
        GROUP BY n_name
        ORDER BY revenue_cpc DESC, n_name
        """,
    ),
    "priority_revenue": (
        R.q_priority_revenue,
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_items,
               CAST(SUM(CAST(ROUND(l.l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
        """,
    ),
    "top_part_types": (
        R.q_top_part_types,
        """
        SELECT p_type, COUNT(*) AS n FROM part
        GROUP BY p_type ORDER BY n DESC, p_type LIMIT 5
        """,
    ),
    # bloom-prefiltered semi-join: exact result (verify join removes the
    # false positives), so the plain semi-join SQL is the oracle
    "bloom_semi_join": (
        R.q_bloom_semi_join,
        """
        SELECT l_returnflag, COUNT(*) AS n_items,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
        GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    ),
    "event_stats": (
        R.q_event_stats,
        """
        SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM events GROUP BY event_type ORDER BY event_type
        """,
    ),
    "event_windows": (
        R.q_event_windows,
        """
        SELECT event_type, date_trunc('hour', ts) AS window_start, COUNT(*) AS n
        FROM events GROUP BY event_type, window_start
        ORDER BY event_type, window_start
        """,
    ),
    # FIRST_VALUE / LAST_VALUE window (deterministic event_id tie-break)
    "user_first_last": (
        R.q_user_first_last,
        """
        WITH w AS (
          SELECT user_id,
                 FIRST_VALUE(event_type) OVER win AS first_type,
                 FIRST_VALUE(ts)         OVER win AS first_ts,
                 LAST_VALUE(event_type)  OVER win AS last_type,
                 LAST_VALUE(ts)          OVER win AS last_ts,
                 COUNT(*)                OVER win AS n_events
          FROM events
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING))
        SELECT DISTINCT user_id, first_type, first_ts, last_type, last_ts,
               CAST(n_events AS BIGINT) AS n_events
        FROM w ORDER BY user_id
        """,
    ),
    # gap-filled hourly series (generate_series zero-fill shape)
    "event_windows_filled": (
        R.q_event_windows_filled,
        """
        WITH c AS (
          SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n
          FROM events GROUP BY 1),
        b AS (SELECT MIN(window_start) AS lo, MAX(window_start) AS hi FROM c),
        grid AS (
          SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS window_start
          FROM b)
        SELECT g.window_start, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
        FROM grid g LEFT JOIN c USING (window_start)
        ORDER BY g.window_start
        """,
    ),
    "event_sliding": (
        R.q_event_sliding,
        """
        WITH e AS (
          SELECT event_type, time_bucket(INTERVAL 30 MINUTE, ts) AS window_start FROM events
          UNION ALL
          SELECT event_type, time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM events
        )
        SELECT event_type, window_start, COUNT(*) AS n
        FROM e GROUP BY event_type, window_start
        ORDER BY event_type, window_start
        """,
    ),
    "event_asof_purchase": (
        R.q_event_asof_purchase,
        """
        WITH p AS (
          SELECT user_id, ts, arg_max(value, event_id) AS pvalue
          FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        )
        SELECT e.event_id, CAST(ROUND(p.pvalue*100) AS BIGINT) AS last_purchase_cents
        FROM events e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
        ORDER BY event_id
        """,
    ),
    "event_error_window": (
        R.q_event_error_window,
        """
        SELECT e.event_id, COUNT(x.ts) AS n_errors_5m
        FROM events e LEFT JOIN events x
          ON x.user_id = e.user_id AND x.event_type = 'error'
          AND x.ts > e.ts AND x.ts <= e.ts + INTERVAL 5 MINUTE
        GROUP BY e.event_id ORDER BY e.event_id
        """,
    ),
    "user_sessions": (
        R.q_user_sessions,
        """
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
          FROM events
        )
        SELECT user_id, COUNT(*) AS n_events,
               1 + CAST(SUM(new_session) AS BIGINT) AS n_sessions
        FROM gaps GROUP BY user_id ORDER BY user_id
        """,
    ),
    # native LEFT ANTI join: parts with no bulk (qty >= 45) shipment
    "parts_never_bulk": (
        R.q_parts_never_bulk,
        """
        SELECT p_type, COUNT(*) AS n
        FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
        GROUP BY p_type ORDER BY p_type
        """,
    ),
    # FULL OUTER join: users with high-value clicks vs purchases
    "click_purchase_coverage": (
        R.q_click_purchase_coverage,
        """
        WITH c AS (SELECT user_id, COUNT(*) AS n_clicks FROM events
                   WHERE event_type = 'click' AND value > 200 GROUP BY user_id),
        p AS (SELECT user_id, COUNT(*) AS n_purchases FROM events
              WHERE event_type = 'purchase' AND value > 200 GROUP BY user_id)
        SELECT COALESCE(c.user_id, p.user_id) AS user_id,
               COALESCE(n_clicks, 0) AS n_clicks,
               COALESCE(n_purchases, 0) AS n_purchases
        FROM c FULL OUTER JOIN p ON c.user_id = p.user_id
        ORDER BY user_id
        """,
    ),
    "event_funnel": (
        R.q_event_funnel,
        """
        WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
                   WHERE event_type = 'signup' GROUP BY user_id),
        c AS (SELECT s.user_id,
                     MAX(CASE WHEN e.event_type = 'purchase' AND e.ts > s.signup_ts
                               AND e.ts <= s.signup_ts + INTERVAL 7 DAY
                              THEN 1 ELSE 0 END) AS conv
              FROM s JOIN events e ON e.user_id = s.user_id GROUP BY s.user_id)
        SELECT COUNT(*) AS n_signup_users, CAST(SUM(conv) AS BIGINT) AS n_converted
        FROM c
        """,
    ),
    "user_retention": (
        R.q_user_retention,
        """
        WITH f AS (SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
                   FROM events GROUP BY user_id),
        a AS (SELECT DISTINCT e.user_id, f.cohort_week,
                     CAST(epoch(date_trunc('week', e.ts)) - epoch(f.cohort_week) AS BIGINT)
                       // 604800 AS week_offset
              FROM events e JOIN f USING (user_id))
        SELECT cohort_week, week_offset, COUNT(*) AS n_users
        FROM a GROUP BY cohort_week, week_offset
        ORDER BY cohort_week, week_offset
        """,
    ),
    "props_json": (
        R.q_props_json,
        """
        SELECT CAST(LENGTH(CAST(json_extract(props,'$.k') AS VARCHAR)) AS INTEGER) AS k_bucket,
               COUNT(*) AS n
        FROM events GROUP BY k_bucket ORDER BY k_bucket
        """,
    ),
    # --- training-data ops over documents/embeddings (task brief) ---
    "dedup_exact": (
        D.q_dedup_exact,
        """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
        FROM documents GROUP BY TRIM(regexp_replace(text, '\\s+', ' ', 'g'))
        ORDER BY doc_id
        """,
    ),
    # aggregate-of-aggregate: per-user count distribution (key-skew
    # diagnostic shape)
    "user_activity_histogram": (
        R.q_user_activity_histogram,
        """
        WITH c AS (SELECT user_id, COUNT(*) AS n_events
                   FROM events GROUP BY user_id)
        SELECT CAST(n_events AS BIGINT) AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM c GROUP BY n_events ORDER BY n_events
        """,
    ),
    # TPC-H Q6 shape: exact-integer price x discount (cents x basis
    # points), float comparisons only in the FILTER (identical literals)
    "forecast_revenue": (
        R.q_forecast_revenue,
        """
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * CAST(ROUND(l_discount*100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents_bps,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
        """,
    ),
    # NFC canonicalization: Python unicodedata == DuckDB nfc_normalize
    # (same Unicode standard); the pre-dedup normalization pass
    "unicode_normalize": (
        D.q_unicode_normalize,
        """
        SELECT doc_id, nfc_normalize(COALESCE(text, '')) AS text_nfc,
               CAST(len(nfc_normalize(COALESCE(text, ''))) AS BIGINT) AS n_chars_nfc,
               (nfc_normalize(COALESCE(text, '')) != COALESCE(text, '')) AS changed
        FROM documents ORDER BY doc_id
        """,
    ),
    # incremental materialized token stats: two aggstore ingests folded
    # == the one-shot aggregate (decomposable partials), same oracle
    "incremental_token_stats": (
        D.q_incremental_token_stats,
        """
        WITH t AS (
          SELECT lang,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
        FROM t GROUP BY lang ORDER BY lang
        """,
    ),
    # incremental exact dedup through the persistent fingerprint store:
    # id-ordered two-increment arrival == one-shot first-wins
    "incremental_dedup": (
        D.q_incremental_dedup,
        r"""
        SELECT MIN(doc_id) AS doc_id
        FROM documents
        GROUP BY TRIM(regexp_replace(text, '\s+', ' ', 'g'))
        ORDER BY doc_id
        """,
    ),
    # exact dedup, keep-LONGEST survivor: argmax encoded as one max-able
    # int64 (score = (n_chars+1)*2^31 - doc_id), same decode both sides
    "dedup_keep_longest": (
        D.q_dedup_keep_longest,
        r"""
        WITH s AS (
          SELECT TRIM(regexp_replace(text, '\s+', ' ', 'g')) AS norm,
                 (n_chars + 1) * 2147483648 - doc_id AS score
          FROM documents),
        m AS (SELECT norm, MAX(score) AS ms, COUNT(*) AS n_dups
              FROM s GROUP BY norm)
        SELECT CAST(((ms + 2147483647) // 2147483648) * 2147483648 - ms AS BIGINT) AS doc_id,
               CAST((ms + 2147483647) // 2147483648 - 1 AS BIGINT) AS n_chars,
               CAST(n_dups AS BIGINT) AS n_dups
        FROM m ORDER BY doc_id
        """,
    ),
    "token_stats": (
        D.q_token_stats,
        """
        WITH t AS (
          SELECT lang,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
        FROM t GROUP BY lang ORDER BY lang
        """,
    ),
    # same aggregation THROUGH a CSV export/re-read hop (source-format
    # parity: sources/csvio.py round-trips the corpus losslessly for this
    # projection, so the parquet-path oracle still matches bit-for-bit)
    "token_stats_csv": (
        D.q_token_stats_csv,
        """
        WITH t AS (
          SELECT lang,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
        FROM t GROUP BY lang ORDER BY lang
        """,
    ),
    "quality_stats": (
        D.q_quality_stats,
        """
        WITH q AS (
          SELECT lang,
                 LENGTH(text) AS n_chars,
                 LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
                 LENGTH(text) - LENGTH(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS n_punct,
                 CASE WHEN TRIM(text) = '' THEN 0 ELSE
                   len(list_filter(regexp_split_to_array(LOWER(TRIM(text)), '\\s+'),
                       w -> w IN ('the','and','of','to','a','in','is','it','that','for'))) END AS n_stop
          FROM documents)
        SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_alpha) AS BIGINT) AS total_alpha, CAST(SUM(n_punct) AS BIGINT) AS total_punct,
               CAST(SUM(n_stop) AS BIGINT) AS total_stop
        FROM q GROUP BY lang ORDER BY lang
        """,
    ),
    "pii_scrub": (
        D.q_pii_scrub,
        """
        WITH s1 AS (
          SELECT doc_id, text,
                 len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
                 regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
          FROM documents),
        s2 AS (
          SELECT doc_id, n_emails,
                 len(regexp_extract_all(t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n_ipv4,
                 regexp_replace(t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS t2
          FROM s1)
        SELECT doc_id, n_emails, n_ipv4,
               len(regexp_extract_all(t2, '\\+?\\d(?:[ -]?\\d){7,14}')) AS n_phones,
               regexp_replace(t2, '\\+?\\d(?:[ -]?\\d){7,14}', '<PHONE>', 'g') AS text_clean
        FROM s2 ORDER BY doc_id
        """,
    ),
    "word_repetition": (
        D.q_word_repetition,
        """
        WITH w AS (
          SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS word
          FROM documents),
        c AS (SELECT doc_id, word, COUNT(*) AS n FROM w GROUP BY doc_id, word)
        SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words, COUNT(*) AS n_unique_words,
               CAST(MAX(n) AS BIGINT) AS top_word_count
        FROM c GROUP BY doc_id ORDER BY doc_id
        """,
    ),
    # decontamination: corpus docs sharing word 3-grams with the held eval
    # set (doc_id < 10, derived from the same table — no external data).
    # Gram convention == ngram_jaccard_pairs (engine joins on 64-bit
    # SipHash of the same gram string the SQL builds).
    "contamination": (
        D.q_contamination,
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT doc_id,
                 UNNEST(list_distinct(
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    FOR i IN range(1, len(w) - 1)])) AS g
          FROM toks WHERE len(w) >= 3),
        eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id < 10),
        corpus AS (SELECT doc_id, g FROM grams WHERE doc_id >= 10),
        sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
        ov AS (SELECT c.doc_id, COUNT(*) AS n_overlap
               FROM corpus c JOIN eval_g USING (g) GROUP BY c.doc_id)
        SELECT s.doc_id, s.n_grams, o.n_overlap
        FROM sizes s JOIN ov o USING (doc_id) ORDER BY s.doc_id
        """,
    ),
    # corpus-frequency boilerplate lines: a line occurring > 5 times across
    # the corpus is boilerplate; per-doc kept/dropped line counts.
    "boilerplate_lines": (
        D.q_boilerplate_lines,
        """
        WITH l AS (
          SELECT doc_id, unnest(string_split(text, chr(10))) AS line
          FROM documents),
        freq AS (SELECT line, COUNT(*) AS n FROM l GROUP BY line)
        SELECT doc_id,
               CAST(SUM(CASE WHEN n <= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(SUM(CASE WHEN n > 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
        FROM l JOIN freq USING (line) GROUP BY doc_id ORDER BY doc_id
        """,
    ),
    # corpus-frequency stopword REMOVAL: the oracle compares the rebuilt
    # per-doc text string (order preservation + exact drop set)
    "stopword_rewrite": (
        D.q_stopword_rewrite,
        """
        WITH l AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok,
                 CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS i
          FROM documents),
        freq AS (SELECT tok, COUNT(*) AS n FROM l GROUP BY tok),
        tot AS (SELECT (SELECT COUNT(*) FROM l) // (SELECT COUNT(*) FROM freq)
                  AS max_freq),
        kept AS (SELECT doc_id, tok, i FROM l JOIN freq USING (tok)
                 CROSS JOIN tot WHERE n <= max_freq),
        agg AS (SELECT doc_id,
                       string_agg(tok, ' ' ORDER BY i) AS text_clean,
                       CAST(COUNT(*) AS BIGINT) AS n_kept
                FROM kept GROUP BY doc_id),
        lp AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks
               FROM l GROUP BY doc_id)
        SELECT d.doc_id, COALESCE(a.text_clean, '') AS text_clean,
               COALESCE(a.n_kept, 0) AS n_kept,
               lp.n_toks - COALESCE(a.n_kept, 0) AS n_dropped
        FROM documents d JOIN lp USING (doc_id) LEFT JOIN agg a USING (doc_id)
        ORDER BY d.doc_id
        """,
    ),
    "stratified_sample": (
        D.q_stratified_sample,
        """
        WITH
        h1 AS (SELECT doc_id, lang, (doc_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM documents),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hashed AS (SELECT doc_id, lang, xor(_c, _c >> 13) AS h32 FROM h3),
        cnt AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY lang),
        m AS (SELECT MIN(n_lang) AS mn FROM cnt)
        SELECT hashed.doc_id, hashed.lang
        FROM hashed JOIN cnt USING (lang) CROSS JOIN m
        WHERE h32 % n_lang < mn
        ORDER BY doc_id
        """,
    ),
    # composed curation flagship: langid -> quality gate -> exact dedup ->
    # deterministic per-language balance, one chained CTE oracle mirroring
    # each stage's existing oracle expression verbatim
    "curate_corpus": (
        D.q_curate_corpus,
        """
        WITH base AS (
          SELECT doc_id,
                 CASE WHEN TRIM(text) = '' THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(LOWER(TRIM(text)), '\\s+') END AS words,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens,
                 TRIM(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
          FROM documents),
        v AS (
          SELECT doc_id, n_tokens, norm,
            len(list_filter(words, x -> x IN ('the','and','of','to','a','in','is','it','that','for'))) AS e,
            len(list_filter(words, x -> x IN ('le','la','les','de','et','un','une','est','que','pour'))) AS f,
            len(list_filter(words, x -> x IN ('de','het','een','en','van','ik','dat','die','niet','met'))) AS n
          FROM base),
        langed AS (
          SELECT doc_id, n_tokens, norm,
                 CASE WHEN n > GREATEST(e, f) AND n > 0 THEN 'nl'
                      WHEN f > e AND f > 0 THEN 'fr'
                      WHEN e > 0 THEN 'en'
                      ELSE 'und' END AS lang_pred
          FROM v WHERE n_tokens >= 25),
        dedup AS (
          SELECT doc_id, lang_pred, n_tokens FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY norm ORDER BY doc_id) AS rn
            FROM langed)
          WHERE rn = 1),
        cnt AS (SELECT lang_pred, COUNT(*) AS n_lang FROM dedup GROUP BY lang_pred),
        m AS (SELECT MIN(n_lang) AS mn FROM cnt),
        h1 AS (SELECT doc_id, lang_pred, n_tokens,
                      (doc_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM dedup),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hashed AS (SELECT doc_id, lang_pred, n_tokens, xor(_c, _c >> 13) AS h32 FROM h3)
        SELECT hashed.doc_id, hashed.lang_pred, hashed.n_tokens
        FROM hashed JOIN cnt USING (lang_pred) CROSS JOIN m
        WHERE h32 % n_lang < mn
        ORDER BY doc_id
        """,
    ),
    "region_rollup": (
        R.q_region_rollup,
        """
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY region, nation
        """,
    ),
    "region_cube": (
        R.q_region_cube,
        """
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, n_name)
        ORDER BY region, nation
        """,
    ),
    # scalar subquery: global average as exact-integer cross-multiplication
    "above_avg_orders": (
        R.q_above_avg_orders,
        """
        WITH s AS (SELECT COUNT(*) AS n,
                          SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS tot
                   FROM orders)
        SELECT o_orderpriority, COUNT(*) AS n_above
        FROM orders CROSS JOIN s
        WHERE CAST(ROUND(o_totalprice*100) AS BIGINT) * n > tot
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    ),
    # grouped MODE with deterministic tie-break (smallest priority wins)
    "priority_mode": (
        R.q_priority_mode,
        """
        WITH c AS (SELECT year(o_orderdate) AS yr, o_orderpriority,
                          CAST(COUNT(*) AS BIGINT) AS n
                   FROM orders GROUP BY 1, 2),
        r AS (SELECT yr, o_orderpriority, n,
                     ROW_NUMBER() OVER (PARTITION BY yr
                                        ORDER BY n DESC, o_orderpriority) AS rn
              FROM c)
        SELECT yr, o_orderpriority AS mode_priority, n
        FROM r WHERE rn = 1 ORDER BY yr
        """,
    ),
    # UNION (distinct) across two tables
    "active_nations": (
        R.q_active_nations,
        """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
        UNION
        SELECT CAST(s_nationkey AS BIGINT) FROM supplier
        ORDER BY nationkey
        """,
    ),
    # set operations over distinct key sets (one shared flags shuffle)
    "repeat_buyers": (
        R.q_repeat_buyers,
        """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        ORDER BY o_custkey
        """,
    ),
    "lapsed_buyers": (
        R.q_lapsed_buyers,
        """
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        ORDER BY o_custkey
        """,
    ),
    # DENSE_RANK window (ties collapse to one rank row via the group-by)
    "part_price_dense_rank": (
        R.q_part_price_dense_rank,
        """
        WITH r AS (
          SELECT p_type,
                 DENSE_RANK() OVER (PARTITION BY p_type
                                    ORDER BY CAST(ROUND(p_retailprice*100) AS BIGINT) DESC)
                   AS dense_rnk,
                 CAST(ROUND(p_retailprice*100) AS BIGINT) AS price_cents
          FROM part)
        SELECT p_type, dense_rnk, price_cents, COUNT(*) AS n_parts
        FROM r WHERE dense_rnk <= 2
        GROUP BY p_type, dense_rnk, price_cents
        ORDER BY p_type, dense_rnk
        """,
    ),
    "order_rank": (
        R.q_order_rank,
        """
        WITH r AS (
          SELECT o_orderpriority,
                 RANK() OVER (PARTITION BY o_orderpriority
                              ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC,
                                       o_orderkey) AS rnk,
                 o_orderkey,
                 CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents
          FROM orders)
        SELECT o_orderpriority, rnk, o_orderkey, price_cents
        FROM r WHERE rnk <= 3
        ORDER BY o_orderpriority, rnk
        """,
    ),
    "event_pivot": (
        R.q_event_pivot,
        """
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
               COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
               COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
        """,
    ),
    "event_moving_avg": (
        R.q_event_moving_avg,
        """
        WITH s AS (
          SELECT event_id,
                 CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS mov_sum_cents,
                 COUNT(*) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS w
          FROM events)
        SELECT event_id, mov_sum_cents, mov_sum_cents // w AS mov_avg_cents
        FROM s ORDER BY event_id
        """,
    ),
    "customer_running_total": (
        R.q_customer_running_total,
        """
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS run_cents
        FROM orders ORDER BY o_orderkey
        """,
    ),
    "order_ntile": (
        R.q_order_ntile,
        """
        SELECT o_orderpriority, o_orderkey,
               NTILE(4) OVER (PARTITION BY o_orderpriority
                              ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC,
                                       o_orderkey) AS quartile
        FROM orders ORDER BY o_orderpriority, quartile, o_orderkey
        """,
    ),
    "event_gaps": (
        R.q_event_gaps,
        """
        WITH g AS (
          SELECT user_id,
                 epoch_us(ts) - LAG(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS gap
          FROM events)
        SELECT user_id,
               COUNT(gap) AS n_gaps,
               CAST(SUM(gap) AS BIGINT) AS sum_gap_us,
               CAST(MAX(gap) AS BIGINT) AS max_gap_us,
               CAST(SUM(gap) AS BIGINT) // COUNT(gap) AS avg_gap_us
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id ORDER BY user_id
        """,
    ),
    "tfidf_top_terms": (
        D.q_tfidf_top_terms,
        """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok WHERE term <> ''
               GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (SELECT doc_id, tf.term AS term, tf.tf * n_docs // df.df AS score
                   FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
        ranked AS (SELECT *, row_number() OVER
                     (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
                   FROM scored)
        SELECT doc_id, term, score FROM ranked WHERE rk <= 3
        ORDER BY doc_id, term
        """,
    ),
    "sample_k_per_lang": (
        D.q_sample_k_per_lang,
        """
        WITH
        h1 AS (SELECT doc_id, lang, (doc_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM documents),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hashed AS (SELECT doc_id, lang, xor(_c, _c >> 13) AS h32 FROM h3),
        r AS (SELECT doc_id, lang, h32,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h32, doc_id) AS rk
              FROM hashed)
        SELECT doc_id, lang, h32 FROM r WHERE rk <= 50 ORDER BY doc_id
        """,
    ),
    "dataset_split": (
        D.q_dataset_split,
        """
        WITH
        h1 AS (SELECT doc_id, lang, (doc_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM documents),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hashed AS (SELECT doc_id, lang, xor(_c, _c >> 13) AS h32 FROM h3),
        b AS (SELECT lang, h32 % 100 AS bk FROM hashed)
        SELECT CASE WHEN bk < 5 THEN 'test' WHEN bk < 10 THEN 'val' ELSE 'train' END AS split,
               lang, COUNT(*) AS n_docs
        FROM b GROUP BY split, lang ORDER BY split, lang
        """,
    ),
    # keyword search: integer tf x (n_docs // df) retrieval scoring over the
    # fixed query terms — the tfidf_top_terms weight, summed per doc
    "keyword_search": (
        D.q_keyword_search,
        """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
               WHERE term IN ('the', 'of', 'la', 'van') GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        s AS (SELECT doc_id, CAST(SUM(tf * (n_docs // df)) AS BIGINT) AS score
              FROM tf JOIN df USING (term) CROSS JOIN n GROUP BY doc_id)
        SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 20
        """,
    ),
    # BM25 (k1=6/5, b=3/4) with the exact rational idf surrogate
    # (2(N-df)+1)/(2df+1); contributions are exact integers in HUGEINT,
    # so the oracle hashes bit-identically (see q_bm25_search docstring)
    "bm25_search": (
        D.q_bm25_search,
        """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS term
          FROM documents),
        tokc AS (SELECT doc_id, term FROM tok WHERE term <> ''),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tokc GROUP BY doc_id),
        g AS (SELECT (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS T,
                     (SELECT COUNT(*) FROM documents) AS N),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tokc
               WHERE term IN ('the', 'of', 'la', 'van') GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        contrib AS (
          SELECT tf.doc_id,
                 CAST((CAST(1048576 AS HUGEINT) * 22 * g.T * tf.tf
                        * (2 * (g.N - df.df) + 1))
                      // ((2 * df.df + 1)
                          * (CAST(10 AS HUGEINT) * g.T * tf.tf
                             + 3 * g.T + 9 * dl.dl * g.N)) AS BIGINT) AS c
          FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g),
        s AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score
              FROM contrib GROUP BY doc_id)
        SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 20
        """,
    ),
    # same retrieval, served from the persistent inverted-index store
    # (sources/invstore.py) — reads only the query terms' hash buckets
    "keyword_search_store": (
        D.q_keyword_search_store,
        """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
               WHERE term IN ('the', 'of', 'la', 'van') GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        s AS (SELECT doc_id, CAST(SUM(tf * (n_docs // df)) AS BIGINT) AS score
              FROM tf JOIN df USING (term) CROSS JOIN n GROUP BY doc_id)
        SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 20
        """,
    ),
    # two-increment store build + ingest == the one-shot oracle (the
    # incremental-family contract applied to search serving)
    "incremental_keyword_search": (
        D.q_incremental_keyword_search,
        """
        WITH tok AS (
          SELECT doc_id, unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS term
          FROM documents),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
               WHERE term IN ('the', 'of', 'la', 'van') GROUP BY doc_id, term),
        df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        s AS (SELECT doc_id, CAST(SUM(tf * (n_docs // df)) AS BIGINT) AS score
              FROM tf JOIN df USING (term) CROSS JOIN n GROUP BY doc_id)
        SELECT doc_id, score FROM s ORDER BY score DESC, doc_id LIMIT 20
        """,
    ),
    "top_terms": (
        D.q_top_terms,
        """
        WITH w AS (
          SELECT unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS word
          FROM documents),
        c AS (SELECT word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY word)
        SELECT word, n FROM c ORDER BY n DESC, word LIMIT 50
        """,
    ),
    "token_quantiles": (
        D.q_token_quantiles,
        """
        WITH t AS (
          SELECT lang,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS v
          FROM documents),
        r AS (SELECT lang, v, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY v) AS rn,
                     COUNT(*) OVER (PARTITION BY lang) AS n FROM t)
        SELECT lang,
               MAX(CASE WHEN rn = CAST(CEIL(0.25*n) AS BIGINT) THEN v END) AS p25,
               MAX(CASE WHEN rn = CAST(CEIL(0.50*n) AS BIGINT) THEN v END) AS p50,
               MAX(CASE WHEN rn = CAST(CEIL(0.75*n) AS BIGINT) THEN v END) AS p75,
               MAX(CASE WHEN rn = CAST(CEIL(0.90*n) AS BIGINT) THEN v END) AS p90,
               MAX(CASE WHEN rn = CAST(CEIL(0.99*n) AS BIGINT) THEN v END) AS p99
        FROM r GROUP BY lang ORDER BY lang
        """,
    ),
    "c4_line_clean": (
        D.q_c4_line_clean,
        """
        SELECT doc_id,
               len(list_filter(string_split(text, chr(10)),
                   x -> regexp_matches(rtrim(x, ' ' || chr(9)), '[.!?"]$'))) AS n_kept,
               len(string_split(text, chr(10)))
                 - len(list_filter(string_split(text, chr(10)),
                       x -> regexp_matches(rtrim(x, ' ' || chr(9)), '[.!?"]$'))) AS n_dropped
        FROM documents ORDER BY doc_id
        """,
    ),
    # relative-rank windows: PERCENT_RANK + CUME_DIST — integer tie-group
    # arithmetic; (rank-1)/(n-1) and peers/n divisions of exact small ints
    # are bit-identical doubles on both sides
    "order_percent_rank": (
        R.q_order_percent_rank,
        """
        SELECT o_orderkey, o_orderpriority,
               percent_rank() OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct_rank,
               cume_dist() OVER
                 (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cume_dist
        FROM orders ORDER BY o_orderpriority, o_orderkey
        """,
    ),
    # grouped INTERPOLATED quantiles (quantile_cont): quarter fractions over
    # cent-integers make every interpolation double exact, so no tolerance
    "priority_price_quartiles_cont": (
        R.q_priority_price_quartiles_cont,
        """
        WITH t AS (SELECT o_orderpriority,
                          CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
                   FROM orders)
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
               quantile_cont(cents, 0.25) AS q25_cents,
               quantile_cont(cents, 0.50) AS q50_cents,
               quantile_cont(cents, 0.75) AS q75_cents
        FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    ),
    # near-dup REMOVAL end to end: keep the min-doc_id representative of
    # every exact-Jaccard cluster plus all unpaired docs — the same
    # recursive closure as jaccard_clusters, anti-joined back to documents
    "dedup_jaccard": (
        D.q_dedup_jaccard,
        r"""
        WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 UNNEST(list_distinct(
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    FOR i IN range(1, len(w) - 1)])) AS g
          FROM toks WHERE len(w) >= 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM grams a JOIN grams b USING (g)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE 2 * c >= sa.n + sb.n - c
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs
          UNION SELECT doc_a, doc_a FROM pairs
          UNION SELECT doc_b, doc_b FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        removed AS (
          SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a
        )
        SELECT d.doc_id, d.lang, d.n_chars FROM documents d
        WHERE d.doc_id NOT IN (SELECT doc_id FROM removed)
        ORDER BY d.doc_id
        """,
    ),
    # per-group TOP-K over a many-group key (batch-local top-3 combiner
    # prune before the shuffle; cents in the window ORDER BY on both sides)
    "top_orders_per_customer": (
        R.q_top_orders_per_customer,
        """
        SELECT o_custkey, o_orderkey, price_cents, rnk FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(ROUND(o_totalprice*100) AS BIGINT) AS price_cents,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC,
                            o_orderkey) AS rnk
          FROM orders)
        WHERE rnk <= 3 ORDER BY o_custkey, rnk
        """,
    ),
    # explicit GROUPING SETS beyond ROLLUP/CUBE's fixed lattices — one
    # distributed finest pass, coarser sets re-summed driver-side
    "order_grouping_sets": (
        R.q_order_grouping_sets,
        """
        WITH t AS (SELECT o_orderstatus, o_orderpriority,
                          CAST(ROUND(o_totalprice*100) AS BIGINT) AS c
                   FROM orders)
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(c) AS BIGINT) AS cents
        FROM t GROUP BY GROUPING SETS
          ((o_orderstatus, o_orderpriority), (o_orderstatus),
           (o_orderpriority), ())
        ORDER BY status, priority
        """,
    ),
    # grouped least-squares regression from exact-int sufficient statistics;
    # the oracle spells out the identical integer->double->divide evaluation
    # (DuckDB's native regr_* streams float co-moments and would drift)
    "price_qty_regression": (
        R.q_lineitem_regression,
        """
        WITH s AS (
          SELECT l_returnflag,
                 CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)) AS HUGEINT) AS sy,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                          * CAST(ROUND(l_quantity) AS BIGINT)) AS HUGEINT) AS sxx,
                 CAST(SUM(CAST(FLOOR(l_extendedprice) AS BIGINT)
                          * CAST(FLOOR(l_extendedprice) AS BIGINT)) AS HUGEINT) AS syy,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                          * CAST(FLOOR(l_extendedprice) AS BIGINT)) AS HUGEINT) AS sxy
          FROM lineitem GROUP BY l_returnflag),
        d AS (
          SELECT l_returnflag, n, sx, sy,
                 CAST(n*sxy - sx*sy AS DOUBLE) AS cov,
                 CAST(n*sxx - sx*sx AS DOUBLE) AS varx,
                 CAST(n*syy - sy*sy AS DOUBLE) AS vary
          FROM s),
        e AS (SELECT *, cov / varx AS slope FROM d)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n, slope,
               (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) AS intercept,
               (cov * cov) / (varx * vary) AS r2
        FROM e ORDER BY l_returnflag
        """,
    ),
    # forward-looking windows: LEAD(1)/LEAD(2)/NTH_VALUE(3) per user timeline
    "event_lead": (
        R.q_event_lead,
        """
        SELECT event_id, user_id,
               lead(event_type) OVER w AS next_type,
               lead(value, 2) OVER w AS next2_value,
               nth_value(value, 3) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS third_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
        """,
    ),
    # relational division ("for all" join): customers active in EVERY year
    "loyal_customers": (
        R.q_loyal_customers,
        """
        WITH cq AS (SELECT DISTINCT o_custkey,
                      CAST(year(o_orderdate) AS BIGINT) AS yr
                    FROM orders),
        tot AS (SELECT COUNT(DISTINCT yr) AS ny FROM cq)
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_years
        FROM cq, tot GROUP BY o_custkey, ny HAVING COUNT(*) = ny
        ORDER BY o_custkey
        """,
    ),
    # latest-record-per-key compaction (upsert/CDC shape): newest full
    # event row per user, ties broken by event_id
    "latest_events": (
        R.q_latest_events,
        """
        SELECT event_id, user_id, ts, event_type, value FROM events
        QUALIFY ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        ORDER BY user_id
        """,
    ),
    # value-based RANGE frame (INTERVAL 1 HOUR PRECEDING .. CURRENT ROW):
    # exact FLOOR-cents so both sides sum identical integers
    "event_range_window": (
        R.q_event_range_window,
        """
        SELECT event_id, user_id,
               SUM(CAST(FLOOR(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
               ) AS hour_cents
        FROM events ORDER BY event_id
        """,
    ),
    # ORC-hop parity: same hourly windows, through a worker-sharded ORC
    # export + schema-pinned re-read (timestamp ns->us cast-back)
    "event_windows_orc": (
        R.q_event_windows_orc,
        """
        SELECT event_type, date_trunc('hour', ts) AS window_start, COUNT(*) AS n
        FROM events GROUP BY event_type, window_start
        ORDER BY event_type, window_start
        """,
    ),
    # Avro-hop parity: per-(user, event_type) rollup through worker-sharded
    # self-indexed Avro OCF files (sources/avro.py) — pins timestamp-micros,
    # double wire format and nullable unions through a real pipeline
    "events_avro": (
        R.q_events_avro,
        """
        SELECT user_id, event_type, COUNT(*) AS n,
               SUM(CAST(FLOOR(value*100) AS BIGINT)) AS sum_cents,
               MAX(ts) AS last_ts
        FROM events GROUP BY user_id, event_type
        ORDER BY user_id, event_type
        """,
    ),
    # GROUPS-mode window frame (1 peer group preceding + current); DuckDB
    # lacks GROUPS, so the oracle is the day-group LAG rewrite
    "event_groups_frame": (
        R.q_event_groups_frame,
        """
        WITH d AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 SUM(CAST(FLOOR(value*100) AS BIGINT)) AS day_cents
          FROM events GROUP BY user_id, day
        ), w AS (
          SELECT user_id, day,
                 day_cents + COALESCE(LAG(day_cents) OVER (
                   PARTITION BY user_id ORDER BY day), 0) AS twoday_cents
          FROM d
        )
        SELECT e.event_id, e.user_id, CAST(w.twoday_cents AS BIGINT) AS twoday_cents
        FROM events e JOIN w ON e.user_id = w.user_id AND CAST(e.ts AS DATE) = w.day
        ORDER BY e.event_id
        """,
    ),
    # window frame EXCLUDE CURRENT ROW: per-order peer (leave-one-out) stats
    "order_peer_stats": (
        R.q_order_peer_stats,
        """
        SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(COALESCE(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                 EXCLUDE CURRENT ROW), 0) AS BIGINT) AS peer_cents,
               CAST(COUNT(*) OVER (
                 PARTITION BY o_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                 EXCLUDE CURRENT ROW) AS BIGINT) AS n_peers
        FROM orders ORDER BY o_orderkey
        """,
    ),
    # sliding order statistic: discrete moving median over the last 5 events
    "event_moving_median": (
        R.q_event_moving_median,
        """
        SELECT event_id, user_id,
               CAST(quantile_disc(CAST(FLOOR(value*100) AS BIGINT), 0.5) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS med5_cents
        FROM events ORDER BY event_id
        """,
    ),
    # gaps-and-islands: longest consecutive-active-day streak per user
    "user_streaks": (
        R.q_user_streaks,
        """
        WITH days AS (
          SELECT DISTINCT user_id,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
          FROM events
        ), isl AS (
          SELECT user_id, d,
                 d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
          FROM days
        ), runs AS (
          SELECT user_id, grp, COUNT(*) AS len FROM isl GROUP BY user_id, grp
        )
        SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
               CAST(MAX(len) AS BIGINT) AS max_streak
        FROM runs GROUP BY user_id ORDER BY user_id
        """,
    ),
    # interval-overlap sweep: peak concurrent 5-minute intervals per type
    "concurrent_sessions": (
        R.q_concurrent_sessions,
        """
        WITH b AS (
          SELECT event_type, ts AS t, 1 AS delta FROM events
          UNION ALL
          SELECT event_type, ts + INTERVAL 5 MINUTE AS t, -1 AS delta FROM events
        ), r AS (
          SELECT event_type,
                 SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta)
                   AS conc
          FROM b
        )
        SELECT event_type, CAST(MAX(conc) AS BIGINT) AS peak_concurrency
        FROM r GROUP BY event_type ORDER BY event_type
        """,
    ),
    # CROSS JOIN dimension matrix with zero-filled facts
    "region_year_matrix": (
        R.q_region_year_matrix,
        """
        WITH rev AS (
          SELECT c.c_nationkey, EXTRACT(year FROM o.o_orderdate) AS yr,
                 SUM(CAST(ROUND(o.o_totalprice*100) AS BIGINT)) AS rev_cents
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY c.c_nationkey, yr
        ), by_region AS (
          SELECT r.r_name AS region, rev.yr, SUM(rev.rev_cents) AS rev_cents
          FROM rev JOIN nation n ON rev.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          GROUP BY r.r_name, rev.yr
        ), years AS (SELECT DISTINCT yr FROM by_region)
        SELECT r.r_name AS region, CAST(y.yr AS BIGINT) AS yr,
               CAST(COALESCE(b.rev_cents, 0) AS BIGINT) AS rev_cents
        FROM region r CROSS JOIN years y
        LEFT JOIN by_region b ON b.region = r.r_name AND b.yr = y.yr
        ORDER BY region, yr
        """,
    ),
    # skyline / Pareto-maxima over per-customer (n_orders, spend)
    "skyline_customers": (
        R.q_skyline_customers,
        """
        WITH s AS (
          SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
                 SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS tot_cents
          FROM orders GROUP BY o_custkey
        )
        SELECT custkey, CAST(n_orders AS BIGINT) AS n_orders,
               CAST(tot_cents AS BIGINT) AS tot_cents
        FROM s o
        WHERE NOT EXISTS (
          SELECT 1 FROM s x
          WHERE x.n_orders >= o.n_orders AND x.tot_cents >= o.tot_cents
            AND (x.n_orders > o.n_orders OR x.tot_cents > o.tot_cents))
        ORDER BY custkey
        """,
    ),
    # data-quality audit: referential integrity + uniqueness + bounds
    "integrity_audit": (
        R.q_integrity_audit,
        """
        SELECT
          (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
            AS n_orphan_orders,
          (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
            AS n_orphan_lineitems,
          (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer
             GROUP BY c_custkey HAVING COUNT(*) > 1))
            AS n_dup_customers,
          (SELECT COUNT(*) FROM orders
             WHERE o_totalprice IS NULL OR o_totalprice <= 0)
            AS n_bad_prices
        """,
    ),
    # heuristic/sketch ops: rows-only (no SQL equivalent)
    # HLL approximate distinct users per event type (register-max merge is
    # order-independent -> parallelism-invariant; pinned to a driver
    # recompute + <5% error vs exact in pytest)
    "hll_user_counts": (R.q_hll_user_counts, None),
    # end-to-end MinHash-LSH dedup: LSH pairs -> components -> keep the
    # min-doc_id representative (rows-only; union-find-pinned in pytest,
    # removal tail shared with the SQL-oracled dedup_jaccard)
    "dedup_minhash": (D.q_dedup_minhash, None),
    # exact all-pairs embedding near-dup — SQL-oracled via the quantized
    # integer bridge (the ann_exact_topk discipline)
    "embedding_neardup": (
        D.q_embedding_neardup,
        """
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)*1024) AS BIGINT)) AS qv
          FROM embeddings),
        n AS (SELECT vec_id, qv, list_inner_product(qv, qv) AS qq FROM q)
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               CAST(FLOOR((list_inner_product(a.qv, b.qv)
                           / sqrt(a.qq * b.qq)) * 100) AS BIGINT) AS sim_pct
        FROM n a JOIN n b ON b.vec_id > a.vec_id
        WHERE (list_inner_product(a.qv, b.qv) / sqrt(a.qq * b.qq)) >= 0.45
        ORDER BY vec_a, vec_b
        """,
    ),
    # distributed covariance PCA (exact-int64 d^2 partials; rows-only —
    # eigendecomposition has no SQL analog; numpy-pinned in pytest)
    "embedding_pca": (D.q_embedding_pca, None),
    # crawl pipelines (non-SQL: stateful frontier/politeness iteration)
    "crawl_flagship": (q_crawl_flagship, None),
    "crawl_domain_rollup": (q_domain_rollup_crawl, None),
    # crawl pages artifact -> curated corpus (composition of the two engine
    # halves; rows-only — the crawl side has no SQL analog)
    "crawl_corpus": (q_crawl_corpus, None),
    "screenshot_digests": (q_screenshot_digests, None),
    # inbound anchor-text aggregation over crawled pages (rows-only)
    "anchor_texts": (q_anchor_texts, None),
    # multimodal: perceptual-hash image near-dup pairs (rows-only; exact
    # for hamming < num_bands, pinned by a brute-force pytest oracle)
    "image_dupes": (D.q_image_dupes, None),
    # host-graph PageRank over the crawled web (rows-only)
    "host_pagerank": (q_host_pagerank, None),
    "langid": (
        D.q_langid,
        # mirror of LangId.detect: stopword votes per language, first-wins
        # tie order en > fr > nl (a later language must be STRICTLY better),
        # 'und' when no list scores > 0
        """
        WITH w AS (
          SELECT doc_id,
                 CASE WHEN TRIM(text) = '' THEN []::VARCHAR[]
                      ELSE regexp_split_to_array(LOWER(TRIM(text)), '\\s+') END AS words
          FROM documents),
        v AS (
          SELECT doc_id,
            len(list_filter(words, x -> x IN ('the','and','of','to','a','in','is','it','that','for'))) AS e,
            len(list_filter(words, x -> x IN ('le','la','les','de','et','un','une','est','que','pour'))) AS f,
            len(list_filter(words, x -> x IN ('de','het','een','en','van','ik','dat','die','niet','met'))) AS n
          FROM w)
        SELECT CASE WHEN n > GREATEST(e, f) AND n > 0 THEN 'nl'
                    WHEN f > e AND f > 0 THEN 'fr'
                    WHEN e > 0 THEN 'en'
                    ELSE 'und' END AS lang_detected,
               COUNT(*) AS n
        FROM v GROUP BY lang_detected ORDER BY lang_detected
        """,
    ),
    "fingerprints": (D.q_fingerprints, None),
    # exact n-gram Jaccard dedup: the sketch-free near-dup with a full SQL
    # oracle (inverted-index self-join on the gram string; Ray joins on a
    # 64-bit gram hash — see q_ngram_jaccard_pairs docstring).  Integer
    # floor-div percentage + integer threshold (2c >= union) on BOTH sides
    # so there is no float rounding to diverge on.
    "ngram_jaccard_pairs": (
        D.q_ngram_jaccard_pairs,
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 UNNEST(list_distinct(
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    FOR i IN range(1, len(w) - 1)])) AS g
          FROM toks WHERE len(w) >= 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM grams a JOIN grams b USING (g)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST((100 * c) // (sa.n + sb.n - c) AS BIGINT) AS jaccard_pct
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE 2 * c >= sa.n + sb.n - c
        ORDER BY doc_a, doc_b
        """,
    ),
    # substring-level dedup signal: positional word-5-gram spans whose gram
    # occurs >= 2x corpus-wide (Lee et al. 2022 shape, word granularity)
    "repeated_spans": (
        D.q_repeated_spans,
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT doc_id,
                 UNNEST([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                         w[i+3] || ' ' || w[i+4]
                         FOR i IN range(1, len(w) - 3)]) AS g
          FROM toks WHERE len(w) >= 5),
        freq AS (SELECT g, COUNT(*) AS f FROM grams GROUP BY g)
        SELECT doc_id, COUNT(*) AS n_spans,
               CAST(SUM(CASE WHEN f >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
        FROM grams JOIN freq USING (g) GROUP BY doc_id ORDER BY doc_id
        """,
    ),
    # connected components over the exact-Jaccard pair graph: distributed
    # min-label propagation vs a recursive transitive-closure oracle
    "jaccard_clusters": (
        D.q_jaccard_clusters,
        r"""
        WITH RECURSIVE toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 UNNEST(list_distinct(
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    FOR i IN range(1, len(w) - 1)])) AS g
          FROM toks WHERE len(w) >= 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM grams a JOIN grams b USING (g)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        ),
        pairs AS (
          SELECT doc_a, doc_b FROM inter
          JOIN sizes sa ON sa.doc_id = doc_a
          JOIN sizes sb ON sb.doc_id = doc_b
          WHERE 2 * c >= sa.n + sb.n - c
        ),
        edges AS (
          SELECT doc_a AS a, doc_b AS b FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs
          UNION SELECT doc_a, doc_a FROM pairs
          UNION SELECT doc_b, doc_b FROM pairs
        ),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        )
        SELECT a AS doc_id, MIN(b) AS cluster FROM reach
        GROUP BY a ORDER BY doc_id
        """,
    ),
    # prefix-filtered scale path — SAME result and oracle as
    # ngram_jaccard_pairs (candidate pruning is exact at threshold 1/2)
    "ngram_jaccard_prefix": (
        D.q_ngram_jaccard_pairs_prefix,
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 UNNEST(list_distinct(
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    FOR i IN range(1, len(w) - 1)])) AS g
          FROM toks WHERE len(w) >= 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
          FROM grams a JOIN grams b USING (g)
          WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               CAST((100 * c) // (sa.n + sb.n - c) AS BIGINT) AS jaccard_pct
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE 2 * c >= sa.n + sb.n - c
        ORDER BY doc_a, doc_b
        """,
    ),
    "minhash_pairs": (D.q_minhash_pairs, None),
    "simhash_pairs": (D.q_simhash_pairs, None),
    "ann_topk": (D.q_ann_topk, None),
    # SQL-oracled brute-force cosine top-k: integer-quantized vectors
    # (floor(x*1024) — power-of-two scale is exact IEEE on both engines)
    # make dot/norms int64-exact and the sim expression bit-identical
    "ann_exact_topk": (
        D.q_ann_exact_topk,
        """
        WITH q AS (
          SELECT vec_id AS qid,
                 list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)*1024) AS BIGINT)) AS qv
          FROM embeddings WHERE vec_id < 8),
        d AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)*1024) AS BIGINT)) AS dv
          FROM embeddings),
        s AS (
          SELECT q.qid AS query_id, d.vec_id,
                 list_inner_product(q.qv, d.dv) AS dot,
                 list_inner_product(q.qv, q.qv) AS qq,
                 list_inner_product(d.dv, d.dv) AS dd
          FROM q, d WHERE d.vec_id != q.qid)
        SELECT query_id, vec_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
               dot / sqrt(qq * dd) AS sim
        FROM s
        WINDOW w AS (PARTITION BY query_id
                     ORDER BY dot / sqrt(qq * dd) DESC, vec_id)
        QUALIFY rnk <= 5 ORDER BY query_id, rnk
        """,
    ),
    # filtered vector search: metadata predicate (label == 3) pruned
    # batch-side BEFORE scoring; same exact-integer oracle discipline
    "ann_filtered_topk": (
        D.q_ann_filtered_topk,
        """
        WITH q AS (
          SELECT vec_id AS qid,
                 list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)*1024) AS BIGINT)) AS qv
          FROM embeddings WHERE vec_id < 8),
        d AS (
          SELECT vec_id,
                 list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE)*1024) AS BIGINT)) AS dv
          FROM embeddings WHERE label = 3),
        s AS (
          SELECT q.qid AS query_id, d.vec_id,
                 list_inner_product(q.qv, d.dv) AS dot,
                 list_inner_product(q.qv, q.qv) AS qq,
                 list_inner_product(d.dv, d.dv) AS dd
          FROM q, d WHERE d.vec_id != q.qid)
        SELECT query_id, vec_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
               dot / sqrt(qq * dd) AS sim
        FROM s
        WINDOW w AS (PARTITION BY query_id
                     ORDER BY dot / sqrt(qq * dd) DESC, vec_id)
        QUALIFY rnk <= 5 ORDER BY query_id, rnk
        """,
    ),
    "ann_ivf_topk": (D.q_ann_ivf_topk, None),
    "ann_lsh_buckets": (D.q_ann_lsh_buckets, None),
    # PQ-compressed ANN (m-byte codes, ADC lookup scoring; recall pinned
    # vs brute force in tests/test_cms.py)
    "ann_pq_topk": (D.q_ann_pq_topk, None),
    # BPE tokenizer: distributed word histogram -> driver merge loop;
    # encode = broadcast merge table + memoized per-word piece counts
    # (no SQL analog; pinned by classic-fixture + direct-read tests)
    "bpe_train": (D.q_bpe_train, None),
    # byte-trigram LM perplexity quality scoring (KenLM-filter analog;
    # float log — rows-only; separation pinned by planted fixtures)
    "lm_perplexity": (D.q_lm_perplexity, None),
    "bpe_tokenize": (D.q_bpe_tokenize, None),
    "neardup_clusters": (D.q_neardup_clusters, None),
    # (embedding_neardup moved up: SQL-oracled via the quantized bridge)
    "embedding_neardup_lsh": (D.q_embedding_neardup_lsh, None),
    # Count-Min-Sketch approximate term counts vs exact top-k (sketch op —
    # no SQL analog; accuracy pinned by tests/test_cms.py)
    "cms_term_counts": (D.q_cms_term_counts, None),
    # distributed k-means over embeddings (iterative float op — no SQL
    # analog; pinned to the driver Lloyd oracle in tests/test_cms.py)
    "kmeans_clusters": (D.q_kmeans_clusters, None),
    # SemDeDup cluster-then-prune semantic dedup (iterative float op —
    # pinned to the driver semdedup_prune oracle in tests)
    "semdedup": (D.q_semdedup, None),
    # KLL-sketch approximate quantiles (sketch op — accuracy pinned by
    # tests/test_kll.py; equals the exact query below sketch capacity)
    "token_quantiles_approx": (D.q_token_quantiles_approx, None),
    # zlib compression-ratio repetition signal (no SQL analog — zlib;
    # pinned by planted repetitive/high-entropy fixtures in tests)
    "compression_ratio": (D.q_compression_ratio, None),
    # list UNNEST WITH ORDINALITY -> GROUP BY position (DuckDB: unnest +
    # generate_subscripts expand in lockstep); floor(x*1024) quantized
    # bridge keeps SUM/MIN/MAX exact int64 on both engines.  The engine
    # never explodes rows: O(dim) column partials per batch, no shuffle
    "embedding_dim_stats": (
        D.q_embedding_dim_stats,
        """
        WITH u AS (SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
                          CAST(FLOOR(unnest(embedding)*1024) AS BIGINT) AS q
                   FROM embeddings)
        SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS sum_q,
               CAST(MIN(q) AS BIGINT) AS min_q,
               CAST(MAX(q) AS BIGINT) AS max_q
        FROM u GROUP BY dim ORDER BY dim
        """,
    ),
    # content-defined chunking dedup stats (Rabin rolling-hash boundaries,
    # FastCDC cut discipline) — no SQL analog for the rolling hash ->
    # rows-only; numbers pinned by a pure-Python reference in pytest
    "cdc_chunk_stats": (D.q_cdc_chunk_stats, None),
    # Misra-Gries heavy hitters (deterministic bound; rows-only — the
    # summary's exact estimates depend on fold order; the BOUND is pinned
    # in tests/test_graph.py against exact counts)
    "mg_top_terms": (D.q_mg_top_terms, None),
    # approximate k-NN graph (IVF co-partitioned; nprobe==nlist is pinned
    # exact vs brute force in tests) — rows-only
    "knn_graph": (D.q_knn_graph, None),
    # persistent-store ANN (rows-only; store search pinned exact in tests)
    "ann_store_topk": (D.q_ann_store_topk, None),
    "media_features": (D.q_media_features, None),
    "media_frames": (D.q_media_frames, None),
    "media_metadata": (D.q_media_metadata, None),
    # integer fixed-point PageRank over the derived part-supplier graph —
    # BIGINT floor math on both sides, so it hash-matches exactly
    "pagerank": (G.q_pagerank, G.PAGERANK_SQL),
    # integer HITS hubs/authorities on the directed part->supplier graph
    "hits": (G.q_hits, G.HITS_SQL),
    # triangle count over the co-purchase graph (degree-oriented wedge
    # MapReduce plan); oracle = canonical-edge self-join, a<b<c once
    "triangle_count": (
        G.q_triangle_count,
        """
        WITH pairs AS (
          SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                          GREATEST(a.l_partkey, b.l_partkey) AS b
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey)
        SELECT COUNT(*) AS n_triangles
        FROM pairs e1
        JOIN pairs e2 ON e1.b = e2.a
        JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
    ),
    # DOULION sampled triangles (KDD'09): deterministic hash coin, p=1/4,
    # estimate = sampled * 4^3 — the scale path for the wedge-superlinear
    # exact variant; exactly reproducible so fully oracle-checkable
    "triangle_count_sampled": (
        G.q_triangle_count_sampled,
        """
        WITH pairs AS (
          SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                          GREATEST(a.l_partkey, b.l_partkey) AS b
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey),
        sampled AS (
          SELECT a, b FROM pairs
          WHERE (a * 2654435761 + b * 40503) % 1000000007 % 4 = 0)
        SELECT tri AS sampled_triangles,
               CAST(tri * 64 AS BIGINT) AS est_triangles
        FROM (SELECT COUNT(*) AS tri
              FROM sampled e1
              JOIN sampled e2 ON e1.b = e2.a
              JOIN sampled e3 ON e3.a = e1.a AND e3.b = e2.b) t
        """,
    ),
    # token-budget corpus mixing: per-source cumulative cutoff in
    # mix32 order (seedless shuffle); oracle = window cumsum
    "mix_corpus": (
        D.q_mix_corpus,
        """
        WITH
        h1 AS (SELECT doc_id, source, text,
                      (doc_id % 2147483648) * 2654435761 % 4294967296 AS _a
               FROM documents),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        t AS (SELECT doc_id, source, xor(_c, _c >> 13) AS h32,
                     CASE WHEN TRIM(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
              FROM h3),
        w AS (SELECT doc_id, source, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY source ORDER BY h32, doc_id
                                         ROWS UNBOUNDED PRECEDING) AS cum
              FROM t)
        SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
        FROM w WHERE cum <= 600 ORDER BY doc_id
        """,
    ),
    # deterministic next-fit sequence packing (sample packing): stateful
    # scan decomposed by id space; oracle = per-chunk recursive walk with
    # the same accumulate/reset rule
    "pack_sequences": (
        D.q_pack_sequences,
        """
        WITH RECURSIVE t AS (
          SELECT doc_id, doc_id // 256 AS chunk,
                 CASE WHEN TRIM(text) = '' THEN 0
                      ELSE len(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens,
                 ROW_NUMBER() OVER (PARTITION BY doc_id // 256 ORDER BY doc_id) AS rn
          FROM documents),
        walk AS (
          SELECT chunk, rn, doc_id, n_tokens, n_tokens AS acc, 0 AS bin
          FROM t WHERE rn = 1
          UNION ALL
          SELECT t.chunk, t.rn, t.doc_id, t.n_tokens,
                 CASE WHEN w.acc + t.n_tokens > 1024
                      THEN t.n_tokens ELSE w.acc + t.n_tokens END,
                 CASE WHEN w.acc + t.n_tokens > 1024 THEN w.bin + 1 ELSE w.bin END
          FROM walk w JOIN t ON t.chunk = w.chunk AND t.rn = w.rn + 1)
        SELECT doc_id, CAST(chunk * 1048576 + bin AS BIGINT) AS bin_id,
               CAST(n_tokens AS BIGINT) AS n_tokens
        FROM walk ORDER BY doc_id
        """,
    ),
    # duplicate-content groups with cross-source spread: same normalization
    # + first-wins id as dedup_exact, plus COUNT(DISTINCT source) per group
    "source_overlap": (
        D.q_source_overlap,
        """
        WITH t AS (SELECT doc_id, source,
                          TRIM(regexp_replace(text, '\\s+', ' ', 'g')) AS norm
                   FROM documents)
        SELECT MIN(doc_id) AS doc_id,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               COUNT(*) AS n_docs
        FROM t GROUP BY norm
        ORDER BY doc_id
        """,
    ),
    # multi-source BFS hop distances over the derived symmetric graph;
    # oracle = recursive CTE with the same depth cap (UNION, not UNION
    # ALL — the graph is cyclic), MIN(depth) per node
    "bfs_depths": (
        G.q_bfs_depths,
        """
        WITH RECURSIVE edges AS (
          SELECT DISTINCT CAST(l_partkey*2 AS BIGINT) AS src,
                          CAST(l_suppkey*2+1 AS BIGINT) AS dst FROM lineitem
          UNION
          SELECT DISTINCT CAST(l_suppkey*2+1 AS BIGINT) AS src,
                          CAST(l_partkey*2 AS BIGINT) AS dst FROM lineitem
        ),
        bfs AS (
          SELECT DISTINCT CAST(l_partkey*2 AS BIGINT) AS node, 0 AS depth
          FROM lineitem WHERE l_partkey <= 5
          UNION
          SELECT e.dst AS node, b.depth + 1 AS depth
          FROM bfs b JOIN edges e ON e.src = b.node
          WHERE b.depth < 10
        )
        SELECT node, CAST(MIN(depth) AS BIGINT) AS depth
        FROM bfs GROUP BY node ORDER BY node
        """,
    ),
    # weighted SSSP: bounded-hop Bellman-Ford over the min-quantity-weighted
    # part-supplier graph (hop bound keeps the recursive oracle finite)
    "shortest_paths": (
        G.q_shortest_paths,
        """
        WITH RECURSIVE edges AS (
          SELECT CAST(l_partkey*2 AS BIGINT) AS src,
                 CAST(l_suppkey*2+1 AS BIGINT) AS dst,
                 CAST(MIN(ROUND(l_quantity)) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2
          UNION ALL
          SELECT CAST(l_suppkey*2+1 AS BIGINT) AS src,
                 CAST(l_partkey*2 AS BIGINT) AS dst,
                 CAST(MIN(ROUND(l_quantity)) AS BIGINT) AS w
          FROM lineitem GROUP BY 1, 2
        ),
        sp AS (
          SELECT DISTINCT CAST(l_partkey*2 AS BIGINT) AS node,
                 CAST(0 AS BIGINT) AS dist, 0 AS hops
          FROM lineitem WHERE l_partkey <= 3
          UNION
          SELECT e.dst AS node, s.dist + e.w AS dist, s.hops + 1 AS hops
          FROM sp s JOIN edges e ON e.src = s.node
          WHERE s.hops < 4
        )
        SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
        FROM sp GROUP BY node ORDER BY node
        """,
    ),
    # corr/covar aggregate as exact-integer sufficient statistics (the
    # division stays out of the query so the value hash is bit-identical)
    "corr_stats": (
        R.q_corr_stats,
        """
        WITH t AS (SELECT l_returnflag,
                          CAST(ROUND(l_quantity) AS BIGINT) AS x,
                          CAST(FLOOR(l_extendedprice) AS BIGINT) AS y
                   FROM lineitem)
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sum_x,
               CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(SUM(x*x) AS BIGINT) AS sum_xx,
               CAST(SUM(y*y) AS BIGINT) AS sum_yy,
               CAST(SUM(x*y) AS BIGINT) AS sum_xy
        FROM t GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    ),
    # character-level near-dup: banded Levenshtein over UTF-8 bytes (DuckDB
    # levenshtein is byte-based — measured in q_edit_distance_pairs's
    # docstring); the n_chars length band is definitional on both sides
    "edit_distance_pairs": (
        D.q_edit_distance_pairs,
        """
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist
        FROM documents a JOIN documents b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= 32
        WHERE levenshtein(a.text, b.text) <= 32
        """,
    ),
    # ordered grouped string aggregation (string_agg ... ORDER BY shape)
    "customer_order_list": (
        R.q_customer_order_list,
        """
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS orders_csv
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
    ),
    # grouped exact quartiles — quantile_disc at .25/.5/.75, ceil-rule
    # gathers identical on both sides
    "customer_price_quartiles": (
        R.q_customer_price_quartiles,
        """
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.25) AS BIGINT) AS p25_cents,
               CAST(quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.50) AS BIGINT) AS p50_cents,
               CAST(quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.75) AS BIGINT) AS p75_cents
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
    ),
    # grouped order statistics: exact lower median per customer — the
    # aggregate partial trees cannot combine; quantile_disc(.5) IS the
    # lower median (verified: {1,2,3,4} -> 2), matching the engine's
    # start + ceil(n/2) - 1 gather bit-for-bit
    "customer_median_order": (
        R.q_customer_median_order,
        """
        SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(quantile_disc(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5)
                    AS BIGINT) AS median_cents
        FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
    ),
    # grouped robust spread: MAD = lower-median of |x - lower-median(x)|,
    # both medians quantile_disc (integer-exact); the engine computes both
    # order-statistic passes inside ONE hash partition (no second shuffle)
    "customer_order_mad": (
        R.q_customer_order_mad,
        """
        WITH c AS (SELECT o_custkey,
                          CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
                   FROM orders),
        m AS (SELECT o_custkey,
                     CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents
              FROM c GROUP BY o_custkey)
        SELECT c.o_custkey, m.median_cents,
               CAST(quantile_disc(ABS(c.cents - m.median_cents), 0.5)
                    AS BIGINT) AS mad_cents
        FROM c JOIN m USING (o_custkey)
        GROUP BY c.o_custkey, m.median_cents ORDER BY c.o_custkey
        """,
    ),
    # correlated per-group aggregate ("above own group average"): the SQL
    # needs a grouped-avg self-join; the engine does ONE partition pass
    # with the exact integer cross-multiplication cents*n > sum
    "above_customer_avg": (
        R.q_above_customer_avg,
        """
        WITH c AS (SELECT o_custkey,
                          CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
                   FROM orders),
        a AS (SELECT o_custkey, SUM(cents) AS s, COUNT(*) AS n
              FROM c GROUP BY o_custkey)
        SELECT c.o_custkey, CAST(ANY_VALUE(a.n) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN c.cents * a.n > a.s THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above
        FROM c JOIN a USING (o_custkey)
        GROUP BY c.o_custkey ORDER BY c.o_custkey
        """,
    ),
    # sequence bigrams: Markov transition counts over per-user journeys;
    # LEAD over the same (ts, event_id) order is the SQL spelling of the
    # engine's shifted same-user comparison
    "event_transitions": (
        R.q_event_transitions,
        """
        WITH s AS (SELECT user_id, event_type AS src,
                          LEAD(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS dst
                   FROM events)
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS n
        FROM s WHERE dst IS NOT NULL
        GROUP BY src, dst ORDER BY src, dst
        """,
    ),
    # ordered string_agg: per-user '>'-joined event_type journey in
    # (ts, event_id) order — event_id breaks ts ties on both engines
    "user_event_paths": (
        R.q_user_event_paths,
        """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id ORDER BY user_id
        """,
    ),
    # broadcast range-lookup join: BETWEEN-join against a small disjoint
    # interval dim table == one searchsorted against broadcast bounds (the
    # engine never shuffles the fact side); quadratic tier widths make the
    # intervals irregular so a plain division can't reproduce them
    "value_tier_lookup": (
        R.q_value_tier_lookup,
        """
        WITH t AS (SELECT k, 25*k*k AS lo,
                          CASE WHEN k = 63 THEN 1099511627776
                               ELSE 25*(k+1)*(k+1) - 1 END AS hi
                   FROM generate_series(0, 63) s(k)),
        e AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS cents FROM events)
        SELECT CAST(t.k AS BIGINT) AS tier, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(e.cents) AS BIGINT) AS sum_cents
        FROM e JOIN t ON e.cents BETWEEN t.lo AND t.hi
        GROUP BY t.k ORDER BY tier
        """,
    ),
    # fixed-width value histogram; values are nonnegative so DuckDB's
    # truncating // and numpy's flooring // agree on every bin
    "value_histogram": (
        R.q_value_histogram,
        """
        WITH t AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS cents FROM events)
        SELECT CAST(cents // 2000 AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS sum_cents
        FROM t GROUP BY bin ORDER BY bin
        """,
    ),
    # substring-level exact dedup REMOVAL (Lee et al. 2022): cleaned corpus
    # after deleting every word position covered by a corpus-duplicated
    # n-gram span (positional multiplicity).  Gram convention ==
    # ngram_jaccard (engine hashes the same gram string the SQL builds).
    "dedup_substrings": (
        D.q_dedup_substrings,
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents WHERE trim(text) <> ''),
        grams AS (
          SELECT doc_id, w, unnest(range(1, len(w) - 3)) AS i
          FROM toks WHERE len(w) >= 5),
        g2 AS (SELECT doc_id, i, array_to_string(w[i:i+4], ' ') AS g FROM grams),
        freq AS (SELECT g, COUNT(*) AS f FROM g2 GROUP BY g),
        dupstarts AS (SELECT doc_id, i FROM g2 JOIN freq USING (g) WHERE f >= 2),
        covered AS (SELECT DISTINCT doc_id, unnest(range(i, i + 5)) AS p FROM dupstarts),
        posns AS (SELECT doc_id, w, unnest(range(1, len(w) + 1)) AS p FROM toks),
        kept AS (
          SELECT posns.doc_id, p, w[p] AS word
          FROM posns ANTI JOIN covered USING (doc_id, p)),
        agg AS (
          SELECT doc_id, COUNT(*) AS n_kept,
                 string_agg(word, ' ' ORDER BY p) AS clean_text
          FROM kept GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.w) AS BIGINT) AS n_words,
               CAST(len(t.w) - COALESCE(a.n_kept, 0) AS BIGINT) AS n_removed,
               COALESCE(a.clean_text, '') AS clean_text
        FROM toks t LEFT JOIN agg a USING (doc_id)
        ORDER BY t.doc_id
        """,
    ),
    # streaming watermark semantics: arrival = the mix32 permutation,
    # watermark = running MAX(ts) - delay over arrival order, late events
    # dropped from their hour window.  The window function oracle checks
    # the whole scan; the engine never globally sorts (bucket prefix max)
    "watermark_windows": (
        R.q_watermark_windows,
        """
        WITH
        h1 AS (SELECT event_id, ts, (event_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM events),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hashed AS (SELECT event_id, ts, xor(_c, _c >> 13) AS h32 FROM h3),
        w AS (SELECT ts,
                     MAX(ts) OVER (ORDER BY h32, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prevmax
              FROM hashed),
        f AS (SELECT date_trunc('hour', ts) AS window_start,
                     (prevmax IS NOT NULL AND ts < prevmax - INTERVAL 5 MINUTE) AS late
              FROM w)
        SELECT window_start,
               CAST(COUNT(*) FILTER (NOT late) AS BIGINT) AS n_kept,
               CAST(COUNT(*) FILTER (late) AS BIGINT) AS n_late
        FROM f GROUP BY window_start ORDER BY window_start
        """,
    ),
    # Gopher quality rules (Rae et al. 2021 App. A) as exact-integer
    # cross-multiplied predicates; per-rule flags + final keep
    "gopher_filter": (
        D.q_gopher_filter,
        r"""
        WITH base AS (
          SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS w,
                 string_split(text, chr(10)) AS lines
          FROM documents WHERE trim(text) <> ''),
        c AS (
          SELECT doc_id,
            len(w) AS n_words,
            len(array_to_string(w, '')) AS total_word_chars,
            len(text) - len(replace(text, '#', '')) AS n_hash,
            (len(text) - len(replace(text, '...', ''))) // 3 AS n_ellipsis,
            len(lines) AS n_lines,
            len(list_filter(lines, x -> starts_with(ltrim(x, ' '), '-')
                                   OR starts_with(ltrim(x, ' '), chr(8226))
                                   OR starts_with(ltrim(x, ' '), '*'))) AS n_bullet_lines,
            len(list_filter(lines, x -> ends_with(rtrim(x, ' '), '...')
                                   OR ends_with(rtrim(x, ' '), chr(8230)))) AS n_ellipsis_lines,
            len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha_words,
            len(list_distinct(list_filter(list_transform(w, x -> lower(x)),
                x -> x IN ('the','be','to','of','and','that','have','with')))) AS n_stop
          FROM base)
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
          (n_words >= 50 AND n_words <= 100000) AS r_wordcount,
          (3 * n_words <= total_word_chars AND total_word_chars <= 10 * n_words) AS r_meanlen,
          (10 * (n_hash + n_ellipsis) <= n_words) AS r_symbol,
          (10 * n_bullet_lines < 9 * n_lines) AS r_bullet,
          (10 * n_ellipsis_lines < 3 * n_lines) AS r_ellipsis,
          (5 * n_alpha_words >= 4 * n_words) AS r_alpha,
          (n_stop >= 2) AS r_stop,
          (n_words >= 50 AND n_words <= 100000
           AND 3 * n_words <= total_word_chars AND total_word_chars <= 10 * n_words
           AND 10 * (n_hash + n_ellipsis) <= n_words
           AND 10 * n_bullet_lines < 9 * n_lines
           AND 10 * n_ellipsis_lines < 3 * n_lines
           AND 5 * n_alpha_words >= 4 * n_words
           AND n_stop >= 2) AS keep
        FROM c ORDER BY doc_id
        """,
    ),
    # per-doc n-gram novelty: grams seen by exactly one doc (count==1 ->
    # min(doc_id) IS the owner; no join back), gram identity = SipHash64
    "ngram_novelty": (
        D.q_ngram_novelty,
        r"""
        WITH toks AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
          FROM documents),
        grams AS (
          SELECT doc_id,
                 UNNEST(list_distinct(
                   [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                    FOR i IN range(1, len(w) - 1)])) AS g
          FROM toks WHERE len(w) >= 3),
        df AS (SELECT g, COUNT(*) AS nd FROM grams GROUP BY g),
        tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
                FROM grams GROUP BY doc_id),
        nov AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
                FROM grams JOIN df USING (g) WHERE nd = 1 GROUP BY doc_id)
        SELECT t.doc_id, t.n_grams, COALESCE(n.n_novel, 0) AS n_novel
        FROM tot t LEFT JOIN nov n USING (doc_id) ORDER BY t.doc_id
        """,
    ),
    # DSIR importance selection (Xie et al. 2023): exact-integer rational
    # importance weights (tgt freq minus raw freq, scaled 1e6, floor div),
    # keep docs with positive importance; target = the lang='en' slice
    "dsir_select": (
        D.q_dsir_select,
        r"""
        WITH toks AS (
          SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents WHERE trim(text) <> ''),
        cnt AS (SELECT tok, COUNT(*) AS raw_c,
                       SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tgt_c
                FROM toks GROUP BY tok),
        tots AS (SELECT SUM(raw_c) AS raw_tot, SUM(tgt_c) AS tgt_tot FROM cnt),
        w AS (SELECT tok,
                     COALESCE(CAST(tgt_c * 1000000 // NULLIF(tgt_tot, 0) AS BIGINT), 0)
                       - CAST(raw_c * 1000000 // raw_tot AS BIGINT) AS wt
              FROM cnt CROSS JOIN tots),
        doc_tok AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
        scores AS (SELECT d.doc_id,
                          CAST(SUM(d.n * COALESCE(w.wt, 0)) AS BIGINT) AS score,
                          CAST(SUM(d.n) AS BIGINT) AS n_tokens
                   FROM doc_tok d LEFT JOIN w USING (tok) GROUP BY d.doc_id)
        SELECT doc_id, score, n_tokens FROM scores
        WHERE score > 0 ORDER BY doc_id
        """,
    ),
    # learned centroid-difference classifier: exact-integer train+infer
    # (NB shape, rational weights instead of float log-probs); only
    # (tok, lang) pairs seen in training carry weight on either side
    "lang_classifier": (
        D.q_lang_classifier,
        r"""
        WITH toks AS (
          SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
          FROM documents WHERE trim(text) <> ''),
        cnt AS (SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY lang, tok),
        tot AS (SELECT lang, SUM(c) AS t FROM cnt GROUP BY lang),
        gcnt AS (SELECT tok, SUM(c) AS gc FROM cnt GROUP BY tok),
        gtot AS (SELECT SUM(c) AS gt FROM cnt),
        w AS (SELECT cnt.lang, cnt.tok,
                     CAST(c * 1000000 // t - gc * 1000000 // gt AS BIGINT) AS wt
              FROM cnt JOIN tot USING (lang)
                       JOIN gcnt ON cnt.tok = gcnt.tok CROSS JOIN gtot),
        doc_tok AS (SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok),
        scores AS (SELECT d.doc_id, w.lang, SUM(d.n * w.wt) AS score
                   FROM doc_tok d JOIN w USING (tok) GROUP BY d.doc_id, w.lang),
        grid AS (SELECT d.doc_id, l.lang
                 FROM (SELECT DISTINCT doc_id FROM toks) d
                 CROSS JOIN (SELECT DISTINCT lang FROM toks) l),
        sc2 AS (SELECT g.doc_id, g.lang, COALESCE(s.score, 0) AS score
                FROM grid g LEFT JOIN scores s USING (doc_id, lang)),
        pred AS (SELECT doc_id, lang AS pred_lang,
                        ROW_NUMBER() OVER (PARTITION BY doc_id
                                           ORDER BY score DESC, lang ASC) AS rn
                 FROM sc2)
        SELECT p.doc_id, d.lang, p.pred_lang
        FROM pred p JOIN documents d USING (doc_id)
        WHERE rn = 1 ORDER BY p.doc_id
        """,
    ),
    # deterministic epoch shuffle: dense global rank under (mix32, doc_id)
    # — the ROW_NUMBER oracle checks the PERMUTATION itself, not just
    # membership; engine side never globally sorts (bucket-offset
    # broadcast + per-partition local ranks)
    "corpus_shuffle": (
        D.q_corpus_shuffle,
        """
        WITH
        h1 AS (SELECT doc_id, (doc_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM documents),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hashed AS (SELECT doc_id, xor(_c, _c >> 13) AS h32 FROM h3)
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY h32, doc_id) - 1 AS BIGINT) AS pos
        FROM hashed ORDER BY pos
        """,
    ),
    # market-basket co-occurrence: the within-order self-join spelling;
    # engine generates pairs vectorized inside one order-hash partition
    # and combines by packed pair code (no join)
    "part_cooccurrence": (
        R.q_part_cooccurrence,
        """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS p1, b.l_partkey AS p2,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY p1, p2 HAVING COUNT(*) >= 2 ORDER BY p1, p2
        """,
    ),
    # set operations: INTERSECT + both EXCEPTs over two year-sets in one
    # engine pass (per-customer OR of side bits, one shuffle)
    "customer_year_setops": (
        R.q_customer_year_setops,
        """
        WITH a AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) = 1996),
             b AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE year(o_orderdate) = 1997)
        SELECT o_custkey, op FROM (
          SELECT o_custkey, 'both' AS op
          FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
          UNION ALL
          SELECT o_custkey, '1996_only'
          FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
          UNION ALL
          SELECT o_custkey, '1997_only'
          FROM (SELECT * FROM b EXCEPT SELECT * FROM a)
        ) ORDER BY o_custkey
        """,
    ),
    # key-space coverage audit: per-bucket gap counts vs a generated grid;
    # engine needs no generate_series join — bucket width is arithmetic
    "orderkey_gaps": (
        R.q_orderkey_gaps,
        """
        WITH m AS (SELECT MAX(o_orderkey) AS mx FROM orders),
        c AS (SELECT o_orderkey // 1024 AS bucket, COUNT(*) AS hi
              FROM orders WHERE CAST(ROUND(o_totalprice*100) AS BIGINT)
                               >= 30000000 GROUP BY 1)
        SELECT CAST(k AS BIGINT) AS bucket,
               CAST(LEAST(1024, mx + 1 - k*1024) - COALESCE(hi, 0) AS BIGINT)
                 AS n_missing
        FROM m CROSS JOIN UNNEST(range(0, CAST(mx // 1024 AS BIGINT) + 1)) AS s(k)
        LEFT JOIN c ON c.bucket = k
        ORDER BY bucket
        """,
    ),
    # full TPC-H Q5: two independent fkeys correlated by an equality
    # filter; supplier nation resolves via broadcast LUT batch-side
    "local_supplier_revenue": (
        R.q_local_supplier_revenue,
        """
        SELECT n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                        * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
                    AS BIGINT) AS revenue_cpc
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA' AND year(o_orderdate) = 1996
        GROUP BY n_name ORDER BY revenue_cpc DESC, n_name
        """,
    ),
    # running count-distinct growth curve: windowed COUNT(DISTINCT) in the
    # SQL spelling; first-seen min + prefix sum in the engine
    "cumulative_users": (
        R.q_cumulative_users,
        """
        WITH f AS (SELECT user_id,
                          CAST(MIN(date_trunc('hour', ts)) AS TIMESTAMP) AS hour
                   FROM events GROUP BY user_id),
        b AS (SELECT MIN(hour) AS lo, MAX(hour) AS hi FROM f),
        grid AS (SELECT CAST(UNNEST(generate_series(lo, hi,
                          INTERVAL 1 HOUR)) AS TIMESTAMP) AS hour FROM b),
        nn AS (SELECT hour, COUNT(*) AS n_new FROM f GROUP BY hour)
        SELECT g.hour,
               CAST(SUM(COALESCE(nn.n_new, 0))
                    OVER (ORDER BY g.hour) AS BIGINT) AS n_users
        FROM grid g LEFT JOIN nn USING (hour) ORDER BY g.hour
        """,
    ),
    # exact global median via two-pass distributed selection (histogram +
    # single-bin refine) — no global sort, no shuffle
    "global_median_price": (
        R.q_global_median_price,
        """
        SELECT CAST(quantile_disc(CAST(ROUND(l_extendedprice*100) AS BIGINT),
                                  0.5) AS BIGINT) AS median_cents,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        """,
    ),
    # windowed DISTINCT aggregate (trailing-5 rolling distinct count)
    "rolling_distinct_types": (
        R.q_rolling_distinct_types,
        """
        SELECT event_id, user_id,
               CAST(count(DISTINCT event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_types_5
        FROM events ORDER BY event_id
        """,
    ),
    # bag-semantics set ops (multiplicities matter): INTERSECT/EXCEPT ALL
    "value_bag_ops": (
        R.q_value_bag_ops,
        """
        WITH a AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS v FROM events
                   WHERE event_type = 'click'),
             b AS (SELECT CAST(ROUND(value*100) AS BIGINT) AS v FROM events
                   WHERE event_type = 'view')
        SELECT
          (SELECT COUNT(*) FROM
             (SELECT v FROM a INTERSECT ALL SELECT v FROM b)) AS n_intersect_all,
          (SELECT COUNT(*) FROM
             (SELECT v FROM a EXCEPT ALL SELECT v FROM b)) AS n_except_all
        """,
    ),
    # ratio_to_report in exact integer permille
    "nation_revenue_share": (
        R.q_nation_revenue_share,
        """
        WITH per_nat AS (
          SELECT n_name,
                 CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
          FROM orders JOIN customer ON o_custkey = c_custkey
                      JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name)
        SELECT n_name, revenue_cents,
               revenue_cents * 1000 // (SELECT SUM(revenue_cents) FROM per_nat)
                 AS share_pm
        FROM per_nat ORDER BY n_name
        """,
    ),
    # RANK() window over an aggregated table (window-over-groupby)
    "nation_rank_in_region": (
        R.q_nation_rank_in_region,
        """
        WITH per_nat AS (
          SELECT r_name, n_name, COUNT(*) AS n_customers
          FROM customer JOIN nation ON c_nationkey = n_nationkey
                        JOIN region ON n_regionkey = r_regionkey
          GROUP BY r_name, n_name)
        SELECT r_name, n_name, n_customers,
               CAST(RANK() OVER (PARTITION BY r_name
                                 ORDER BY n_customers DESC) AS BIGINT) AS rk
        FROM per_nat ORDER BY r_name, n_customers DESC, n_name
        """,
    ),
    # custom decomposable aggregate: bitwise OR of event-type bits
    "user_event_bitmask": (
        R.q_user_event_bitmask,
        """
        WITH m AS (SELECT user_id,
               CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                    WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                    WHEN 'view' THEN 16 END AS bit FROM events)
        SELECT user_id, CAST(BIT_OR(bit) AS BIGINT) AS type_mask,
               CAST(bit_count(BIT_OR(bit)) AS BIGINT) AS n_types
        FROM m GROUP BY user_id ORDER BY user_id
        """,
    ),
    # DENSE_RANK <= 3 with ties all qualifying
    "top_orders_with_ties": (
        R.q_top_orders_with_ties,
        """
        WITH c AS (SELECT o_orderkey, o_orderpriority,
                          CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents
                   FROM orders)
        SELECT o_orderpriority, o_orderkey, total_cents FROM c
        QUALIFY dense_rank() OVER
          (PARTITION BY o_orderpriority ORDER BY total_cents DESC) <= 3
        ORDER BY o_orderpriority, total_cents DESC, o_orderkey
        """,
    ),
    # windowed conditional carry-forward (CASE-masked running MAX)
    "last_purchase_gap": (
        R.q_last_purchase_gap,
        """
        SELECT event_id, user_id,
          (epoch_us(ts) - epoch_us(
             max(CASE WHEN event_type = 'purchase' THEN ts END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           )) // 1000000 AS gap_s
        FROM events ORDER BY event_id
        """,
    ),
    # grouped 3-sigma outliers via exact integer cross-multiplication
    "value_outliers": (
        R.q_value_outliers,
        """
        WITH v AS (SELECT event_id, event_type,
                          CAST(ROUND(value*100) AS BIGINT) AS c FROM events),
        g AS (SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS HUGEINT) AS s,
                     CAST(SUM(CAST(c AS HUGEINT)*c) AS HUGEINT) AS q
              FROM v GROUP BY event_type)
        SELECT event_id, event_type, c AS value_cents
        FROM v JOIN g USING (event_type)
        WHERE (CAST(c AS HUGEINT)*n - s)*(CAST(c AS HUGEINT)*n - s)
              > 9*(n*q - s*s)
        ORDER BY event_id
        """,
    ),
    # winsorized grouped mean; clip bounds are index-exact order statistics
    "winsorized_value_stats": (
        R.q_winsorized_value_stats,
        """
        WITH v AS (SELECT event_type, CAST(ROUND(value*100) AS BIGINT) AS c
                   FROM events),
        r AS (SELECT event_type, c,
                     ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) - 1 AS rk,
                     COUNT(*) OVER (PARTITION BY event_type) AS n FROM v),
        b AS (SELECT event_type, ANY_VALUE(n) AS n,
                     MAX(CASE WHEN rk = (n-1)//20 THEN c END) AS lo_cents,
                     MAX(CASE WHEN rk = 19*(n-1)//20 THEN c END) AS hi_cents
              FROM r GROUP BY event_type),
        w AS (SELECT v.event_type,
                     CASE WHEN c < lo_cents THEN lo_cents
                          WHEN c > hi_cents THEN hi_cents ELSE c END AS cw
              FROM v JOIN b USING (event_type))
        SELECT w.event_type, b.n, b.lo_cents, b.hi_cents,
               CAST(SUM(cw) AS BIGINT) AS wsum_cents,
               CAST(SUM(cw) // b.n AS BIGINT) AS wmean_cents
        FROM w JOIN b USING (event_type)
        GROUP BY w.event_type, b.n, b.lo_cents, b.hi_cents
        ORDER BY event_type
        """,
    ),
    # deterministic weighted sampling: rational hash/weight priority
    "weighted_sample": (
        D.q_weighted_sample,
        """
        WITH h1 AS (SELECT doc_id, n_chars,
                           (doc_id % 2147483648) * 2654435761 % 4294967296 AS _a
                    FROM documents WHERE n_chars > 0),
        h2 AS (SELECT *, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT *, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hashed AS (SELECT doc_id, n_chars, xor(_c, _c >> 13) AS h32 FROM h3),
        p AS (SELECT doc_id, n_chars, (h32 * 1024) // n_chars AS priority FROM hashed)
        SELECT doc_id, n_chars, priority FROM p
        ORDER BY priority, doc_id LIMIT 20
        """,
    ),
    # TPC-H Q18: HAVING on the pre-aggregated fact BEFORE any join
    "large_volume_orders": (
        R.q_large_volume_orders,
        """
        WITH q AS (
          SELECT l_orderkey,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 300)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_cents, sum_qty
        FROM q JOIN orders ON l_orderkey = o_orderkey
               JOIN customer ON o_custkey = c_custkey
        ORDER BY total_cents DESC, o_orderkey LIMIT 100
        """,
    ),
    # TPC-H Q16: COUNT(DISTINCT supplier) per part type across a join
    "suppliers_per_type": (
        R.q_suppliers_per_type,
        """
        WITH pairs AS (
          SELECT DISTINCT p_type, l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand <> 'Brand#1')
        SELECT p_type, COUNT(*) AS supplier_cnt FROM pairs GROUP BY p_type
        ORDER BY supplier_cnt DESC, p_type
        """,
    ),
    # TPC-H Q21: EXISTS/NOT-EXISTS double correlation as per-order flags
    "sole_fault_suppliers": (
        R.q_sole_fault_suppliers,
        """
        WITH pair AS (
          SELECT l_orderkey, l_suppkey,
                 MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
          FROM lineitem GROUP BY l_orderkey, l_suppkey),
        o AS (SELECT l_orderkey, COUNT(*) AS n_supp, SUM(r) AS n_fault
              FROM pair GROUP BY l_orderkey),
        culprit AS (
          SELECT p.l_suppkey FROM pair p JOIN o USING (l_orderkey)
          WHERE o.n_supp > 1 AND o.n_fault = 1 AND p.r = 1)
        SELECT l_suppkey AS s_suppkey, COUNT(*) AS numwait
        FROM culprit GROUP BY l_suppkey
        ORDER BY numwait DESC, s_suppkey LIMIT 10
        """,
    ),
    # TPC-H Q7: revenue matrix between supplier and customer nations
    "nation_trade_matrix": (
        R.q_nation_trade_matrix,
        """
        WITH rev AS (
          SELECT l_orderkey, s_nationkey AS supp_nat,
                 SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS r
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY l_orderkey, s_nationkey)
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(SUM(r) AS BIGINT) AS revenue_cpc
        FROM rev JOIN orders ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation sn ON supp_nat = sn.n_nationkey
                 JOIN nation cn ON c_nationkey = cn.n_nationkey
        GROUP BY supp_nation, cust_nation ORDER BY supp_nation, cust_nation
        """,
    ),
    # UNPIVOT: wide-to-long inverse of event_pivot — the oracle UNPIVOTs
    # DuckDB's own conditional-agg pivot, pinning the round trip
    "event_unpivot": (
        R.q_event_unpivot,
        """
        WITH wide AS (
          SELECT user_id,
                 COUNT(*) FILTER (WHERE event_type = 'click') AS click,
                 COUNT(*) FILTER (WHERE event_type = 'error') AS error,
                 COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                 COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
                 COUNT(*) FILTER (WHERE event_type = 'view') AS view
          FROM events GROUP BY user_id)
        SELECT user_id, event_type, CAST(n AS BIGINT) AS n
        FROM wide
        UNPIVOT (n FOR event_type IN (click, error, purchase, signup, view))
        WHERE n > 0
        ORDER BY user_id, event_type
        """,
    ),
    # TPC-H Q14: CASE-inside-aggregate ratio, exact integer permille
    "promo_revenue_share": (
        R.q_promo_revenue_share,
        """
        WITH rev AS (
          SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS r,
                 p_type
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-09-01'
            AND l_shipdate <  TIMESTAMP '1997-10-01')
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 END) AS BIGINT) AS promo_cpc,
               CAST(SUM(r) AS BIGINT) AS total_cpc,
               CAST(1000 * SUM(CASE WHEN p_type = 'PROMO' THEN r ELSE 0 END)
                    // GREATEST(SUM(r), 1) AS BIGINT) AS promo_pm
        FROM rev
        """,
    ),
    # TPC-H Q13: count-of-counts distribution including the zero bucket
    "order_count_distribution": (
        R.q_order_count_distribution,
        """
        WITH oc AS (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
        SELECT CAST(c_count AS BIGINT) AS c_count,
               CAST(COUNT(*) AS BIGINT) AS custdist
        FROM oc GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
        """,
    ),
    # TPC-H Q15: argmax-with-ties over an aggregated view
    "top_supplier": (
        R.q_top_supplier,
        """
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
                   AS total_rev_cpc
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate <  TIMESTAMP '1997-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_rev_cpc
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_rev_cpc = (SELECT MAX(total_rev_cpc) FROM rev)
        ORDER BY s_suppkey
        """,
    ),
    # TPC-H Q22: global-scalar gate + NOT EXISTS anti join + code rollup
    "global_sales_opportunity": (
        R.q_global_sales_opportunity,
        """
        WITH pos AS (
          SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM customer WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > 0),
        eligible AS (
          SELECT c_custkey % 7 AS code,
                 CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal
          FROM customer, pos
          WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * pos.n > pos.s
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderdate >= TIMESTAMP '1999-01-01'))
        SELECT code, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(bal) AS BIGINT) AS totacctbal_cents
        FROM eligible GROUP BY code ORDER BY code
        """,
    ),
    # TPC-H Q8: national market share per order year, exact permille
    "market_share": (
        R.q_market_share,
        """
        WITH rev AS (
          SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                 CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS vol,
                 s_nationkey
          FROM lineitem
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation   ON c_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE r_name = 'AMERICA')
        SELECT CAST(o_year AS BIGINT) AS o_year,
               CAST(SUM(CASE WHEN s_nationkey = 1 THEN vol ELSE 0 END) AS BIGINT)
                 AS target_cpc,
               CAST(SUM(vol) AS BIGINT) AS total_cpc,
               CAST(SUM(CASE WHEN s_nationkey = 1 THEN vol ELSE 0 END) * 1000
                    // GREATEST(SUM(vol), 1) AS BIGINT) AS mkt_share_pm
        FROM rev GROUP BY o_year ORDER BY o_year
        """,
    ),
    # TPC-H Q17: correlated per-part mean gate via cross-multiplication
    "small_quantity_revenue": (
        R.q_small_quantity_revenue,
        """
        WITH li AS (
          SELECT l_partkey, CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                 CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#3'),
        stats AS (
          SELECT l_partkey, SUM(qty) AS sq, COUNT(*) AS n
          FROM li GROUP BY l_partkey)
        SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents,
               CAST(COUNT(*) AS BIGINT) AS n_small
        FROM li JOIN stats USING (l_partkey)
        WHERE qty * 5 * n < sq
        """,
    ),
    # TPC-H Q19: disjunctive (brand, size, qty) predicate triples
    "disjunctive_revenue": (
        R.q_disjunctive_revenue,
        """
        WITH li AS (
          SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) AS r,
                 CAST(ROUND(l_quantity) AS BIGINT) AS q, p_brand, p_size
          FROM lineitem JOIN part ON l_partkey = p_partkey)
        SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS revenue_cpc,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM li
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND q BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25 AND q BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50 AND q BETWEEN 20 AND 35)
        """,
    ),
    # ordered-sequence funnel: each stage requires a STRICTLY later event
    "ordered_funnel": (
        R.q_ordered_funnel,
        """
        WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN v USING (user_id)
              WHERE event_type = 'click' AND ts > t1 GROUP BY e.user_id),
        p AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e JOIN c USING (user_id)
              WHERE event_type = 'purchase' AND ts > t2 GROUP BY e.user_id)
        SELECT stage, n_users FROM (
          SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
          UNION ALL
          SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
          UNION ALL
          SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p)
        ORDER BY stage
        """,
    ),
    # Heaps-law curve: cumulative bigram vocabulary per 25-doc prefix
    "vocab_growth": (
        D.q_vocab_growth,
        """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS i
          FROM documents),
        bg AS (
          SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram
          FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1),
        firsts AS (
          SELECT bigram, MIN(doc_id // 25) AS b FROM bg GROUP BY bigram)
        SELECT CAST(b AS BIGINT) AS bucket,
               CAST(SUM(COUNT(*)) OVER (ORDER BY b) AS BIGINT) AS vocab_size
        FROM firsts GROUP BY b ORDER BY bucket
        """,
    ),
    # hopping windows: 10-min span, 5-min hop — each event in two windows
    "hopping_window_counts": (
        R.q_hopping_window_counts,
        """
        WITH hops AS (SELECT unnest([0, 1]) AS k),
        x AS (
          SELECT event_type,
                 to_timestamp((epoch_us(ts) // 300000000 - k) * 300000000
                              // 1000000)::TIMESTAMP AS window_start
          FROM events, hops
          WHERE epoch_us(ts) - (epoch_us(ts) // 300000000 - k) * 300000000
                < 600000000)
        SELECT event_type, window_start, CAST(COUNT(*) AS BIGINT) AS n
        FROM x GROUP BY event_type, window_start
        ORDER BY event_type, window_start
        """,
    ),
    # TPC-H Q9: part-class revenue cube by supplier nation x order year
    "product_type_profit": (
        R.q_product_type_profit,
        """
        SELECT n_name,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                    * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
                 AS revenue_cpc
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_type = 'PROMO'
        GROUP BY n_name, o_year ORDER BY n_name, o_year
        """,
    ),
    # grouped DISTINCT list agg: sorted type signature per user
    "user_type_signature": (
        R.q_user_type_signature,
        """
        SELECT user_id,
               string_agg(DISTINCT event_type, ',' ORDER BY event_type)
                 AS signature
        FROM events GROUP BY user_id ORDER BY user_id
        """,
    ),
    # time-weighted average: step-function integral, exact floor division
    "time_weighted_value": (
        R.q_time_weighted_value,
        """
        WITH o AS (
          SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS v,
                 epoch_us(ts) AS t,
                 LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS nxt
          FROM events)
        SELECT user_id,
               CAST(SUM(CASE WHEN nxt IS NULL THEN 0 ELSE v * (nxt - t) END)
                    AS BIGINT) AS weighted_sum,
               CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us,
               CAST(SUM(CASE WHEN nxt IS NULL THEN 0 ELSE v * (nxt - t) END)
                    // GREATEST(MAX(t) - MIN(t), 1) AS BIGINT) AS twa_cents
        FROM o GROUP BY user_id ORDER BY user_id
        """,
    ),
    # local clustering coefficient per node (wedge closure, permille)
    "local_clustering": (
        G.q_local_clustering,
        """
        WITH pairs AS (
          SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                          GREATEST(a.l_partkey, b.l_partkey) AS b
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey),
        sym AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
        deg AS (SELECT x AS node, COUNT(*) AS deg FROM sym GROUP BY x),
        tri AS (SELECT s1.x AS node, COUNT(*) AS triangles
                FROM sym s1 JOIN sym s2 ON s1.x = s2.x AND s1.y < s2.y
                JOIN pairs e ON e.a = s1.y AND e.b = s2.y
                GROUP BY s1.x)
        SELECT CAST(d.node AS BIGINT) AS node, CAST(d.deg AS BIGINT) AS deg,
               CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
               CAST(CASE WHEN d.deg >= 2
                    THEN 2000 * COALESCE(t.triangles, 0) // (d.deg * (d.deg - 1))
                    ELSE 0 END AS BIGINT) AS lcc_pm
        FROM deg d LEFT JOIN tri t ON d.node = t.node ORDER BY node
        """,
    ),
    # LAG over an aggregated series: week-over-week revenue delta
    "weekly_revenue_delta": (
        R.q_weekly_revenue_delta,
        """
        WITH w AS (
          SELECT date_trunc('week', o_orderdate) AS week_start,
                 CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
          FROM orders GROUP BY week_start)
        SELECT CAST(week_start AS TIMESTAMP) AS week_start, revenue_cents,
               CAST(COALESCE(revenue_cents - LAG(revenue_cents)
                    OVER (ORDER BY week_start), 0) AS BIGINT) AS delta_cents
        FROM w ORDER BY week_start
        """,
    ),
    # contingency table with exact integer chi-square building blocks
    "type_dow_contingency": (
        R.q_type_dow_contingency,
        """
        WITH cells AS (
          SELECT event_type, CAST(isodow(ts) AS BIGINT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS obs
          FROM events GROUP BY event_type, dow),
        tot AS (SELECT SUM(obs) AS n FROM cells),
        r AS (SELECT event_type, SUM(obs) AS row_t FROM cells GROUP BY event_type),
        c AS (SELECT dow, SUM(obs) AS col_t FROM cells GROUP BY dow)
        SELECT cells.event_type, cells.dow, obs,
               CAST(row_t * col_t AS BIGINT) AS row_x_col,
               CAST(n * obs - row_t * col_t AS BIGINT) AS dev_xn
        FROM cells JOIN r USING (event_type) JOIN c USING (dow) CROSS JOIN tot
        ORDER BY event_type, dow
        """,
    ),
    # bounded-round k-core peeling (4 unrolled filter-and-recount rounds)
    "k_core": (
        G.q_k_core,
        """
        WITH pairs AS (
          SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                          GREATEST(a.l_partkey, b.l_partkey) AS b
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey),
        sym AS (SELECT a AS x, b AS y FROM pairs UNION ALL SELECT b, a FROM pairs),
        d0 AS (SELECT x AS node, COUNT(*) AS deg FROM sym GROUP BY x),
        s1 AS (SELECT node FROM d0 WHERE deg >= 80),
        d1 AS (SELECT x AS node, COUNT(*) AS deg FROM sym
               WHERE x IN (SELECT node FROM s1) AND y IN (SELECT node FROM s1)
               GROUP BY x),
        s2 AS (SELECT node FROM d1 WHERE deg >= 80),
        d2 AS (SELECT x AS node, COUNT(*) AS deg FROM sym
               WHERE x IN (SELECT node FROM s2) AND y IN (SELECT node FROM s2)
               GROUP BY x),
        s3 AS (SELECT node FROM d2 WHERE deg >= 80),
        d3 AS (SELECT x AS node, COUNT(*) AS deg FROM sym
               WHERE x IN (SELECT node FROM s3) AND y IN (SELECT node FROM s3)
               GROUP BY x),
        s4 AS (SELECT node FROM d3 WHERE deg >= 80),
        d4 AS (SELECT x AS node, COUNT(*) AS deg FROM sym
               WHERE x IN (SELECT node FROM s4) AND y IN (SELECT node FROM s4)
               GROUP BY x)
        SELECT CAST(node AS BIGINT) AS node, CAST(deg AS BIGINT) AS deg
        FROM d4 ORDER BY node
        """,
    ),
    # grouped top-k into a LIST column (value-determined, tie-safe)
    "user_top3_values": (
        R.q_user_top3_values,
        """
        WITH r AS (
          SELECT user_id, CAST(ROUND(value*100) AS BIGINT) AS v,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY CAST(ROUND(value*100) AS BIGINT) DESC) AS rn
          FROM events)
        SELECT user_id, string_agg(v, ',' ORDER BY v DESC) AS top3_csv
        FROM r WHERE rn <= 3 GROUP BY user_id ORDER BY user_id
        """,
    ),
    # closed-form 4-ary hierarchy rollup: 3 ancestor levels, no recursion
    "part_hierarchy_rollup": (
        R.q_part_hierarchy_rollup,
        """
        WITH anc AS (
          SELECT p_partkey // 4 AS ancestor,
                 CAST(ROUND(p_retailprice*100) AS BIGINT) AS cents FROM part
          UNION ALL
          SELECT p_partkey // 16, CAST(ROUND(p_retailprice*100) AS BIGINT) FROM part
          UNION ALL
          SELECT p_partkey // 64, CAST(ROUND(p_retailprice*100) AS BIGINT) FROM part)
        SELECT CAST(ancestor AS BIGINT) AS ancestor,
               CAST(SUM(cents) AS BIGINT) AS subtree_cents,
               CAST(COUNT(*) AS BIGINT) AS n_desc
        FROM anc WHERE ancestor >= 1 GROUP BY ancestor ORDER BY ancestor
        """,
    ),
    # RAG chunking: overlapping token windows, byte-exact rebuilt text
    "rag_chunking": (
        D.q_rag_chunking,
        """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) - 1
                   AS i
          FROM documents),
        nt AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        cand AS (
          SELECT doc_id, tok, i, (i // 24) - k AS c
          FROM tok, (SELECT unnest([0, 1]) AS k)
          WHERE (i // 24) - k >= 0 AND i - ((i // 24) - k) * 24 < 32),
        chunks AS (
          SELECT doc_id, c AS chunk_idx, MIN(i) AS start_tok,
                 CAST(COUNT(*) AS BIGINT) AS n_toks,
                 string_agg(tok, ' ' ORDER BY i) AS chunk_text
          FROM cand GROUP BY doc_id, c)
        SELECT chunks.doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(start_tok AS BIGINT) AS start_tok, n_toks, chunk_text
        FROM chunks JOIN nt ON chunks.doc_id = nt.doc_id
        WHERE chunk_idx <= CASE WHEN n <= 32 THEN 0 ELSE (n - 9) // 24 END
        ORDER BY chunks.doc_id, chunk_idx
        """,
    ),
    # rolling z-score anomalies: exact integer cross-multiplied inequality
    "rolling_anomalies": (
        R.q_rolling_anomalies,
        """
        WITH w AS (
          SELECT event_id, user_id, CAST(ROUND(value*100) AS BIGINT) AS v_cents,
                 SUM(CAST(ROUND(value*100) AS BIGINT)) OVER win AS sum5,
                 SUM(CAST(ROUND(value*100) AS BIGINT)
                     * CAST(ROUND(value*100) AS BIGINT)) OVER win AS ssq5,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id, v_cents,
               CAST(sum5 AS BIGINT) AS sum5, CAST(ssq5 AS BIGINT) AS ssq5
        FROM w
        WHERE rn >= 5
          AND (5*v_cents - sum5)*(5*v_cents - sum5) > 3*(5*ssq5 - sum5*sum5)
        ORDER BY event_id
        """,
    ),
    # OHLC candlesticks: order-dependent open/close + extrema per bucket
    "hourly_ohlc": (
        R.q_hourly_ohlc,
        """
        WITH v AS (
          SELECT event_type, date_trunc('hour', ts) AS hour,
                 CAST(ROUND(value*100) AS BIGINT) AS v, ts, event_id
          FROM events),
        w AS (
          SELECT event_type, hour, v,
                 FIRST_VALUE(v) OVER win AS o, LAST_VALUE(v) OVER win AS c
          FROM v
          WINDOW win AS (PARTITION BY event_type, hour ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND UNBOUNDED FOLLOWING))
        SELECT event_type, hour,
               CAST(MIN(o) AS BIGINT) AS open, CAST(MAX(v) AS BIGINT) AS high,
               CAST(MIN(v) AS BIGINT) AS low, CAST(MIN(c) AS BIGINT) AS close,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM w GROUP BY event_type, hour
        ORDER BY event_type, hour
        """,
    ),
    # funnel latency histogram: signup -> first later purchase, in hours
    "purchase_latency": (
        R.q_purchase_latency,
        """
        WITH s AS (SELECT user_id, MIN(ts) AS t1 FROM events
                   WHERE event_type = 'signup' GROUP BY user_id),
        p AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e JOIN s USING (user_id)
              WHERE event_type = 'purchase' AND ts > t1 GROUP BY e.user_id)
        SELECT CAST((epoch_us(t2) - epoch_us(t1)) // 3600000000 AS BIGINT)
                 AS latency_h,
               CAST(COUNT(*) AS BIGINT) AS n_users
        FROM p JOIN s USING (user_id)
        GROUP BY latency_h ORDER BY latency_h
        """,
    ),
    # decile lift table: NTILE over a per-customer aggregate, exact shares
    "customer_decile_lift": (
        R.q_customer_decile_lift,
        """
        WITH spend AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM orders GROUP BY o_custkey),
        cut AS (
          SELECT o_custkey, cents,
                 NTILE(10) OVER (ORDER BY cents DESC, o_custkey) AS decile
          FROM spend),
        d AS (
          SELECT CAST(decile AS BIGINT) AS decile,
                 CAST(COUNT(*) AS BIGINT) AS n_cust,
                 CAST(SUM(cents) AS BIGINT) AS decile_cents
          FROM cut GROUP BY decile),
        tot AS (SELECT SUM(decile_cents) AS t FROM d)
        SELECT decile, n_cust, decile_cents,
               CAST(decile_cents * 1000 // GREATEST(t, 1) AS BIGINT) AS share_pm
        FROM d CROSS JOIN tot ORDER BY decile
        """,
    ),
    # reset-at-zero running balance: the cummin closed form, two windows
    "part_stock_floor": (
        R.q_part_stock_floor,
        """
        WITH d AS (
          SELECT l_partkey, l_orderkey,
                 CAST(l_linenumber AS BIGINT) AS l_linenumber, l_shipdate,
                 CASE WHEN l_returnflag = 'R'
                      THEN -CAST(ROUND(l_quantity) AS BIGINT)
                      ELSE CAST(ROUND(l_quantity) AS BIGINT) END AS delta
          FROM lineitem),
        c1 AS (SELECT *, SUM(delta) OVER (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber) AS cum FROM d),
        c2 AS (SELECT *, MIN(cum) OVER (PARTITION BY l_partkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber) AS cmin FROM c1)
        SELECT l_partkey, l_orderkey, l_linenumber,
               CAST(cum - LEAST(cmin, 0) AS BIGINT) AS balance
        FROM c2 ORDER BY l_partkey, l_orderkey, l_linenumber
        """,
    ),
    # per-group argmax with deterministic ties: modal event type
    "user_modal_type": (
        R.q_user_modal_type,
        """
        WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY user_id, event_type),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY n DESC, event_type) AS rn FROM c)
        SELECT user_id, event_type AS modal_type, n
        FROM r WHERE rn = 1 ORDER BY user_id
        """,
    ),
    # cross-series Pearson building blocks, zero-filled hour grid
    "type_correlation_matrix": (
        R.q_type_correlation_matrix,
        """
        WITH cells AS (
          SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY h, event_type),
        hours AS (SELECT DISTINCT h AS hh FROM cells),
        types AS (SELECT DISTINCT event_type AS t FROM cells),
        grid AS (
          SELECT hh, t, COALESCE(n, 0) AS n
          FROM hours CROSS JOIN types
          LEFT JOIN cells ON cells.h = hours.hh AND cells.event_type = types.t),
        pairs AS (SELECT a.t AS type_a, b.t AS type_b
                  FROM types a JOIN types b ON a.t < b.t),
        j AS (SELECT p.type_a, p.type_b, ga.n AS x, gb.n AS y
              FROM pairs p
              JOIN grid ga ON ga.t = p.type_a
              JOIN grid gb ON gb.t = p.type_b AND gb.hh = ga.hh)
        SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sum_x, CAST(SUM(y) AS BIGINT) AS sum_y,
               CAST(SUM(x*y) AS BIGINT) AS sum_xy,
               CAST(SUM(x*x) AS BIGINT) AS sum_xx,
               CAST(SUM(y*y) AS BIGINT) AS sum_yy
        FROM j GROUP BY type_a, type_b ORDER BY type_a, type_b
        """,
    ),
    # schema-evolution hop: split-write + union-read pinned to the base table
    "schema_evolution_counts": (
        R.q_schema_evolution_counts,
        """
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(props) FILTER (WHERE event_id % 2 = 0) AS BIGINT)
                 AS n_props
        FROM events GROUP BY event_type ORDER BY event_type
        """,
    ),
    # TPC-H Q10: returned-item revenue ranking with customer details
    "returned_item_ranking": (
        R.q_returned_item_ranking,
        """
        WITH rev AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                      * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS BIGINT)
                   AS revenue_cpc
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE l_returnflag = 'R'
            AND o_orderdate >= TIMESTAMP '1995-10-01'
            AND o_orderdate <  TIMESTAMP '1996-01-01'
          GROUP BY o_custkey)
        SELECT c_custkey, c_name, revenue_cpc,
               CAST(ROUND(c_acctbal*100) AS BIGINT) AS acctbal_cents, n_name
        FROM rev JOIN customer ON o_custkey = c_custkey
                 JOIN nation ON c_nationkey = n_nationkey
        ORDER BY revenue_cpc DESC, c_custkey LIMIT 20
        """,
    ),
    # sketch-valued incremental view: HLL blobs folded by register max
    # (rows-only: the estimate has no SQL form; register-identity and
    # accuracy pinned in tests/test_stores-family tests)
    "incremental_hll_users": (R.q_incremental_hll_users, None),
    # TPC-H Q12: lateness CASE-aggregation per priority class
    "late_shipments": (
        R.q_late_shipments,
        """
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'high' ELSE 'other' END AS priority_class,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(COUNT(*) FILTER (
                 WHERE CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE) > 90)
                 AS BIGINT) AS n_late
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY priority_class ORDER BY priority_class
        """,
    ),
    # collocations: exact-integer PMI surrogate ranking (monotone in the
    # log argument; HUGEINT floor division both sides)
    "bigram_pmi": (
        D.q_bigram_pmi,
        """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 CAST(generate_subscripts(string_split(text, ' '), 1) AS BIGINT) AS i
          FROM documents),
        uni AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
        n AS (SELECT COUNT(*) AS total FROM tok),
        bg AS (SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS pn
               FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
               GROUP BY t1, t2)
        SELECT t1, t2, CAST(pn AS BIGINT) AS pair_n,
               CAST((pn::HUGEINT * total * 1000000)
                    // (ua.c::HUGEINT * ub.c) AS BIGINT) AS pmi_score
        FROM bg JOIN uni ua ON ua.tok = t1 JOIN uni ub ON ub.tok = t2
        CROSS JOIN n
        ORDER BY pmi_score DESC, t1, t2 LIMIT 20
        """,
    ),
    # Delta-hop parity WITH partition pruning: daily click/purchase counts
    # through a hive-partitioned Delta table; the re-read plans only the
    # two filtered partitions' files (sources/delta.py)
    "events_delta": (
        R.q_events_delta,
        """
        SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type, day
        ORDER BY event_type, day
        """,
    ),
    # integer exponential time-decay aggregate (half-life 30 days as a
    # right shift — exact on both engines, unlike float exp decay)
    "decayed_revenue": (
        R.q_decayed_revenue,
        """
        WITH ref AS (SELECT MAX(o_orderdate) AS r FROM orders)
        SELECT o_orderpriority,
               SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)
                   >> LEAST(date_diff('day', o_orderdate, r) // 30, 62))
                 AS decayed_cents
        FROM orders, ref
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    ),
    # grouped lower median of a LAG-derived series (consecutive-order gaps)
    "median_order_gap": (
        R.q_median_order_gap,
        """
        WITH o AS (
          SELECT o_custkey, o_orderdate,
                 LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey)
                   AS prev
          FROM orders
        ), g AS (
          SELECT o_custkey,
                 CAST(date_diff('day', prev, o_orderdate) AS BIGINT) AS gap
          FROM o WHERE prev IS NOT NULL
        )
        SELECT o_custkey,
               CAST(quantile_disc(gap, 0.5) AS BIGINT) AS median_gap_days
        FROM g GROUP BY o_custkey ORDER BY o_custkey
        """,
    ),
    # Iceberg-hop parity with partition pruning: per-type rollup through
    # an identity-partitioned Iceberg v1 table (Avro manifests)
    "events_iceberg": (
        R.q_events_iceberg,
        """
        SELECT event_type, COUNT(*) AS n,
               MIN(event_id) AS min_id, MAX(event_id) AS max_id,
               SUM(CAST(FLOOR(value*100) AS BIGINT)) AS sum_cents
        FROM events WHERE event_type IN ('view', 'error')
        GROUP BY event_type ORDER BY event_type
        """,
    ),
    # sessionize -> first-touch attribution -> exact-permille bounce rate
    "session_bounce_rate": (
        R.q_session_bounce_rate,
        """
        WITH o AS (
          SELECT user_id, event_type, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, event_type, ts, event_id,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
          FROM o
        ), per AS (
          SELECT user_id, sid,
                 FIRST_VALUE(event_type) OVER (
                   PARTITION BY user_id, sid ORDER BY ts, event_id) AS entry,
                 COUNT(*) OVER (PARTITION BY user_id, sid) AS n_ev
          FROM s
        ), one AS (
          SELECT DISTINCT user_id, sid, entry, n_ev FROM per
        )
        SELECT entry AS entry_type, COUNT(*) AS n_sessions,
               COUNT(*) FILTER (WHERE n_ev = 1) AS n_bounce,
               COUNT(*) FILTER (WHERE n_ev = 1) * 1000 // COUNT(*)
                 AS bounce_pm
        FROM one GROUP BY entry ORDER BY entry
        """,
    ),
    # nine exact deciles from ONE shared histogram selection
    "price_deciles": (
        R.q_price_deciles,
        """
        WITH pc AS (SELECT CAST(ROUND(o_totalprice*100) AS BIGINT) AS cents
                    FROM orders),
        q AS (SELECT quantile_disc(cents,
                [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS dv FROM pc)
        SELECT CAST(generate_subscripts(dv, 1) AS BIGINT) AS decile,
               UNNEST(dv) AS cents
        FROM q ORDER BY decile
        """,
    ),
    # quantity-weighted median of lineitem price: smallest v where the
    # cumulative weight of prices <= v reaches half the total
    "weighted_median_price": (
        R.q_weighted_median_price,
        """
        WITH x AS (
          SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c,
                 CAST(l_quantity AS BIGINT) AS q
          FROM lineitem
        ), s AS (
          SELECT c, SUM(q) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum
          FROM x
        ), t AS (SELECT SUM(q) AS total FROM x)
        SELECT MIN(c) AS weighted_median_cents,
               (SELECT total FROM t) AS total_qty
        FROM s WHERE 2 * cum >= (SELECT total FROM t)
        """,
    ),
    # regex-extraction parity: first embedded integer via RE2 on BOTH
    # engines (Arrow extract_regex vs DuckDB regexp_extract)
    "props_regex": (
        R.q_props_regex,
        """
        SELECT event_type,
               COUNT(CAST(regexp_extract(props, '\\d+') AS BIGINT)) AS n,
               SUM(CAST(regexp_extract(props, '\\d+') AS BIGINT)) AS sum_v,
               MAX(CAST(regexp_extract(props, '\\d+') AS BIGINT)) AS max_v
        FROM events GROUP BY event_type ORDER BY event_type
        """,
    ),
    # exact Gini-Simpson diversity (rational, unlike Shannon entropy)
    "user_diversity": (
        R.q_user_diversity,
        """
        WITH c AS (
          SELECT user_id, event_type, COUNT(*) AS cnt
          FROM events GROUP BY user_id, event_type
        ), u AS (
          SELECT user_id, SUM(cnt) AS n, SUM(cnt*cnt) AS sumsq
          FROM c GROUP BY user_id
        )
        SELECT user_id, CAST(n AS BIGINT) AS n_events,
               CAST(1000 - (1000 * sumsq) // (n * n) AS BIGINT)
                 AS diversity_pm
        FROM u WHERE n >= 2 ORDER BY user_id
        """,
    ),
    # Benford leading-digit audit over order cents (digit via the decimal
    # string on both engines -- no float log10 edge cases)
    "benford_digits": (
        R.q_benford_digits,
        """
        WITH d AS (
          SELECT CAST(LEFT(CAST(CAST(ROUND(o_totalprice*100) AS BIGINT)
                                AS VARCHAR), 1) AS BIGINT) AS digit
          FROM orders
        ), c AS (
          SELECT digit, COUNT(*) AS n FROM d GROUP BY digit
        ), t AS (SELECT SUM(n) AS total FROM c)
        SELECT digit, n, n * 1000 // (SELECT total FROM t) AS share_pm
        FROM c ORDER BY digit
        """,
    ),
    # COUNT(*) FILTER (...) inside a window frame — the conditional-count
    # window shape (segmented masked cumsum per user-hash partition)
    "running_error_count": (
        R.q_running_error_count,
        """
        SELECT event_id, user_id,
               COUNT(*) FILTER (WHERE event_type = 'error') OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_errors
        FROM events ORDER BY event_id
        """,
    ),
    # SCD2 validity-interval construction (collapse consecutive equal
    # states; valid_to = next interval's valid_from, NULL while current)
    "scd2_intervals": (
        R.q_scd2_intervals,
        """
        WITH o AS (
          SELECT user_id, event_type, ts,
                 CASE WHEN LAG(event_type) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
          FROM events
        ), g AS (
          SELECT user_id, event_type, ts,
                 SUM(chg) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS grp
          FROM o
        ), r AS (
          SELECT user_id, event_type, grp, MIN(ts) AS valid_from,
                 COUNT(*) AS n_rows
          FROM g GROUP BY user_id, event_type, grp
        )
        SELECT user_id, event_type, valid_from,
               LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY grp)
                 AS valid_to,
               n_rows
        FROM r ORDER BY user_id, valid_from, event_type
        """,
    ),
    # RFM segmentation: global quartile scores (quantile_disc thresholds,
    # bucket = 1 + #{thresholds strictly below}) over per-customer R/F/M
    "rfm_segments": (
        R.q_rfm_segments,
        """
        WITH pc AS (
          SELECT o_custkey, MAX(o_orderdate) AS r, COUNT(*) AS f,
                 SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS m
          FROM orders GROUP BY o_custkey
        ), q AS (
          SELECT quantile_disc(r, [0.25, 0.5, 0.75]) AS qr,
                 quantile_disc(f, [0.25, 0.5, 0.75]) AS qf,
                 quantile_disc(m, [0.25, 0.5, 0.75]) AS qm
          FROM pc
        )
        SELECT
          CAST(1 + CAST(r > qr[1] AS INT) + CAST(r > qr[2] AS INT)
                 + CAST(r > qr[3] AS INT) AS BIGINT) AS r_score,
          CAST(1 + CAST(f > qf[1] AS INT) + CAST(f > qf[2] AS INT)
                 + CAST(f > qf[3] AS INT) AS BIGINT) AS f_score,
          CAST(1 + CAST(m > qm[1] AS INT) + CAST(m > qm[2] AS INT)
                 + CAST(m > qm[3] AS INT) AS BIGINT) AS m_score,
          COUNT(*) AS n_customers
        FROM pc, q
        GROUP BY r_score, f_score, m_score
        ORDER BY r_score, f_score, m_score
        """,
    ),
    # Pareto 80/20 coverage: smallest top-revenue customer prefix crossing
    # 80% of total (weighted-quantile histogram selection, no global sort)
    "pareto_customers": (
        R.q_pareto_customers,
        """
        WITH pc AS (
          SELECT o_custkey,
                 SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS cents
          FROM orders GROUP BY o_custkey
        ), s AS (
          SELECT cents,
                 SUM(cents) OVER (ORDER BY cents DESC, o_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                 ROW_NUMBER() OVER (ORDER BY cents DESC, o_custkey) AS rn
          FROM pc
        ), t AS (SELECT SUM(cents) AS total, COUNT(*) AS n FROM pc)
        SELECT MIN(rn) AS n_customers, MIN(cum) AS covered_cents,
               (SELECT total FROM t) AS total_cents,
               (SELECT n FROM t) AS total_customers
        FROM s WHERE 5 * cum >= 4 * (SELECT total FROM t)
        """,
    ),
    # TPC-H Q4 shape: orders with AT LEAST ONE late lineitem, per
    # priority (EXISTS-correlated subquery; order-level, not item-level)
    "priority_order_check": (
        R.q_priority_order_check,
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN EXISTS (
                   SELECT 1 FROM lineitem l
                   WHERE l.l_orderkey = o.o_orderkey
                     AND CAST(l.l_shipdate AS DATE)
                         - CAST(o.o_orderdate AS DATE) > 90)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_orders
        FROM orders o
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
    ),
    # KMV (k-minimum-values / theta) sketch set algebra: distinct-user
    # union + intersection estimates in EXACT integer arithmetic — the
    # only sketch estimator deterministic enough for a full SQL oracle
    "kmv_user_overlap": (
        R.q_kmv_user_overlap,
        """
        WITH
        ua AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase' AND value >= 300.0),
        ub AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'error' AND value >= 300.0),
        ha0 AS (SELECT (user_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM ua),
        ha1 AS (SELECT xor(_a, _a >> 16) AS _b FROM ha0),
        ha2 AS (SELECT CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM ha1),
        ha AS (SELECT DISTINCT xor(_c, _c >> 13) AS h32 FROM ha2),
        hb0 AS (SELECT (user_id % 2147483648) * 2654435761 % 4294967296 AS _a FROM ub),
        hb1 AS (SELECT xor(_a, _a >> 16) AS _b FROM hb0),
        hb2 AS (SELECT CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM hb1),
        hb AS (SELECT DISTINCT xor(_c, _c >> 13) AS h32 FROM hb2),
        sa AS (SELECT h32 FROM ha ORDER BY h32 LIMIT 128),
        sb AS (SELECT h32 FROM hb ORDER BY h32 LIMIT 128),
        su AS (SELECT DISTINCT h32 FROM
                 (SELECT h32 FROM sa UNION ALL SELECT h32 FROM sb)
               ORDER BY h32 LIMIT 128),
        stat AS (SELECT
          (SELECT COUNT(*) FROM sa) AS na, (SELECT MAX(h32) FROM sa) AS ka,
          (SELECT COUNT(*) FROM sb) AS nb, (SELECT MAX(h32) FROM sb) AS kb,
          (SELECT COUNT(*) FROM su) AS nu, (SELECT MAX(h32) FROM su) AS ku,
          (SELECT COUNT(*) FROM sa JOIN sb USING (h32)
            WHERE h32 <= (SELECT MAX(h32) FROM su)) AS rho)
        SELECT
          CAST(CASE WHEN na < 128 THEN na
                    ELSE 127 * 4294967296 // ka END AS BIGINT) AS approx_a,
          CAST(CASE WHEN nb < 128 THEN nb
                    ELSE 127 * 4294967296 // kb END AS BIGINT) AS approx_b,
          CAST(CASE WHEN nu < 128 THEN nu
                    ELSE 127 * 4294967296 // ku END AS BIGINT) AS approx_union,
          CAST(CASE WHEN nu = 0 THEN 0
                    ELSE rho * (CASE WHEN nu < 128 THEN nu
                                     ELSE 127 * 4294967296 // ku END) // nu
               END AS BIGINT) AS approx_intersection
        FROM stat
        """,
    ),
    # unigram-LM tokenizer (Kudo 2018): exact-rational Viterbi-EM over the
    # distributed word histogram (rows-only; golden-pinned — no SQL analog)
    "unigram_train": (D.q_unigram_train, None),
    "unigram_tokenize": (D.q_unigram_tokenize, None),
    # structural degree profile of the co-purchase graph: exact
    # floor(log2) binning via integer bit_length both sides
    "degree_histogram": (
        G.q_degree_histogram,
        """
        WITH pairs AS (
          SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS a,
                          GREATEST(a.l_partkey, b.l_partkey) AS b
          FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
          WHERE a.l_partkey <> b.l_partkey),
        deg AS (
          SELECT node, COUNT(*) AS d FROM (
            SELECT a AS node FROM pairs
            UNION ALL SELECT b AS node FROM pairs)
          GROUP BY node)
        SELECT CAST(LENGTH(bin(d)) - 1 AS BIGINT) AS log2_deg,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY log2_deg ORDER BY log2_deg
        """,
    ),
    # top-N + OTHER reporting rollup over a broadcast-LUT brand fold
    "brand_share_top_others": (
        R.q_brand_share_top_others,
        """
        WITH rev AS (
          SELECT p_brand,
                 SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS cpc
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand),
        rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY cpc DESC, p_brand) AS rn
               FROM rev)
        SELECT CASE WHEN rn <= 3 THEN p_brand ELSE 'OTHER' END AS brand,
               CAST(SUM(cpc) AS BIGINT) AS revenue_cpc
        FROM rk GROUP BY brand ORDER BY brand
        """,
    ),
    # adaptive recrawl policy: integer change-rate surrogate, pure map
    "recrawl_intervals": (
        R.q_recrawl_intervals,
        """
        WITH obs AS (
          SELECT doc_id, doc_id * 8 + g.i AS o
          FROM documents CROSS JOIN
               (SELECT UNNEST(generate_series(1, 7)) AS i) g),
        h1 AS (SELECT doc_id, (o % 2147483648) * 2654435761 % 4294967296 AS _a FROM obs),
        h2 AS (SELECT doc_id, xor(_a, _a >> 16) AS _b FROM h1),
        h3 AS (SELECT doc_id, CAST(_b::HUGEINT * 2246822519 % 4294967296 AS BIGINT) AS _c FROM h2),
        hx AS (SELECT doc_id, xor(_c, _c >> 13) AS h32 FROM h3),
        chg AS (SELECT doc_id,
                       SUM(CASE WHEN h32 % 4 = 0 THEN 1 ELSE 0 END) AS x
                FROM hx GROUP BY doc_id),
        iv AS (SELECT doc_id,
                      CASE WHEN x = 0 THEN 30
                           ELSE LEAST(30, GREATEST(1, 7 // x)) END AS revisit_days
               FROM chg)
        SELECT CAST(revisit_days AS BIGINT) AS revisit_days,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM iv GROUP BY revisit_days ORDER BY revisit_days
        """,
    ),
    # join-planner skew profile: exact permille shares of a Zipf-ish key
    "key_skew_stats": (
        R.q_key_skew_stats,
        """
        WITH c AS (SELECT l_partkey AS k, COUNT(*) AS n
                   FROM lineitem GROUP BY l_partkey),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                     CAST(SUM(n) AS BIGINT) AS total,
                     CAST(MAX(n) AS BIGINT) AS max_n FROM c),
        top AS (SELECT CAST(SUM(n) AS BIGINT) AS top10_n FROM
                  (SELECT n FROM c ORDER BY n DESC, k LIMIT 10))
        SELECT n_keys, total AS total_rows, max_n,
               CAST(top10_n * 1000 // total AS BIGINT) AS top10_share_permille,
               CAST(max_n * n_keys * 1000 // total AS BIGINT) AS skew_factor_permille
        FROM t, top
        """,
    ),
    # equi-depth range-partition planning: discrete quantile split bounds
    "range_partition_bounds": (
        R.q_range_partition_bounds,
        """
        WITH v AS (SELECT CAST(ROUND(l_extendedprice*100) AS BIGINT) AS c
                   FROM lineitem),
        q AS (SELECT quantile_disc(c, [0.125, 0.25, 0.375, 0.5,
                                       0.625, 0.75, 0.875]) AS qs FROM v)
        SELECT UNNEST(generate_series(1, 7)) AS bucket,
               UNNEST(qs) AS bound_cents FROM q
        """,
    ),
    # skew-salted fact-dim join: identical result to the plain join (the
    # oracle), hot keys scattered across salt sub-partitions for placement
    "nation_orders_salted": (
        R.q_nation_orders_salted,
        """
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey ORDER BY c_nationkey
        """,
    ),
    # market-basket association rules: exact-permille confidence + lift,
    # composed on the co-occurrence pair plan; deterministic top-50
    "association_rules": (
        R.q_association_rules,
        """
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        nb AS (SELECT COUNT(DISTINCT l_orderkey) AS nn FROM lineitem),
        item AS (SELECT l_partkey, COUNT(*) AS ni FROM d GROUP BY l_partkey),
        pairs AS (
          SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n
          FROM d a JOIN d b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY p1, p2 HAVING COUNT(*) >= 2),
        rules AS (
          SELECT p1 AS antecedent, p2 AS consequent, n,
                 i1.ni AS na, i2.ni AS nc
          FROM pairs JOIN item i1 ON p1 = i1.l_partkey
                     JOIN item i2 ON p2 = i2.l_partkey
          UNION ALL
          SELECT p2, p1, n, i2.ni, i1.ni
          FROM pairs JOIN item i1 ON p1 = i1.l_partkey
                     JOIN item i2 ON p2 = i2.l_partkey),
        scored AS (
          SELECT antecedent, consequent, CAST(n AS BIGINT) AS n_both,
                 CAST(n * 1000 // na AS BIGINT) AS conf_permille,
                 CAST(n * (SELECT nn FROM nb) * 1000 // (na * nc) AS BIGINT)
                   AS lift_permille
          FROM rules)
        SELECT * FROM scored
        ORDER BY conf_permille DESC, antecedent, consequent LIMIT 50
        """,
    ),
}

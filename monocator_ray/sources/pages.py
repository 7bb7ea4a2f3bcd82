"""S1/S3 — canonical pages-table source & sinks (SURVEY.md §2.1).

The SPEC input is a Parquet table in the exact shape
(url, warc_ts, html, text, lang); ``read_pages`` asserts it and prunes
columns at the read (never load html for a text-only transform).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from monocator_ray.schemas import PAGES, assert_schema
from monocator_ray.shipping import ensure_shipped


def read_pages(path: str, columns: list[str] | None = None) -> rd.Dataset:
    """Read a SPEC-shape pages table; `columns` prunes at the parquet read."""
    ensure_shipped()
    ds = rd.read_parquet(path, columns=columns)
    if columns is None:
        ds = ds.map_batches(
            lambda t: assert_schema(t.select(PAGES.names), PAGES, "read_pages"),
            batch_format="pyarrow",
        )
    return ds


def write_pages(ds: rd.Dataset, dest: str) -> None:
    """Persist a pages Dataset in the canonical shape (S3)."""
    ds.map_batches(
        lambda t: assert_schema(t.select(PAGES.names), PAGES, "write_pages"),
        batch_format="pyarrow",
    ).write_parquet(dest)


def fill_text(ds: rd.Dataset, batch_size: int = 256, concurrency: int = 4) -> rd.Dataset:
    """The minimum end-to-end slice (SURVEY.md §7 step 1): populate the
    ``text`` column with the jsoup-contract extraction of ``html``."""
    from monocator_ray.html.textex import extract_page

    def fn(batch: pa.Table) -> pa.Table:
        texts = [
            extract_page(h) .text if h is not None else ""
            for h in batch["html"].to_pylist()
        ]
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", pa.array(texts, pa.string()))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)

"""Canonical result digests for the rows-only query goldens (VERDICT r4
#4): queries with no SQL oracle are pinned against committed sf0.01
digests so regressions surface exactly like oracle failures do.

Canonical form: columns sorted by name, float columns quantized (defaults
to 6 decimals; per-query overrides for genuinely noisier reductions), rows
sorted by the string rendering of every column, serialized as
tab-separated lines and sha256-hashed.  The same canonicalization runs at
generation time (tests/gen_rows_only_goldens.py) and at test time, at any
parallelism — the digests are parallelism-invariant by construction for
deterministic pipelines, which is exactly the property being pinned.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# queries whose float outputs need coarser quantization than 1e-6 (order-
# of-summation noise in big reductions); everything else uses 6 decimals
DECIMALS_OVERRIDE: dict[str, int] = {
    "lm_perplexity": 4,
    "embedding_pca": 3,
    "kmeans_clusters": 4,
}


def _to_pandas(obj) -> pd.DataFrame:
    import ray.data as rd

    if isinstance(obj, rd.Dataset):
        tables = [t for t in obj.to_arrow_refs()]
        import ray

        parts = [t for t in ray.get(tables) if t.num_rows]
        obj = (pa.concat_tables(parts, promote_options="default")
               if parts else pa.table({}))
    if isinstance(obj, pa.Table):
        obj = obj.to_pandas()
    if not isinstance(obj, pd.DataFrame):
        raise TypeError(f"cannot canonicalize {type(obj)}")
    return obj


def _render_cell(v) -> str:
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "<null>"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_render_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_render_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_render_cell(v[k])}"
                              for k in sorted(v)) + "}"
    return str(v)


def canonical_digest(obj, decimals: int = 6) -> dict:
    """-> {"rows": n, "schema": "col:dtype,...", "digest": sha256hex}."""
    df = _to_pandas(obj)
    df = df[sorted(df.columns)]
    schema = ",".join(f"{c}:{df[c].dtype}" for c in df.columns)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(decimals)
        elif df[c].dtype == object:
            # float lists (embeddings etc.) quantize element-wise
            def q(v):
                if isinstance(v, np.ndarray) and v.dtype.kind == "f":
                    return np.round(v, decimals)
                if isinstance(v, list) and v and isinstance(v[0], float):
                    return [round(x, decimals) for x in v]
                return v

            df[c] = df[c].map(q)
    lines = sorted(
        "\t".join(_render_cell(v) for v in row)
        for row in df.itertuples(index=False, name=None)
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return {"rows": len(df), "schema": schema, "digest": h.hexdigest()}

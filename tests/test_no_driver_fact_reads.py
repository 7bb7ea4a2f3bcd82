"""Guard (VERDICT r2 #2 done-criterion): no pipeline may pq.read_table a
FACT-sized driver table (customer/orders/lineitem/events/documents/
embeddings) on the driver — build sides must be distributed (map_batches
partials, Dataset.join, broadcast of a BOUNDED result only).

Allowlist = the documented exceptions: q_embedding_neardup broadcasts the
normalized matrix with an explicit O(N*d) memory contract (the LSH variant
is the beyond-bound path); q_lm_perplexity reads a predicate-pushdown
REFERENCE SUBSET (filters=) bounded by ref_max_id.  Anything new that
trips this test needs the same kind of written bound — or a distributed
plan."""

import os
import re

PIPE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "monocator_ray", "pipelines")
FACTS = "customer|orders|lineitem|events|documents|embeddings"
PAT = re.compile(r'pq\.read_table\(\s*f"\{sf_dir\}/(?:' + FACTS + r')\.parquet"')
DEF = re.compile(r"^def (\w+)")

ALLOWED = {
    ("docs.py", "q_embedding_neardup"),   # documented O(N*d) broadcast bound
    ("docs.py", "q_lm_perplexity"),       # filters= pushdown, ref subset only
}


def test_no_driver_side_fact_table_reads():
    hits = []
    for fname in sorted(os.listdir(PIPE_DIR)):
        if not fname.endswith(".py"):
            continue
        func = "<module>"
        for lineno, line in enumerate(
            open(os.path.join(PIPE_DIR, fname), encoding="utf-8"), 1
        ):
            m = DEF.match(line)
            if m:
                func = m.group(1)
            if PAT.search(line) and (fname, func) not in ALLOWED:
                hits.append(f"{fname}:{lineno} in {func}(): {line.strip()}")
    assert not hits, (
        "driver-side fact-table read(s) found (distribute the build side "
        "or add a documented-bound allowlist entry):\n" + "\n".join(hits)
    )

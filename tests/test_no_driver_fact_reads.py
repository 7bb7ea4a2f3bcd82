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


# ---- unbounded-collect guard (VERDICT r3 "Next round" #6) -------------------
#
# Every DRIVER-SIDE collect (`.to_pandas()` / `collect_arrow(`) in a pipeline
# must carry a written size bound: a `# bounded:` marker on the same line or
# within the two lines above, stating WHY the collected result is small
# (post-aggregation partials, per-partition top-k, sketches, dimension
# tables, an enforced adaptive cap ...).  Collects inside NESTED defs are
# worker-side per-partition/per-batch conversions (pandas kernels inside
# map_batches functions) — those never materialize a dataset on the driver
# and are exempt.  rehearse.py is the driver-side oracle-comparison harness
# (collecting results IS its job at sf0.01) and is exempt as a file.

COLLECT = re.compile(r"\.to_pandas\(\)|collect_arrow\(")
BOUND_MARK = re.compile(r"#\s*bounded:")
ANY_DEF = re.compile(r"^(\s*)def \w+")
EXEMPT_FILES = {"rehearse.py"}


def test_driver_collects_carry_written_bounds():
    hits = []
    for fname in sorted(os.listdir(PIPE_DIR)):
        if not fname.endswith(".py") or fname in EXEMPT_FILES:
            continue
        lines = open(os.path.join(PIPE_DIR, fname), encoding="utf-8").read().splitlines()
        nested_until_indent = None  # inside a nested def while indent > this
        for i, line in enumerate(lines):
            stripped = line.strip()
            indent = len(line) - len(line.lstrip()) if stripped else None
            m = ANY_DEF.match(line)
            if m:
                if len(m.group(1)) > 0 and nested_until_indent is None:
                    nested_until_indent = len(m.group(1))
                elif len(m.group(1)) == 0:
                    nested_until_indent = None
            elif (nested_until_indent is not None and indent is not None
                  and indent <= nested_until_indent):
                nested_until_indent = None  # nested def body ended
            in_worker_fn = (
                nested_until_indent is not None
                and not (m and len(m.group(1)) == nested_until_indent)
            )
            if not COLLECT.search(line) or in_worker_fn:
                continue
            window = lines[max(0, i - 2) : i + 1]
            if not any(BOUND_MARK.search(w) for w in window):
                hits.append(f"{fname}:{i + 1}: {stripped}")
    assert not hits, (
        "driver-side collect(s) without a written `# bounded:` size "
        "contract (state the O(.) bound or distribute the step):\n"
        + "\n".join(hits)
    )


def test_registry_has_no_duplicate_keys_or_shadowed_defs():
    """A duplicate key in the REGISTRY dict literal silently REPLACES the
    older query, and a same-named ``def q_*`` later in a pipelines module
    shadows the earlier function for every registry entry referencing it
    (both happened in round-4 session 4: event_funnel).  Python can't see
    either at runtime — the dict/module already collapsed — so check the
    SOURCE with ast."""
    import ast
    import collections

    reg_src = open(os.path.join(PIPE_DIR, "registry.py"), encoding="utf-8").read()
    tree = ast.parse(reg_src)
    dict_keys: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            isinstance(t, ast.Name) and t.id == "REGISTRY" for t in node.targets
        ):
            assert isinstance(node.value, ast.Dict)
            for k in node.value.keys:
                assert isinstance(k, ast.Constant)
                dict_keys.append(k.value)
    dupes = [k for k, c in collections.Counter(dict_keys).items() if c > 1]
    assert not dupes, f"duplicate REGISTRY keys (later silently wins): {dupes}"

    for fname in sorted(os.listdir(PIPE_DIR)):
        if not fname.endswith(".py"):
            continue
        src = open(os.path.join(PIPE_DIR, fname), encoding="utf-8").read()
        mod = ast.parse(src)
        names = [n.name for n in mod.body
                 if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))]
        dupes = [k for k, c in collections.Counter(names).items() if c > 1]
        assert not dupes, f"{fname}: shadowed module-level defs: {dupes}"

"""Regenerate the rows-only query goldens (VERDICT r4 #4).

Run manually (`python tests/gen_rows_only_goldens.py [names...]`),
diff-review tests/fixtures/rows_only_goldens.json, commit.  The suite then
validates every rows-only query against these committed digests — a
behavior change must come with a reviewed golden update, exactly like the
SQL-oracle queries' CI discipline.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
OUT = pathlib.Path(__file__).parent / "fixtures" / "rows_only_goldens.json"


def main(names: list[str]) -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as entrymod
    from tests.golden_util import DECIMALS_OVERRIDE, canonical_digest

    q = entrymod.queries()
    rows_only = [k for k in q if k not in entrymod.oracle_sql()]
    existing = json.loads(OUT.read_text()) if OUT.exists() else {}
    for name in names or rows_only:
        res = q[name](SF_DIR)
        d = canonical_digest(res, DECIMALS_OVERRIDE.get(name, 6))
        existing[name] = d
        print(f"{name}: rows={d['rows']} digest={d['digest'][:16]}…")
    OUT.write_text(json.dumps(dict(sorted(existing.items())), indent=1) + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1:])

"""Golden pins for the rows-only registry queries (VERDICT r4 #4).

Queries with no SQL oracle previously passed on "runs + row count" alone;
each now has a committed sf0.01 canonical digest
(tests/fixtures/rows_only_goldens.json, regenerated via
tests/gen_rows_only_goldens.py) so a behavior regression fails CI exactly
like an oracle mismatch would.  Digests were verified parallelism-
invariant (identical at num_cpus=8 and 4) before committing.
"""

from __future__ import annotations

import json
import pathlib

import pytest

GOLDENS = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" /
     "rows_only_goldens.json").read_text())
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__ as entrymod

    q = entrymod.queries()
    oracle = entrymod.oracle_sql()
    return q, oracle


def test_every_rows_only_query_has_a_golden(registry):
    q, oracle = registry
    rows_only = {k for k in q if k not in oracle}
    missing = rows_only - set(GOLDENS)
    assert not missing, (
        f"rows-only queries without a committed golden: {sorted(missing)} "
        "— run python tests/gen_rows_only_goldens.py and commit the diff")


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_rows_only_golden(registry, name):
    from tests.golden_util import DECIMALS_OVERRIDE, canonical_digest

    q, _ = registry
    got = canonical_digest(q[name](SF_DIR), DECIMALS_OVERRIDE.get(name, 6))
    want = GOLDENS[name]
    assert got == want, (
        f"{name} drifted from its committed sf0.01 golden "
        f"(rows {want['rows']} -> {got['rows']}, schema/digest see diff); "
        "if intentional, regenerate via tests/gen_rows_only_goldens.py")

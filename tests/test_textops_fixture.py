"""PII scrub / word repetition / C4 line clean on a PLANTED fixture.

The driver's synthetic documents are single-line word soup with no PII and
no punctuation, so the registry-level oracle comparison is trivially zero
for pii_scrub / c4_line_clean.  This fixture plants emails, phones, IPv4s,
multi-line documents with terminal punctuation, heavy word repetition and
an empty text, and re-runs the SAME Ray query vs the SAME oracle SQL over
the tmp table — proving the operators and the RE2/Python pinning on
non-trivial inputs.
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

TEXTS = [
    "contact me at john.doe+spam@example.co.uk or call +1 555 123 4567 now.",
    "server at 192.168.0.1 and 10.0.0.255 responded.\nAll good!\nno punct line",
    'He said "stop".\nShe said nothing\nDid she?\twhy  ',
    "spam spam spam spam eggs spam",
    "",
    "multi@ex.com text 8.8.8.8 and 021-555-7788 mixed a@b.io",
    "tab\tseparated words tab\ttab again.",
]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("textops")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "lang": pa.array(["en"] * len(TEXTS), pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _compare(name: str, fixture_dir: str):
    from monocator_ray.pipelines.registry import REGISTRY

    fn, sql = REGISTRY[name]
    got = fn(fixture_dir).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{fixture_dir}/documents.parquet')"
    )
    want = con.execute(sql).fetchdf()
    g = got[sorted(got.columns)].reset_index(drop=True)
    w = want[sorted(want.columns)].reset_index(drop=True)
    for c in g.columns:
        if str(g[c].dtype).startswith(("int", "uint")):
            g[c] = g[c].astype("int64")
            w[c] = w[c].astype("int64")
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    return got


@pytest.mark.usefixtures("ray_session")
def test_pii_scrub_matches_oracle_on_planted_pii(fixture_dir):
    got = _compare("pii_scrub", fixture_dir)
    assert got["n_emails"].sum() >= 3
    assert got["n_ipv4"].sum() >= 3
    assert got["n_phones"].sum() >= 2
    assert "<EMAIL>" in got["text_clean"].iloc[0]
    assert "@" not in " ".join(got["text_clean"])


@pytest.mark.usefixtures("ray_session")
def test_word_repetition_matches_oracle(fixture_dir):
    got = _compare("word_repetition", fixture_dir)
    spam = got[got["doc_id"] == 3].iloc[0]
    assert int(spam["n_words"]) == 6
    assert int(spam["n_unique_words"]) == 2
    assert int(spam["top_word_count"]) == 5


@pytest.mark.usefixtures("ray_session")
def test_c4_line_clean_matches_oracle(fixture_dir):
    got = _compare("c4_line_clean", fixture_dir)
    doc2 = got[got["doc_id"] == 2].iloc[0]
    # 'He said "stop".' kept, 'She said nothing' dropped, 'Did she?\twhy  ' dropped
    assert int(doc2["n_kept"]) == 1 and int(doc2["n_dropped"]) == 2
    doc1 = got[got["doc_id"] == 1].iloc[0]
    assert int(doc1["n_kept"]) == 2 and int(doc1["n_dropped"]) == 1


@pytest.fixture(scope="module")
def span_fixture_dir(tmp_path_factory):
    """Planted duplicated 5-gram spans: docs 0/1 share 'one two three four
    five'; doc 2 repeats its own span; doc 3 is clean; doc 4 is whitespace."""
    d = tmp_path_factory.mktemp("spans")
    texts = [
        "one two three four five alpha beta gamma delta epsilon zeta",
        "prefix one two three four five suffix words here",
        "a b c d e f g a b c d e x",
        "totally unique words that never repeat anywhere at all",
        "   ",
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_dedup_substrings_matches_oracle_on_planted_spans(span_fixture_dir):
    got = _compare("dedup_substrings", span_fixture_dir)
    by = {int(r["doc_id"]): r for _, r in got.iterrows()}
    assert 4 not in by  # whitespace-only doc excluded on both sides
    # docs 0/1: the shared 5-gram's positions removed, the rest kept
    assert int(by[0]["n_removed"]) == 5
    assert by[0]["clean_text"] == "alpha beta gamma delta epsilon zeta"
    assert by[1]["clean_text"] == "prefix suffix words here"
    # doc 2: self-repeated span 'a b c d e' covers positions 0-4 and 7-11
    assert int(by[2]["n_removed"]) == 10 and by[2]["clean_text"] == "f g x"
    # doc 3: untouched
    assert int(by[3]["n_removed"]) == 0


@pytest.fixture(scope="module")
def classifier_fixture_dir(tmp_path_factory):
    """Separable vocabularies (the driver tables share one vocab across
    langs, so registry-level accuracy is chance): here a learned
    classifier must recover every label."""
    d = tmp_path_factory.mktemp("clf")
    rows = []
    for i in range(12):
        rows.append((i, "le chat mange le poisson dans la maison", "fr"))
    for i in range(12, 24):
        rows.append((i, "the cat eats the fish in the house", "en"))
    for i in range(24, 36):
        rows.append((i, "de kat eet de vis in het huis", "nl"))
    # one mixed doc: majority-French tokens
    rows.append((36, "le chat the fish le poisson", "fr"))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_lang_classifier_matches_oracle_and_separates(classifier_fixture_dir):
    got = _compare("lang_classifier", classifier_fixture_dir)
    acc = (got["lang"] == got["pred_lang"]).mean()
    assert acc == 1.0, f"separable vocab must classify perfectly, got {acc}"


@pytest.fixture(scope="module")
def gopher_fixture_dir(tmp_path_factory):
    """Each rule must bind at least once (driver docs are single-line word
    soup where bullet/ellipsis/symbol rules are trivially true)."""
    d = tmp_path_factory.mktemp("gopher")
    filler = "the cat and dog have fun with all of that house " * 5  # 50 words
    texts = [
        filler,                                    # passes everything
        "short one",                               # fails r_wordcount
        "xx " * 60 + "the of",                     # fails r_meanlen (mean 2)
        filler + "# " * 20,                        # fails r_symbol + meanlen
        "\n".join(["- b"] * 10 + [filler, filler]),  # 10/12 = 83% < 90% ok
        "\n".join(["- bullet point here"] * 10),   # fails r_bullet (10/10)
        "\n".join(["dots..."] * 9 + [filler]),     # fails r_ellipsis (9/10)
        "0 1 2 3 4 " * 10 + "the of",              # fails r_alpha
        "zz yy " * 30,                             # fails r_stop
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_gopher_filter_rules_bind(gopher_fixture_dir):
    got = _compare("gopher_filter", gopher_fixture_dir).set_index("doc_id")
    assert bool(got.loc[0, "keep"])
    assert not got.loc[1, "r_wordcount"]
    assert not got.loc[2, "r_meanlen"]
    assert not got.loc[3, "r_symbol"]
    assert got.loc[4, "r_bullet"] and not got.loc[5, "r_bullet"]
    assert not got.loc[6, "r_ellipsis"]
    assert not got.loc[7, "r_alpha"]
    assert not got.loc[8, "r_stop"]
    assert bool(got.loc[4, "keep"])  # bullet fraction under the bar
    assert not got.drop(index=[0, 4])["keep"].any()


@pytest.fixture(scope="module")
def unicode_fixture_dir(tmp_path_factory):
    """Composed vs decomposed forms (driver tables are ASCII, where NFC is
    the identity): e+COMBINING ACUTE -> é; compatibility chars unchanged
    under NFC (ﬁ ligature stays); already-NFC text untouched."""
    d = tmp_path_factory.mktemp("unicode")
    texts = [
        "caf" + "é" + " au lait",   # decomposed -> composed (changed)
        "café au lait",              # already NFC (unchanged)
        "the ﬁle name",              # NFC keeps the ﬁ ligature
        "plain ascii text",
        "Å ring " + "ö uml",  # Å and ö decomposed
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_unicode_normalize_matches_oracle(unicode_fixture_dir):
    got = _compare("unicode_normalize", unicode_fixture_dir).set_index("doc_id")
    assert bool(got.loc[0, "changed"]) and got.loc[0, "text_nfc"] == "café au lait"
    assert not got.loc[1, "changed"]
    assert not got.loc[2, "changed"]  # NFC preserves compatibility chars
    assert bool(got.loc[4, "changed"]) and got.loc[4, "text_nfc"] == "Å ring ö uml"

"""Unigram-LM tokenizer (stages/unigram.py — Kudo 2018, Viterbi-EM with
exact-rational path comparison).  Pins: segmentation preference order,
tie-breaking, coverage, trainer determinism, and the distributed encode
stage against a driver recompute."""

from __future__ import annotations

import pytest

from monocator_ray.stages.unigram import (
    UnigramEncoder,
    seed_vocab,
    unigram_train_from_histogram,
    viterbi_segment,
)


def test_seed_vocab_keeps_every_char_and_counts_substrings():
    hist = {"abab": 3, "cd": 2}
    v = seed_vocab(hist, max_piece_len=3, seed_size=5)
    # every single character survives regardless of seed_size
    for ch in "abcd":
        assert ch in v
    # substring weight = word count x occurrences: "ab" occurs twice in
    # "abab" -> 6; "ba" once -> 3
    assert v.get("ab", 0) == 6 or "ab" not in v  # may be pruned by seed_size
    full = seed_vocab(hist, max_piece_len=3, seed_size=100)
    assert full["ab"] == 6
    assert full["ba"] == 3
    assert full["cd"] == 2


def test_viterbi_prefers_higher_probability_path():
    vocab = {"a": 1, "b": 1, "c": 10, "ab": 50, "abc": 5}
    total = sum(vocab.values())  # 67
    # ["ab","c"]: 50*10/67^2  vs  ["abc"]: 5/67 = 335/67^2 -> ab+c wins
    assert viterbi_segment("abc", vocab, total) == ["ab", "c"]


def test_viterbi_exact_tie_prefers_fewer_pieces():
    # scores tie EXACTLY: ["abc"] = 4/25, ["ab","c"] = 10*10/25^2 = 4/25
    vocab = {"abc": 4, "ab": 10, "c": 10, "a": 1}
    total = sum(vocab.values())
    assert total == 25
    assert viterbi_segment("abc", vocab, total) == ["abc"]


def test_viterbi_uncovered_char_returns_none():
    assert viterbi_segment("ax", {"a": 1}, 1) is None


def test_train_dominant_piece_survives_and_is_deterministic():
    hist = {"abab": 10, "ab": 5, "cd": 3}
    v1 = unigram_train_from_histogram(hist, vocab_size=8, max_piece_len=4)
    v2 = unigram_train_from_histogram(hist, vocab_size=8, max_piece_len=4)
    assert v1 == v2  # pure function of the histogram
    d = dict(v1)
    assert "ab" in d or "abab" in d
    # coverage: single chars always alive
    for ch in "abcd":
        assert ch in d
    # every word still segments under the final vocabulary
    total = sum(d.values())
    for w in hist:
        seg = viterbi_segment(w, d, total)
        assert seg is not None and "".join(seg) == w


def test_train_prunes_to_vocab_size_floor():
    hist = {"aaab": 5, "aab": 4, "abb": 3, "bbb": 2}
    v = unigram_train_from_histogram(hist, vocab_size=4, max_piece_len=3,
                                     n_iters=6)
    # chars 'a','b' forced in; total size respects the floor once the
    # shrink schedule reaches it
    assert len(v) >= 2
    d = dict(v)
    assert "a" in d and "b" in d


@pytest.mark.usefixtures("ray_session")
def test_unigram_tokenize_matches_driver_recompute():
    import __ray_entry__ as entrymod

    from monocator_ray.pipelines.docs import _word_histogram
    from monocator_ray.stages.grouped import collect_arrow
    from monocator_ray.stages.textstats import _WS_SPLIT

    sf = "/root/testdata/sf0.001"
    got = collect_arrow(entrymod.queries()["unigram_tokenize"](sf)).to_pandas()
    vocab = dict(unigram_train_from_histogram(_word_histogram(sf), 96))
    total = sum(vocab.values())

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    memo: dict[str, int] = {}

    def n_tokens(s: str) -> int:
        if not s or not s.strip(" "):
            return 0
        out = 0
        for w in _WS_SPLIT.split(s.strip(" ")):
            if not w:
                continue
            if w not in memo:
                memo[w] = len(viterbi_segment(w, vocab, total) or [])
            out += memo[w]
        return out

    want = {int(r.doc_id): n_tokens(r.text) for r in docs.itertuples()}
    assert len(got) == len(want)
    for r in got.itertuples():
        assert want[int(r.doc_id)] == int(r.n_unigram_tokens), r.doc_id


def test_encoder_unknown_char_fallback():
    vocab = [("ab", 5), ("a", 2), ("b", 2)]
    enc = UnigramEncoder(vocab)
    # 'x' unseen: one <unk> piece per uncovered char, plus the Viterbi
    # segmentation of the known remainder "ab" (one piece, 5/9 beats
    # 4/81) -> 1 + 1
    assert enc._pieces("axb") == 2
    # memo hit returns the same value
    assert enc._pieces("axb") == 2

"""Text-analysis stages for large-scale training-data pipelines (task brief):
language-ID (n-gram heuristic), quality scoring, token counting, document
fingerprinting.

Round 3 (VERDICT r2 #7): the four hot classes (TokenCounter, QualityScorer,
LangId, Fingerprinter) are ARROW-native — ``batch_format="pyarrow"``
stages over ``pyarrow.compute`` kernels, so each batch stays zero-copy from
the object store instead of paying an Arrow→pandas conversion.  Measured on
sf0.1 documents (5k rows, 1.6 MB text): TokenCounter 0.283 s pandas → 0.124
s arrow (2.3x) with bit-identical outputs; the other three share the same
kernel set (split + is_in + segment sums).  PiiScrubber / WordRepetition /
C4LineCleaner stay pandas — their multi-pass ``str.replace`` chains and
per-doc uniques have no arrow kernel win (replace_substring_regex is the
same RE2 underneath, and the unique/count loops dominate).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from monocator_ray.hashing import hash_str64

# Deterministic whitespace tokenizer shared with the DuckDB oracle:
# tokens = regexp_split_to_array(trim(text), '\s+'); empty text -> 0 tokens.
# Pinned to RE2's \s class ([\t\n\f\r ]) — Python's \s is Unicode-aware
# (NBSP etc.) and would diverge from the DuckDB oracle on non-ASCII
# whitespace (ADVICE r1).
_WS_SPLIT = re.compile(r"[\t\n\f\r ]+")

# tiny stopword lists per language for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "nl": {"de", "het", "een", "en", "van", "ik", "dat", "die", "niet", "met"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
}


def token_count(texts: pd.Series) -> np.ndarray:
    t = texts.fillna("").str.strip()
    n = np.zeros(len(t), dtype=np.int64)
    nonempty = t != ""
    if nonempty.any():
        n[nonempty.to_numpy()] = t[nonempty].str.split(_WS_SPLIT).str.len().to_numpy()
    return n


def token_count_arrow(col) -> pa.Array:
    """Arrow-native :func:`token_count`: n_tokens = interior RE2-``\\s``
    runs of the stripped text + 1 (0 for empty).  ``utf8_trim_whitespace``
    is Python ``str.strip()`` (Unicode edges), so the two paths are
    bit-identical — pinned by test_token_count_arrow_matches_pandas."""
    t = pc.fill_null(col, "")
    trimmed = pc.utf8_trim_whitespace(t)
    runs = pc.cast(pc.count_substring_regex(trimmed, r"[\t\n\f\r ]+"), pa.int64())
    return pc.if_else(
        pc.not_equal(trimmed, pa.scalar("")),
        pc.add(runs, pa.scalar(1, pa.int64())),
        pa.scalar(0, pa.int64()),
    )


def _segment_sums(values: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Per-list sums of a flattened list column (handles empty lists)."""
    cs = np.concatenate([[0], np.cumsum(values, dtype=np.int64)])
    ends = np.cumsum(lengths, dtype=np.int64)
    return cs[ends] - cs[ends - lengths]


def _split_lower(col) -> tuple[pa.Array, np.ndarray]:
    """(flattened lowercase tokens, per-row token counts) — the shared
    kernel under the stopword counters (RE2 ``\\s`` split, no strip: a
    leading separator yields an empty token, which no marker set holds)."""
    parts = pc.split_pattern_regex(pc.utf8_lower(pc.fill_null(col, "")), r"[\t\n\f\r ]+")
    lengths = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    return pc.list_flatten(parts), lengths


class TokenCounter:
    """map_batches (pyarrow): adds n_tokens (whitespace) and n_bpe_ish
    (BPE-ish regex word/punct pieces, GPT-2-style pattern; the ``\\s`` in
    the piece class is RE2/ASCII-pinned like every oracle-adjacent regex
    in this repo)."""

    _BPE_ISH = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\t\n\f\r\v ]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        batch = batch.append_column("n_tokens", token_count_arrow(batch["text"]))
        return batch.append_column(
            "n_bpe_ish", pc.cast(pc.count_substring_regex(t, self._BPE_ISH), pa.int64())
        )


class QualityScorer:
    """map_batches (pyarrow): length/alpha/punct/stopword-ratio quality
    signals.  Integer counts only (SQL-oracle hash parity): n_chars,
    n_alpha, n_punct, n_tokens, n_stop (english stopword hits)."""

    def __init__(self):
        self.stop = pa.array(sorted(_LANG_MARKERS["en"]))

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = pc.fill_null(batch["text"], "")
        flat, lengths = _split_lower(batch["text"])
        hits = pc.is_in(flat, value_set=self.stop).to_numpy(zero_copy_only=False)
        n_stop = _segment_sums(hits.astype(np.int64), lengths)
        for name, arr in (
            ("n_chars", pc.cast(pc.utf8_length(t), pa.int64())),
            ("n_alpha", pc.cast(pc.count_substring_regex(t, r"[A-Za-z]"), pa.int64())),
            ("n_punct", pc.cast(pc.count_substring_regex(t, r"[!-/:-@\[-`{-~]"), pa.int64())),
            ("n_tokens", token_count_arrow(batch["text"])),
            ("n_stop", pa.array(n_stop, pa.int64())),
        ):
            batch = batch.append_column(name, arr)
        return batch


class LangId:
    """map_batches (pyarrow): deterministic stopword-vote language ID over
    en/nl/fr (M9; deterministic so goldens are stable — SURVEY.md §2.2).
    Vectorized: one split, one is_in per language, segment sums, first-max
    argmax in the fixed en>fr>nl tie order (same contract as detect())."""

    _ORDER = ("en", "fr", "nl")

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self._sets = [pa.array(sorted(_LANG_MARKERS[k])) for k in self._ORDER]
        self._names = np.array(self._ORDER, dtype=object)

    def detect(self, text: str) -> str:
        words = _WS_SPLIT.split(text.lower()) if text else []
        best_lang, best = "und", 0
        for lang in ("en", "fr", "nl"):  # fixed order for deterministic ties
            m = self.markers[lang]
            score = sum(1 for w in words if w in m)
            if score > best:
                best_lang, best = lang, score
        return best_lang

    def votes(self, col) -> np.ndarray:
        """(rows, 3) stopword-hit counts in en/fr/nl order."""
        flat, lengths = _split_lower(col)
        return np.stack(
            [
                _segment_sums(
                    pc.is_in(flat, value_set=s).to_numpy(zero_copy_only=False).astype(np.int64),
                    lengths,
                )
                for s in self._sets
            ],
            axis=1,
        )

    def detect_arrow(self, col) -> pa.Array:
        scores = self.votes(col)
        if not len(scores):
            return pa.array([], pa.string())
        best = scores.max(axis=1)
        # argmax returns the FIRST max — identical to detect()'s strict
        # 'score > best' walk in the same language order
        lang = self._names[scores.argmax(axis=1)]
        return pa.array(np.where(best > 0, lang, "und"), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.append_column("lang_detected", self.detect_arrow(batch["text"]))


class PiiScrubber:
    """map_batches: redact emails / phone numbers / IPv4 addresses and count
    them (training-data hygiene — C4/CCNet-style PII pass).  Patterns are
    pinned to the RE2-compatible ASCII subset so the DuckDB oracle
    (regexp_replace ... 'g') computes the identical result; replacement
    ORDER matters (emails first: their digits must not look like phones)."""

    def __init__(self):
        self.email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
        self.ipv4 = re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")
        self.phone = re.compile(r"\+?\d(?:[ -]?\d){7,14}")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        batch["n_emails"] = t.str.count(self.email).astype(np.int64)
        t = t.str.replace(self.email, "<EMAIL>", regex=True)
        batch["n_ipv4"] = t.str.count(self.ipv4).astype(np.int64)
        t = t.str.replace(self.ipv4, "<IP>", regex=True)
        batch["n_phones"] = t.str.count(self.phone).astype(np.int64)
        batch["text_clean"] = t.str.replace(self.phone, "<PHONE>", regex=True)
        return batch


class WordRepetition:
    """map_batches: Gopher-style word-repetition signals per document —
    n_words, n_unique_words, top_word_count (occurrences of the most
    frequent word).  Tokenization mirrors the DuckDB oracle exactly:
    ``regexp_split_to_array(TRIM(text), '\\s+')`` (ASCII-space TRIM, RE2
    ``\\s`` class; empty text -> one empty-string token on both sides)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_words, n_unique, top = [], [], []
        for t in batch["text"].fillna(""):
            words = np.array(_WS_SPLIT.split(t.strip(" ")), dtype=object)
            _u, counts = np.unique(words, return_counts=True)
            n_words.append(len(words))
            n_unique.append(len(counts))
            top.append(int(counts.max()) if len(counts) else 0)
        batch["n_words"] = np.array(n_words, dtype=np.int64)
        batch["n_unique_words"] = np.array(n_unique, dtype=np.int64)
        batch["top_word_count"] = np.array(top, dtype=np.int64)
        return batch


class C4LineCleaner:
    """map_batches: C4-style terminal-punctuation line filter — a line is
    kept iff, after stripping trailing spaces/tabs, it ends in ``.``, ``!``,
    ``?`` or ``"``.  Emits per-doc n_kept / n_dropped plus the cleaned text
    (kept lines re-joined); the count columns are the oracle surface."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_kept, n_dropped, cleaned = [], [], []
        for t in batch["text"].fillna(""):
            lines = t.split("\n")
            kept = [ln for ln in lines if ln.rstrip(" \t").endswith((".", "!", "?", '"'))]
            n_kept.append(len(kept))
            n_dropped.append(len(lines) - len(kept))
            cleaned.append("\n".join(kept))
        batch["n_kept"] = np.array(n_kept, dtype=np.int64)
        batch["n_dropped"] = np.array(n_dropped, dtype=np.int64)
        batch["text_clean"] = cleaned
        return batch


def fingerprint_arrow(col) -> np.ndarray:
    """uint64 fingerprints of an Arrow string column — mirror of the
    dedup_exact oracle key TRIM(regexp_replace(text, '\\s+', ' ', 'g')):
    collapse RE2-``\\s`` runs first, then trim ASCII spaces only (DuckDB
    TRIM) — same op order, same char classes.  The hash itself
    (pd.util.hash_array, pinned key) needs Python strings, so the one
    unavoidable copy is the final object-array extraction."""
    norm = pc.utf8_trim(
        pc.replace_substring_regex(pc.fill_null(col, ""), r"[\t\n\f\r ]+", " "),
        characters=" ",
    )
    return hash_str64(norm.to_numpy(zero_copy_only=False)).astype(np.uint64)


class Fingerprinter:
    """map_batches (pyarrow): 64-bit document fingerprint = stable hash of
    the whitespace-normalized text (rolling-hash analog; exact-dup key).
    Column stays uint64 (the r2 contract); consumers bit-view to int64
    before any Ray groupby/sort (graft quirk: uint64 keys past 2^63)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        fp = fingerprint_arrow(batch["text"])
        return batch.append_column("fingerprint", pa.array(fp, pa.uint64()))

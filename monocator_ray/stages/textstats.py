"""Text-analysis stages for large-scale training-data pipelines (task brief):
language-ID (n-gram heuristic), quality scoring, token counting, document
fingerprinting.  All vectorized pandas/numpy inside ``map_batches``; regexes
compile once per actor (callable classes).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

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


class TokenCounter:
    """map_batches: adds n_tokens (whitespace) and n_bpe_ish (BPE-ish regex
    word/punct pieces, GPT-2-style pattern)."""

    def __init__(self):
        self.bpe_ish = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_tokens"] = token_count(batch["text"])
        batch["n_bpe_ish"] = batch["text"].fillna("").str.findall(self.bpe_ish).str.len().astype(np.int64)
        return batch


class QualityScorer:
    """map_batches: length/alpha/punct/stopword-ratio quality signals.

    Integer counts only (SQL-oracle hash parity): n_chars, n_alpha, n_punct,
    n_tokens, n_stop (english stopword hits).
    """

    def __init__(self):
        self.alpha = re.compile(r"[A-Za-z]")
        self.punct = re.compile(r"[!-/:-@\[-`{-~]")
        self.stop = _LANG_MARKERS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch["text"].fillna("")
        batch["n_chars"] = t.str.len().astype(np.int64)
        batch["n_alpha"] = t.str.count(self.alpha).astype(np.int64)
        batch["n_punct"] = t.str.count(self.punct).astype(np.int64)
        batch["n_tokens"] = token_count(t)
        stop = self.stop
        batch["n_stop"] = t.str.lower().str.split(_WS_SPLIT).map(
            lambda ws: sum(1 for w in ws if w in stop) if isinstance(ws, list) else 0
        ).astype(np.int64)
        return batch


class LangId:
    """map_batches: deterministic stopword-vote language ID over en/nl/fr
    (M9; deterministic so goldens are stable — SURVEY.md §2.2)."""

    def __init__(self):
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def detect(self, text: str) -> str:
        words = _WS_SPLIT.split(text.lower()) if text else []
        best_lang, best = "und", 0
        for lang in ("en", "fr", "nl"):  # fixed order for deterministic ties
            m = self.markers[lang]
            score = sum(1 for w in words if w in m)
            if score > best:
                best_lang, best = lang, score
        return best_lang

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_detected"] = [self.detect(t) for t in batch["text"].fillna("")]
        return batch


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


class Fingerprinter:
    """map_batches: 64-bit document fingerprint = stable hash of the
    whitespace-normalized text (rolling-hash analog; exact-dup key)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # mirror of the dedup_exact oracle key TRIM(regexp_replace(text,
        # '\s+', ' ', 'g')): collapse RE2-\s runs first, then trim ASCII
        # spaces only (DuckDB TRIM) — same op order, same char classes
        norm = batch["text"].fillna("").str.replace(_WS_SPLIT, " ", regex=True).str.strip(" ")
        batch["fingerprint"] = hash_str64(norm.to_numpy(dtype=object)).astype(np.uint64)
        return batch

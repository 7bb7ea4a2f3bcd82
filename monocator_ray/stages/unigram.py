"""Unigram-LM tokenizer training + encoding (Kudo 2018, the SentencePiece
unigram model — public method).

Scale shape (shared with stages/bpe.py, the contract every production
tokenizer trainer uses): the corpus collapses to a WORD HISTOGRAM in one
distributed pass (``docs._word_histogram``), then the EM/prune loop runs
driver-side over the vocabulary-sized histogram — each round touches
O(distinct words x word_len x max_piece_len), never the corpus.  Encoding
broadcasts the learned vocabulary once and segments per batch with a
per-worker word memo.

Determinism (the property the distributed goldens pin): this trainer uses
VITERBI-EM with EXACT-RATIONAL path comparison — a segmentation
p_1..p_k of a word scores ``prod(count(p_i)) / total^k``, and two
candidate paths compare by integer cross-multiplication
(``prod_1 * total^k_2 <=> prod_2 * total^k_1``), so no float ever exists
and ties break on (fewer pieces, lexicographically smaller path).  The
result is a pure function of the word histogram, independent of
parallelism, platform and summation order.  (Full forward-backward EM
would sum float expected counts whose partition order varies — the
Viterbi variant is the one that stays bit-deterministic distributed.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

# module-top-level: a lazy import inside worker-executed code breaks under
# pickle-by-value shipping (graft-environment-quirks)
from monocator_ray.stages.textstats import _WS_SPLIT


def seed_vocab(
    word_counts: dict[str, int], max_piece_len: int = 6, seed_size: int = 2000
) -> dict[str, int]:
    """Candidate pieces: every substring of length 1..max_piece_len of
    every word, weighted by word count x occurrences; single characters
    are ALWAYS kept (coverage — any word must be segmentable), longer
    substrings keep the top ``seed_size`` by (count desc, piece asc)."""
    counts: dict[str, int] = {}
    for w, c in word_counts.items():
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    longer = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    out = dict(chars)
    out.update(longer)
    return out


def viterbi_segment(
    word: str, vocab: dict[str, int], total: int, max_piece_len: int = 6
) -> list[str] | None:
    """Best segmentation of ``word`` under the unigram LM with EXACT
    integer path comparison (module docstring).  DP state per prefix
    length: (score numerator prod, piece count k, path tuple); compare
    ``prod_a * total^k_b  vs  prod_b * total^k_a`` — higher wins, ties
    prefer fewer pieces then the lexicographically smaller path.  Returns
    None only if some character is absent from the vocabulary (cannot
    happen for a vocab built by :func:`seed_vocab`, which keeps every
    single character)."""
    n = len(word)
    # best[j]: (prod, k, path) for word[:j]
    best: list[tuple[int, int, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (1, 0, ())
    for j in range(1, n + 1):
        cand: tuple[int, int, tuple[str, ...]] | None = None
        for i in range(max(0, j - max_piece_len), j):
            prev = best[i]
            if prev is None:
                continue
            c = vocab.get(word[i:j])
            if c is None:
                continue
            prod, k, path = prev[0] * c, prev[1] + 1, prev[2] + (word[i:j],)
            if cand is None:
                cand = (prod, k, path)
                continue
            # exact compare: prod/total^k vs cand — cross-multiply
            lhs = prod * total ** cand[1]
            rhs = cand[0] * total ** k
            if lhs > rhs or (lhs == rhs and (k, path) < (cand[1], cand[2])):
                cand = (prod, k, path)
        best[j] = cand
    fin = best[n]
    return list(fin[2]) if fin is not None else None


def unigram_train_from_histogram(
    word_counts: dict[str, int],
    vocab_size: int = 96,
    max_piece_len: int = 6,
    seed_size: int = 2000,
    n_iters: int = 4,
) -> list[tuple[str, int]]:
    """Train the unigram vocabulary on a word histogram: seed candidates,
    then ``n_iters`` Viterbi-EM rounds — E: segment every distinct word
    (weighted by its count) under current piece counts; M: piece count =
    Viterbi occurrence total; prune to max(vocab_size, 3/4 of current)
    keeping every single character alive (floor count 1 so coverage never
    dies), SentencePiece's gradual-shrink schedule.  Returns
    [(piece, count)] sorted by (count desc, piece asc) — a pure function
    of the histogram."""
    vocab = seed_vocab(word_counts, max_piece_len, seed_size)
    words = sorted(word_counts)
    for _ in range(n_iters):
        total = sum(vocab.values())
        counts: dict[str, int] = {}
        for w in words:
            seg = viterbi_segment(w, vocab, total, max_piece_len)
            if seg is None:
                continue
            c = word_counts[w]
            for p in seg:
                counts[p] = counts.get(p, 0) + c
        new: dict[str, int] = {}
        for p in vocab:
            c = counts.get(p, 0)
            if len(p) == 1:
                c = max(c, 1)
            if c > 0:
                new[p] = c
        keep_n = max(vocab_size, (len(new) * 3) // 4)
        chars = {p: c for p, c in new.items() if len(p) == 1}
        longer = sorted(
            ((p, c) for p, c in new.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[: max(0, keep_n - len(chars))]
        vocab = dict(chars)
        vocab.update(longer)
    return sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))


class UnigramEncoder:
    """map_batches task: unigram token count per doc under the broadcast
    vocabulary — per-worker memo of word -> piece count (Zipf hit rate),
    the BpeEncoder discipline."""

    def __init__(self, vocab_ref, max_piece_len: int = 6):
        vocab = ray.get(vocab_ref) if not isinstance(vocab_ref, list) else vocab_ref
        self.vocab = dict(vocab)
        self.total = sum(self.vocab.values())
        self.max_piece_len = max_piece_len
        self.memo: dict[str, int] = {}

    def _pieces(self, word: str) -> int:
        n = self.memo.get(word)
        if n is None:
            seg = viterbi_segment(word, self.vocab, self.total, self.max_piece_len)
            # unknown characters (absent from the training corpus) fall
            # back to one piece per uncovered char — count an <unk> each
            if seg is None:
                known = [ch for ch in word if ch in self.vocab]
                n = len(word) - len(known) + (
                    len(viterbi_segment("".join(known), self.vocab, self.total,
                                        self.max_piece_len) or known))
            else:
                n = len(seg)
            self.memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        counts = np.zeros(len(ids), dtype=np.int64)
        for i, s in enumerate(batch["text"].to_pylist()):
            if not s or not s.strip(" "):
                continue
            counts[i] = sum(
                self._pieces(w) for w in _WS_SPLIT.split(s.strip(" ")) if w
            )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "n_unigram_tokens": pa.array(counts, pa.int64())}
        )

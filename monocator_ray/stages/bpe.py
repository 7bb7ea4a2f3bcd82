"""BPE tokenizer training + encoding (Sennrich et al. 2016, public method).

Scale shape — the one real tokenizer trainers (SentencePiece/HF) use: the
corpus collapses to a WORD HISTOGRAM in one distributed pass (per-batch
partial counts -> word-hash partitions -> exact counts; the histogram is
vocabulary-sized, orders of magnitude smaller than the corpus), then the
merge loop runs on the histogram driver-side — each merge round touches
O(vocab) entries, never the corpus.  Encoding is the reverse: the learned
merge table broadcasts once (ray.put) and a map_batches stage applies it
per batch.

Determinism: ties on pair frequency break by lexicographic pair order, so
the merge table is a pure function of the histogram.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

# module-top-level: a lazy import inside worker-executed code breaks under
# pickle-by-value shipping (graft-environment-quirks)
from monocator_ray.stages.textstats import _WS_SPLIT


def bpe_train_from_histogram(
    word_counts: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Classic histogram BPE (the executable spec): words as symbol tuples
    (chars + trailing '</w>'), repeatedly merge the most frequent adjacent
    pair (ties: lexicographically smallest pair).  Returns the ordered
    merge table."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + ("</w>",): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the
    lowest-rank adjacent pair (the standard BPE encode loop)."""
    syms = list(word) + ["</w>"]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i < 0:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """map_batches task: token count per doc under the broadcast merge
    table — per-worker memo of word -> piece count (Zipf makes the memo
    hit rate high; the memo is bounded by the worker's observed
    vocabulary, the same order as the trainer's histogram)."""

    def __init__(self, merges_ref):
        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.memo: dict[str, int] = {}

    def _pieces(self, word: str) -> int:
        n = self.memo.get(word)
        if n is None:
            n = self.memo[word] = len(bpe_encode_word(word, self.ranks))
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
             "n_bpe_tokens": pa.array(counts, pa.int64())}
        )

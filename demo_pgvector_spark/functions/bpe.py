"""Byte-pair-encoding merges: training, encoding, and the merge-table
artifact format.

The reference drives chunk boundaries with a HuggingFace BPE tokenizer
(src/lib/documents.py:67-90, model at :41-43). That tokenizer is a merge
TABLE plus the standard greedy merge loop — both public algorithms
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units"; the encoder is the GPT-2 reference loop). This module
implements exactly that pair, so the engine's ``chunk_bpe`` operator can
run REAL learned merge costs instead of the fixed-length proxy, with a
merge table trained on the testdata corpus committed as a repo artifact
(golden/bpe_merges.txt — see tools/train_bpe.py for the reproducible
build).

Scope note: merges operate WITHIN pre-tokenized pieces (the ``\\w+|[^\\w\\s]``
ASCII pre-tokenizer shared by the Catalyst path, the Arrow UDF and the
DuckDB oracle), exactly like real BPE vocabularies apply merges within
pre-tokens. No end-of-word marker: pieces are standalone units here, so
the marker would be a constant suffix carrying no boundary information.

Determinism: training breaks pair-count ties lexicographically and the
encoder breaks rank ties left-to-right, so the same corpus always yields
the same table and the same encoding — the property the DuckDB golden
oracle depends on.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable


def train_bpe(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from a word-frequency table.

    Classic BPE training: every word starts as its character sequence;
    each step merges the adjacent symbol pair with the highest corpus
    frequency (ties → lexicographically smallest pair, which makes the
    table deterministic) and rewrites the affected words. Stops early if
    no pair occurs at least twice — merging hapax pairs would just
    memorize the corpus.
    """
    words: dict[tuple[str, ...], int] = {
        tuple(w): f for w, f in word_freqs.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: Counter[tuple[str, str]] = Counter()
        for sym, freq in words.items():
            for i in range(len(sym) - 1):
                pair_counts[(sym[i], sym[i + 1])] += freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, freq in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + freq
        words = new_words
    return merges


def train_bpe_fast(
    word_freqs: dict[str, int], num_merges: int
) -> list[tuple[str, str]]:
    """``train_bpe`` with incremental pair-count maintenance — identical
    output (same merges in the same order; pytest-pinned equivalence),
    but each step touches only the words that CONTAIN the merged pair
    instead of rescanning the whole vocabulary. This is the standard
    efficient formulation (Sennrich et al. 2016 release notes); it makes
    pretrained-scale tables (10k+ merges, tools/train_bpe_pretrained.py)
    tractable where the didactic loop is O(merges × vocabulary)."""
    words: dict[int, list] = {}  # wid -> [symbols, freq]
    merged_keys: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        if not w:
            continue
        key = tuple(w)
        wid = merged_keys.get(key)
        if wid is None:
            wid = len(words)
            merged_keys[key] = wid
            words[wid] = [list(key), 0]
        words[wid][1] += f

    pair_counts: Counter[tuple[str, str]] = Counter()
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wid, (sym, freq) in words.items():
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] += freq
            pair_words.setdefault(p, set()).add(wid)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best, cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        for wid in list(pair_words.get(best, ())):
            sym, freq = words[wid]
            # retract this word's current pair contributions
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pair_counts[p] -= freq
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(wid)
                    if not ws:
                        del pair_words[p]
            # rewrite with the merge applied (leftmost-first, as train_bpe)
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[wid][0] = out
            for i in range(len(out) - 1):
                p = (out[i], out[i + 1])
                pair_counts[p] += freq
                pair_words.setdefault(p, set()).add(wid)
    return merges


def merge_ranks(merges: Iterable[tuple[str, str]]) -> dict[tuple[str, str], int]:
    """Pair → priority (lower = earlier-learned = applied first)."""
    return {pair: rank for rank, pair in enumerate(merges)}


def encode(piece: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one pre-token piece with the learned merges — the
    standard greedy loop: repeatedly apply the lowest-rank adjacent pair
    (leftmost occurrence on rank ties) until no learned pair remains."""
    if not piece:
        return []
    sym: list[str] = list(piece)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def n_tokens(piece: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one piece under the merge table (≥1 for non-empty)."""
    return len(encode(piece, ranks))


def save_merges(merges: list[tuple[str, str]], path: str) -> None:
    """One merge per line, the two symbols tab-separated (symbols can
    contain any non-tab character; the corpus pre-tokenizer never emits
    whitespace inside a piece, but tab-separation keeps the format
    unambiguous regardless)."""
    with open(path, "w", encoding="utf-8") as fh:
        for a, b in merges:
            fh.write(f"{a}\t{b}\n")


def load_merges(path: str) -> list[tuple[str, str]]:
    merges: list[tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            a, b = line.split("\t", 1)
            merges.append((a, b))
    return merges

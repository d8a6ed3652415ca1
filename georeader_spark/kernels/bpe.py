"""Byte-pair encoding — pure-Python kernel (training + encoding).

The classic Sennrich et al. 2016 algorithm over UTF-8 bytes: start
from the 256 byte symbols, repeatedly merge the most frequent adjacent
pair. TRAINING is inherently sequential in the merge order (each merge
changes the pair statistics the next merge is chosen from) and runs on
a corpus SAMPLE driver-side — exactly how production tokenizers are
built (GPT-2's BPE was trained once, single-node, then applied at
corpus scale). ENCODING is embarrassingly parallel per document and is
what the Spark operator distributes (operators/bpe.py).

Ties in pair frequency break by first-seen order (insertion order of
the pair-counts dict) — deterministic for a fixed sample order.

No reference counterpart: the reference engine has no text surface;
this kernel exists for the webtext graft's token-accounting brief.
"""

from __future__ import annotations

from collections import Counter


def _pair_counts(words: dict[tuple[int, ...], int]) -> Counter:
    c: Counter = Counter()
    for sym, n in words.items():
        for a, b in zip(sym, sym[1:]):
            c[(a, b)] += n
    return c


def _merge_word(sym: tuple[int, ...], pair: tuple[int, int], new_id: int):
    out = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
            out.append(new_id)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def train_bpe(texts, n_merges: int) -> list[tuple[int, int]]:
    """Learn ``n_merges`` merges from an iterable of strings.

    Words are whitespace-split chunks encoded to UTF-8 bytes (symbols
    0..255); merge k creates symbol ``256 + k``. Returns the ordered
    merge list ``[(left_id, right_id), ...]`` — the entire model.
    """
    words: dict[tuple[int, ...], int] = {}
    for t in texts:
        for w in t.split():
            sym = tuple(w.encode("utf-8"))
            if sym:
                words[sym] = words.get(sym, 0) + 1
    merges: list[tuple[int, int]] = []
    for k in range(n_merges):
        counts = _pair_counts(words)
        if not counts:
            break
        best = max(counts.items(), key=lambda kv: kv[1])[0]
        new_id = 256 + k
        words = {
            _merge_word(sym, best, new_id): n for sym, n in words.items()
        }
        merges.append(best)
    return merges


def encode_word(word_bytes: bytes, ranks: dict[tuple[int, int], int],
                n_base: int = 256) -> list[int]:
    """Encode one word's bytes with the trained merges: repeatedly apply
    the LOWEST-RANK applicable merge (the canonical BPE apply order —
    merge priority is training order, not position)."""
    sym = list(word_bytes)
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [n_base + best_rank]
    return sym


def encode(text: str, merges: list[tuple[int, int]]) -> list[int]:
    """Encode a document: whitespace-split words encoded independently
    (merges never cross whitespace — the standard pre-tokenization)."""
    ranks = {pair: i for i, pair in enumerate(merges)}
    out: list[int] = []
    for w in text.split():
        out.extend(encode_word(w.encode("utf-8"), ranks))
    return out


def decode(ids: list[int], merges: list[tuple[int, int]]) -> bytes:
    """Token ids → the concatenated word bytes (whitespace positions
    are not recoverable — BPE over split words is lossy on whitespace;
    tests pin ``decode(encode(w)) == w`` per word)."""
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    for k, (a, b) in enumerate(merges):
        table[256 + k] = table[a] + table[b]
    return b"".join(table[i] for i in ids)

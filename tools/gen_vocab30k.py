#!/usr/bin/env python3
"""Deterministic 30,000-piece synthetic WordPiece vocabulary.

Production tokenizers ship a trained ~30k-piece vocab file (~300 KB) as a
model artifact; q367 proves the graft_wordpiece expression at that size.
This generator is seedless-deterministic (explicit 64-bit LCG, no
library RNG) so the checked-in artifact is reproducible byte-for-byte:

    python3 tools/gen_vocab30k.py            # rewrites tools/artifacts/

Composition (all pieces match [A-Za-z0-9#]+ — the sqlVocabValuesOf
interpolation guard):
  * every [a-z0-9] single char as word-start AND ##continuation (72) —
    alphanumeric words always tokenize, [UNK] stays reserved for
    out-of-alphabet input, same as the fixture vocab;
  * the fixture's multi-char pieces (so corpus words like "window",
    "customer" still segment interestingly and q365's planted matches
    stay exercised at 30k);
  * LCG-generated [a-z0-9] pieces, lengths 2..12 weighted toward 3..6
    (a BERT-like length profile), half continuations, deduped to 30,000
    total.
Output sorted (canonical diffs); piece order never affects greedy
longest-match.
"""
import os

OUT = os.path.join(os.path.dirname(__file__), "artifacts",
                   "wordpiece_vocab_30k.txt")
ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"
# fixture multi pieces (graft.operators.Wordpiece.multi) verbatim
FIXTURE_MULTI = [
    "the", "scan", "fast", "slow", "table", "tab", "val", "##ue", "##le",
    "win", "##dow", "cust", "##omer", "qu", "##ery", "str", "##eam",
    "gr", "##oup", "batch", "merge", "ord", "##er", "spark", "line",
    "sort", "key", "agg", "row", "part", "hash", "data", "col", "##umn",
    "join", "small", "big", "filter", "vec", "##tor"]
# lengths 2..12, weighted toward the 3..6 a trained vocab concentrates on
LEN_WEIGHTS = [(2, 6), (3, 18), (4, 22), (5, 18), (6, 12), (7, 8),
               (8, 6), (9, 4), (10, 3), (11, 2), (12, 1)]
LEN_POOL = [n for n, w in LEN_WEIGHTS for _ in range(w)]


def main():
    x = 0x67726166745f7770  # "graft_wp"
    def nxt():
        nonlocal x
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return x >> 16  # drop low bits (LCG low bits are weak)

    pieces = set(c for c in ALPHA) | set("##" + c for c in ALPHA)
    pieces |= set(FIXTURE_MULTI)
    while len(pieces) < 30000:
        n = LEN_POOL[nxt() % len(LEN_POOL)]
        body = "".join(ALPHA[nxt() % len(ALPHA)] for _ in range(n))
        pieces.add("##" + body if nxt() % 2 else body)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        for p in sorted(pieces):
            f.write(p + "\n")
    print(f"wrote {len(pieces)} pieces to {OUT}")


if __name__ == "__main__":
    main()

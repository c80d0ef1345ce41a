#!/usr/bin/env python3
"""Independent pure-Python twin of graft.operators.llm.Bpe — generates
the committed fixture oracle for `llm_bpe_tokenize`.

Implements classic Sennrich'16 BPE training (top-K word-frequency
table, most-frequent-pair merges, ties to the lexicographically
smallest pair, stop when no pair repeats) and GPT-2-style encoding
(lowest-rank adjacent pair first), with the SAME determinism contract
as the Scala implementation but sharing no code with it. Any
divergence between the two implementations fails the correctness gate
on the md5 of every document's full token sequence.

Usage:
    python3 tools/gen_bpe_fixture.py /root/testdata/sf0.01 \
        tools/fixtures/bpe_sf001.parquet
"""
import hashlib
import sys
from collections import Counter

import duckdb

END = "</w>"
NUM_MERGES = 200
VOCAB_WORDS = 2000


def words_of(text):
    return [w for w in text.lower().split() if w]


def merge_pair(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train(word_freq):
    top = sorted(word_freq.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_WORDS]
    words = [(list(w) + [END], f) for w, f in top]
    merges = []
    while len(merges) < NUM_MERGES:
        pairs = Counter()
        for syms, f in words:
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        (a, b), best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best < 2:
            break
        merges.append((a, b))
        words = [(merge_pair(syms, a, b), f) for syms, f in words]
    return {p: r for r, p in enumerate(merges)}


def encode_word(word, ranks, memo):
    if word in memo:
        return memo[word]
    syms = list(word) + [END]
    while len(syms) > 1:
        ranked = [(ranks.get((syms[i], syms[i + 1])), i)
                  for i in range(len(syms) - 1)]
        ranked = [(r, i) for r, i in ranked if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        syms = merge_pair(syms, syms[i], syms[i + 1])
    memo[word] = syms
    return syms


def main(sf_dir, out_path):
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') "
        "ORDER BY doc_id").fetchall()
    freq = Counter()
    for _, text in docs:
        freq.update(words_of(text))
    ranks = train(freq)
    memo = {}
    rows = []
    for doc_id, text in docs:
        toks = []
        for w in words_of(text):
            toks.extend(encode_word(w, ranks, memo))
        h = hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest()
        rows.append((doc_id, len(toks), h))
    con.execute("CREATE TABLE fx (doc_id BIGINT, bpe_token_ct INT, "
                "tokens_md5 VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?, ?, ?)", rows)
    con.execute(f"COPY fx TO '{out_path}' (FORMAT PARQUET)")
    print(f"wrote {len(rows)} rows, {len(ranks)} merges -> {out_path}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Differential check of the l42 BPE-train ORACLE against an independent
greedy-BPE reference on synthetic corpora.

The Spark side has its own differential spec (TextStats fold vs a driver
reference); this guards the DuckDB side: the oracle's windowed
gaps-and-islands merge-apply must equal leftmost-greedy BPE — including
same-symbol runs (a run "b b b b b" must merge to "bb bb b", where a naive
string replace pairs the wrong occurrences).

Usage: python3 tools/bpe_oracle_check.py <outDir>   (after graft.Verify,
reads <outDir>/oracle_sql.json so the EXACT shipped SQL is what's tested).
"""
import collections, json, os, random, re, sys
import duckdb


def greedy_ref(docs, rounds=3):
    vocab = collections.Counter()
    for d in docs:
        for tok in re.split(r"[^a-z0-9]+", d.lower()):
            if tok:
                vocab[tok] += 1
    words = {tok: list(tok) for tok in vocab}
    merges = []
    for r in range(1, rounds + 1):
        pc = collections.Counter()
        for tok, syms in words.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += vocab[tok]
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(),
                             key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append((r, a, b, a + b, cnt))
        for tok, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[tok] = out
    return merges


def main(out_dir):
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    train = sql["l42_bpe_train"]
    rnd = random.Random(7)
    corpora = [
        ["bbbbb bbbb bbb bb b", "bbbbb bbbbb", "bb bb bb"],
        ["aaaa baab abab aab", "abababab aabb", "aaaaaaa"],
        [" ".join("".join(rnd.choice("ab") for _ in range(rnd.randint(1, 9)))
                  for _ in range(30)) for _ in range(5)],
        [" ".join("b" * rnd.randint(1, 12) for _ in range(20))],
        [" ".join("".join(rnd.choice("abc") for _ in range(rnd.randint(1, 7)))
                  for _ in range(50)) for _ in range(8)],
    ]
    bad = 0
    for ci, docs in enumerate(corpora):
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
        for i, d in enumerate(docs):
            con.execute("INSERT INTO documents VALUES (?, ?)", [i, d])
        # UNION ALL gives no row-order guarantee: sort both sides by round.
        got = sorted(tuple(r) for r in con.execute(train).fetchall())
        want = sorted(greedy_ref(docs))
        if got != want:
            print(f"FAIL corpus {ci}: oracle {got} != reference {want}")
            bad += 1
        else:
            print(f"PASS corpus {ci}: {want}")
    print(f"== {len(corpora) - bad} pass, {bad} fail ==")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

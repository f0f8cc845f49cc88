"""BPE training/encoding vs a pure-python reference implementation
(Sennrich et al. 2016 algorithm 1) — the non-SQL pytest oracle for the
rows-only `bpe_merges` driver query."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.operators.bpe import (
    END,
    bpe_encode,
    bpe_train,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the lowest newest widest low",
]


def _py_bpe_train(texts: list[str], n_merges: int):
    """Reference BPE on word frequencies, lexicographic tiebreak."""
    wc = Counter(w for t in texts for w in t.lower().split() if w)
    syms = {w: tuple(list(w) + [END]) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, n in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), cnt = best
        merges.append((l, r, cnt))
        for w in syms:
            s = list(syms[w])
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges, syms


def _py_encode(word: str, merges) -> int:
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    s = list(word) + [END]
    while len(s) >= 2:
        cands = [
            (ranks[(s[i], s[i + 1])], i)
            for i in range(len(s) - 1)
            if (s[i], s[i + 1]) in ranks
        ]
        if not cands:
            break
        _, i = min(cands)
        s[i : i + 2] = [s[i] + s[i + 1]]
    return len(s)


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_bpe_train_matches_reference(spark):
    got, table = bpe_train(_df(spark), n_merges=12, checkpoint_every=4)
    want, ref_syms = _py_bpe_train(CORPUS, 12)
    assert got == want
    # distributed symbol table state matches the reference after all merges
    rows = {r["word"]: tuple(r["syms"]) for r in table.collect()}
    assert rows == ref_syms


def test_bpe_merge_fold_overlapping_runs(spark):
    """Greedy left-to-right on 'aaaa' with merge (a,a) -> [aa, aa]."""
    from census_asc5_data_pipeline_spark.operators.bpe import _merge_fold

    df = spark.createDataFrame([(["a", "a", "a", "a"],)], ["syms"])
    out = df.select(_merge_fold(F.col("syms"), "a", "a").alias("m")).collect()
    assert out[0]["m"] == ["aa", "aa"]


def test_bpe_encode_matches_reference(spark):
    merges, _ = bpe_train(_df(spark), n_merges=12, checkpoint_every=4)
    out = {r.doc_id: r for r in bpe_encode(_df(spark), merges).collect()}
    for i, t in enumerate(CORPUS):
        want = sum(_py_encode(w, merges) for w in t.lower().split())
        assert out[i].n_bpe_tokens == want
        # merges only ever shrink the token stream vs chars, and BPE
        # tokens are never fewer than words
        assert out[i].n_bpe_tokens >= out[i].n_words

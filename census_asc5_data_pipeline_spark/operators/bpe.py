"""Distributed BPE tokenizer training + encoding.

Byte-pair-encoding merge-table training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") as a
Spark job — the canonical "train the tokenizer on the corpus" step of
a pre-training data pipeline.

Scale design (100 TB):
- Training runs on the DISTINCT-WORD frequency table, not the raw
  corpus: one corpus-wide word count collapses terabytes of text into
  a vocabulary-sized symbol table (Heaps' law: ~10⁶-10⁷ rows), which
  every merge iteration then transforms in place — the corpus itself
  is never re-scanned after the first pass.
- Each merge iteration is ONE map-side-combinable pair-count aggregate
  plus ONE driver fetch of a single (best-pair) row; the symbol-table
  transform is a pure JVM array fold (no UDF). Lineage is cut with
  localCheckpoint every few merges so the plan stays bounded.
- Only the merge table (``n_merges`` rows) ever lives on the driver —
  the symbol table stays distributed, exactly like IVF's k×dim
  centroid contract (operators/similarity.py).
- Encoding is a vectorized Arrow pandas_udf applying the (broadcast)
  merge list per batch — tokenization is the one genuinely-Python text
  kernel family (HF tokenizers are native code for the same reason),
  and the merge loop is data-dependent per word, which Catalyst
  expressions cannot express without an n_merges-deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.functions import explode_computed, words

END = "</w>"


def _word_symbol_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n, syms): corpus word frequencies with each word split
    into its initial character symbols + the end-of-word marker."""
    toks = explode_computed(df, words(F.col(text_col)), "word", keep=()).filter(
        F.length("word") > 0
    )
    wc = toks.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    chars = F.split(F.col("word"), "")
    # The symbol table is vocabulary-sized (Heaps' law: ~10⁶-10⁷ words
    # even at 100 TB), but it inherits the word-count shuffle's
    # partitioning (e.g. 200 on a default session) — and EVERY merge
    # iteration then schedules that many tasks over a tiny cached
    # table. Pin it to the cluster's parallelism instead.
    return wc.select(
        "word", "n", F.concat(chars, F.array(F.lit(END))).alias("syms")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism, "word")


def _merge_fold(syms, left: str, right: str):
    """Replace adjacent (left, right) symbol pairs with their
    concatenation, greedy left-to-right — one JVM array fold, the exact
    merge semantics of reference BPE (non-overlapping, leftmost
    first)."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 32,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, final_symbol_table): ``merges`` is the ordered
    list of (left, right, pair_count) — the tokenizer artifact — and
    the symbol table is the distributed (word, n, syms) state after
    all merges (useful for vocab statistics).

    Tie-break on equal pair counts is lexicographic (left, right) so
    the learned merge sequence is deterministic and engine-portable.
    """
    syms = _word_symbol_table(df, text_col).persist()
    prev: DataFrame | None = None
    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        # ONE job per merge: pair-count aggregate + global argmax as a
        # single min(struct(-cnt, l, r)) — struct ordering encodes the
        # (count desc, left asc, right asc) tiebreak, so no sort stage
        # and only one row crosses to the driver. This job is also what
        # first materializes this iteration's cached symbol table (its
        # parent stays cached until then — two-deep cache window below).
        pair = F.struct(
            F.element_at("__pp", 1).alias("l"), F.element_at("__pp", 2).alias("r")
        )
        best = (
            syms.filter(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.array(
                            F.element_at(F.col("syms"), i),
                            F.element_at(F.col("syms"), i + 1),
                        ),
                    )
                ).alias("__pp"),
            )
            .select(pair.alias("p"), "n")
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("p.l").alias("l"),
                        F.col("p.r").alias("r"),
                    )
                ).alias("b")
            )
            .head(1)
        )
        if not best or best[0]["b"] is None:
            break
        left, right = best[0]["b"]["l"], best[0]["b"]["r"]
        merges.append((left, right, int(-best[0]["b"]["nc"])))
        nxt = syms.withColumn("syms", _merge_fold(F.col("syms"), left, right))
        # cut lineage periodically: each merge nests one more fold into
        # the plan; localCheckpoint keeps analysis/codegen cost flat
        if (it + 1) % checkpoint_every == 0:
            nxt = nxt.localCheckpoint()  # eager: safe to drop both parents
            if prev is not None:
                prev.unpersist()
            syms.unpersist()
            prev = None
        else:
            # lazy persist: `nxt` first materializes during the NEXT
            # iteration's pair job, reading `syms`' cache — so `syms`
            # must stay cached until then; only the grandparent is done
            nxt = nxt.persist()
            if prev is not None:
                prev.unpersist()
            prev = syms
        syms = nxt
    if prev is not None:
        prev.unpersist()
    return merges, syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned merge table: per-doc BPE token count + the
    resulting distinct-token tally — the 'how many tokens is my corpus'
    question every training run starts with.

    Arrow pandas_udf over batches; the merge list is a tiny broadcast
    closure. The per-word merge loop is data-dependent (each merge
    changes the symbol string the next merge scans), which is exactly
    the shape Catalyst cannot express without an n_merges-deep nested
    plan — the documented UDF-is-justified case.
    """
    import pandas as pd

    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def encode_word(word: str) -> int:
        syms = list(word) + [END]
        while len(syms) >= 2:
            best_i, best_rank = -1, None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_i, best_rank = i, rk
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    @F.pandas_udf("bigint")
    def n_bpe_tokens(texts):
        from functools import lru_cache

        enc = lru_cache(maxsize=65536)(encode_word)
        return pd.Series(
            [
                sum(enc(w) for w in t.lower().split()) if t else 0
                for t in texts
            ],
            dtype="int64",
        )

    return df.select(
        "doc_id",
        F.size(words(F.col(text_col))).cast("bigint").alias("n_words"),
        n_bpe_tokens(F.col(text_col)).alias("n_bpe_tokens"),
    )

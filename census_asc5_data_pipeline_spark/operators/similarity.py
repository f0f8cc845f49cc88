"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is tiny and broadcast, so the "crossJoin" is really a
  broadcast nested loop whose cost is linear in corpus size and fully
  parallel across partitions; the dot product is a JVM fold
  (zip_with + aggregate), no Python.
- ``lsh_topk``: random-hyperplane LSH variant — the 100 TB path. The
  corpus is hashed once into sign-pattern buckets; queries probe only
  their own bucket (plus optional multi-probe neighbors).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from census_asc5_data_pipeline_spark.functions import cosine, dot, to_double_array


def _exact_rerank_topk(matched: DataFrame, k: int) -> DataFrame:
    """Shared tail of every ANN variant: exact micro-fixed-point cosine
    on (query_id, qv, cand_id, cv) candidates, deterministic top-k."""
    from pyspark.sql import Window

    scored = matched.filter(F.col("cand_id") != F.col("query_id")).withColumn(
        "cos_micro",
        F.floor(cosine(F.col("qv"), F.col("cv")) * 1000000.0 + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_micro").desc(), F.col("cand_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
        .select("query_id", "cand_id", "cos_micro", "rn")
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against ``corpus``.

    Ranking is on the 6-decimal-rounded cosine with an id tiebreak so
    the top-k set is deterministic and engine-portable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("cand_id"), to_double_array(vec_col).alias("cv"))
    return _exact_rerank_topk(c.crossJoin(F.broadcast(q)), k)


def cosine_near_dup_pairs(
    corpus: DataFrame,
    threshold_micro: int = 300000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cos(a,b) >= threshold — the exact correctness kernel.

    This is the brute O(n²) verifier; the 100 TB path prefilters
    candidates with ``lsh_bucket`` (equi-join on sign-pattern buckets)
    and then applies this exact score inside buckets.
    """
    a = corpus.select(
        F.col(id_col).alias("vec_id_a"), to_double_array(vec_col).alias("va")
    )
    b = corpus.select(
        F.col(id_col).alias("vec_id_b"), to_double_array(vec_col).alias("vb")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .withColumn(
            "cos_micro",
            F.floor(cosine(F.col("va"), F.col("vb")) * 1000000.0 + F.lit(0.5)).cast(
                "bigint"
            ),
        )
        .filter(F.col("cos_micro") >= threshold_micro)
        .select("vec_id_a", "vec_id_b", "cos_micro")
    )


def rademacher_planes(dim: int, planes: int, seed: int = 42) -> list[list[int]]:
    """Deterministic ±1 (Rademacher) hyperplanes derived from md5 — the
    sign of plane q, coordinate d is +1 iff the first hex digit of
    ``md5("plane:{seed}:{q}:{d}")`` is 0-7.

    Rademacher projections are a standard random-projection family
    (sign-LSH works with any symmetric zero-mean entries); deriving
    them from md5 instead of a PRNG makes the plane matrix portable —
    any engine with md5 (DuckDB included) reproduces the exact buckets,
    so the LSH output is hash-verifiable cross-engine.
    """
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"plane:{seed}:{q}:{d}".encode()).hexdigest()[0]
            in "01234567"
            else -1
            for d in range(dim)
        ]
        for q in range(planes)
    ]


def _quantized(vec_col) -> "F.Column":
    """Per-element micro-fixed-point quantization (FLOOR(x*1e6+0.5) as
    BIGINT): makes every downstream projection exact integer arithmetic,
    bit-identical across engines regardless of float summation order."""
    return F.transform(
        vec_col, lambda x: F.floor(x.cast("double") * 1000000.0 + F.lit(0.5)).cast("bigint")
    )


def _int_bucket(vq_col, planes: list[list[int]]):
    """Sign-pattern bucket over integer-quantized vectors: bit p = 1 iff
    Σ_d vq[d]·plane_p[d] > 0 — pure bigint arithmetic, no float ties."""
    bits = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(int(x)) for x in plane])
        s = F.aggregate(
            F.zip_with(vq_col, lit_plane, lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(s > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("bigint")


def cosine_near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold_micro: int = 300000,
    bands: int = 8,
    planes_per_band: int = 8,
    dim: int | None = None,
    seed: int = 42,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding near-dup pairs, the 100 TB path: banded random-
    hyperplane LSH candidate generation (equi-join on (band, bucket))
    followed by exact cosine verification — never an O(n²) cross join.

    Semantics: the output is the subset of ``cosine_near_dup_pairs``
    whose pair collides in at least one band (hamming distance of the
    band's sign-bucket <= 1 when ``multiprobe``, == 0 otherwise), each
    emitted pair exactly scored — precision vs the brute kernel is 1.0
    by construction. Candidate recall follows the OR-amplified curve
    1-(1-p(θ)^r)^b with p(θ)=1-θ/π: >= 0.99 for true near-dups
    (cos >= 0.9) at the 8x8 multiprobe default. The brute kernel is the
    pytest oracle: tests/test_similarity.py::test_near_dup_lsh_subset
    asserts output ⊆ brute with identical scores, and
    ::test_near_dup_lsh_planted_recall asserts planted near-identical
    pairs are all recovered.

    Cross-engine determinism: planes are md5-derived ±1 signs
    (``rademacher_planes``) and projections run on micro-quantized
    integer vectors (``_quantized``), so bucket ids are exact integer
    math — DuckDB reproduces them bit-for-bit (see
    SQL_EMB_COSINE_PAIRS in queries.py), which is what lets the driver
    hash-verify an LSH query instead of downgrading it to rows-only.

    Scale shape: one narrow bucketing map over the corpus (the plane
    matrix ships as literals), a self-equi-join on 10-byte
    (band, bucket) keys — shuffle bounded by bucket sizes, never n² —
    a distinct on candidate id pairs, then two id-joins to fetch
    vectors only for candidates. ``multiprobe`` explodes the probe side
    to all hamming-1 buckets: bands*(planes_per_band+1) rows per vector
    instead of bands, corpus side untouched.

    ``dim`` defaults to the width of the first vector (one cheap
    head(1) job); pass it explicitly to skip that lookup. A mismatched
    ``dim`` would silently degenerate every bucket to 0 (null dot), so
    deriving it from the data is the safe default.
    """
    if dim is None:
        first = corpus.select(F.size(F.col(vec_col)).alias("d")).head(1)
        if not first:  # empty corpus -> empty pair set, skip bucketing
            return corpus.sparkSession.createDataFrame(
                [], "vec_id_a long, vec_id_b long, cos_micro long"
            )
        dim = first[0]["d"]
    hp = rademacher_planes(dim, bands * planes_per_band, seed)
    v = corpus.select(
        F.col(id_col).alias("vec_id"), _quantized(F.col(vec_col)).alias("vq")
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                _int_bucket(
                    F.col("vq"), hp[b * planes_per_band : (b + 1) * planes_per_band]
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    buckets = v.select("vec_id", F.explode(band_structs).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a = buckets.select(F.col("vec_id").alias("vec_id_a"), "band", "bh")
    b = buckets
    if multiprobe:
        b = b.select(
            "vec_id",
            "band",
            F.explode(
                F.array(
                    F.col("bh"),
                    *[
                        F.col("bh").bitwiseXOR(F.lit(1 << p))
                        for p in range(planes_per_band)
                    ],
                )
            ).alias("bh"),
        )
    b = b.select(F.col("vec_id").alias("vec_id_b"), "band", "bh")
    cand = (
        a.join(b, ["band", "bh"])
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b")
        .distinct()
    )
    va = corpus.select(
        F.col(id_col).alias("vec_id_a"), to_double_array(vec_col).alias("va")
    )
    vb = corpus.select(
        F.col(id_col).alias("vec_id_b"), to_double_array(vec_col).alias("vb")
    )
    return (
        cand.join(va, "vec_id_a")
        .join(vb, "vec_id_b")
        .withColumn(
            "cos_micro",
            F.floor(cosine(F.col("va"), F.col("vb")) * 1000000.0 + F.lit(0.5)).cast(
                "bigint"
            ),
        )
        .filter(F.col("cos_micro") >= threshold_micro)
        .select("vec_id_a", "vec_id_b", "cos_micro")
    )


def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(planes, dim).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-pattern bucket id for one vector: bit p = 1 iff v·plane_p>0.
    Pure column expression — the plane matrix ships as literals."""
    bits = []
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(vec_col, lit_plane) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        )
    return sum(bits[1:], bits[0]).cast("bigint")


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    iterations: int = 1,
) -> list[list[float]]:
    """IVF coarse quantizer: deterministic seeds (the ``n_centroids``
    lowest-id vectors) refined by ``iterations`` distributed Lloyd
    steps.

    Each step is one narrow assignment pass (centroids ship as literal
    arrays — k×dim doubles, trivially broadcastable) plus one
    (cluster, dim) mean aggregation; only k×dim rows ever reach the
    driver, never vectors.
    """
    seeds = (
        corpus.select(to_double_array(vec_col).alias("v"), F.col(id_col))
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    if not seeds:
        raise ValueError("ivf_centroids: empty corpus")
    cents: list[list[float]] = [list(r.v) for r in seeds]
    n_centroids = len(cents)  # corpus may hold fewer rows than requested
    for _ in range(iterations):
        assigned = corpus.select(
            to_double_array(vec_col).alias("v")
        ).withColumn("cluster", _nearest_centroid(F.col("v"), cents))
        means = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.m
        cents = [
            [by_cluster[c][p] for p in range(len(cents[0]))]
            if c in by_cluster
            else cents[c]  # empty cluster keeps its seed
            for c in range(n_centroids)
        ]
    return cents


def _nearest_centroid(vec, cents: list[list[float]]):
    """argmax-cosine cluster id as one column expression: array_max over
    (cos_micro, -cid) structs — deterministic tie-break to lowest id."""
    scored = F.array(
        *[
            F.struct(
                F.floor(
                    cosine(vec, F.array(*[F.lit(float(x)) for x in c])) * 1000000.0
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("s"),
                F.lit(-cid).alias("negcid"),
            )
            for cid, c in enumerate(cents)
        ]
    )
    return (-F.array_max(scored)["negcid"]).cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize the corpus into inverted lists,
    probe each query's ``nprobe`` nearest lists, exact-rerank inside.

    At scale the corpus pass is one narrow map (cluster id per row) and
    the search is an equi-join on cluster id against the tiny broadcast
    probe table — shuffle bounded by probed-list sizes, never n².
    Recall < 1 by design; tested against ``cosine_topk``.
    """
    cents = ivf_centroids(corpus, n_centroids, vec_col, id_col)
    c = corpus.select(
        F.col(id_col).alias("cand_id"), to_double_array(vec_col).alias("cv")
    ).withColumn("cluster", _nearest_centroid(F.col("cv"), cents))
    scored_cents = F.array(
        *[
            F.struct(
                F.floor(
                    cosine(F.col("qv"), F.array(*[F.lit(float(x)) for x in cc]))
                    * 1000000.0
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("s"),
                F.lit(cid).alias("cid"),
            )
            for cid, cc in enumerate(cents)
        ]
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qv")
        )
        .withColumn(
            "__probe",
            F.explode(
                F.transform(
                    F.slice(F.reverse(F.array_sort(scored_cents)), 1, nprobe),
                    lambda s: s["cid"],
                )
            ),
        )
        .withColumn("cluster", F.col("__probe").cast("int"))
        .drop("__probe")
    )
    return _exact_rerank_topk(c.join(F.broadcast(probes), "cluster"), k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    multiprobe: bool = False,
) -> DataFrame:
    """ANN top-k: random-hyperplane bucketing + exact rerank in-bucket.

    At scale: corpus bucketing is one narrow map; the join is an
    equi-join on bucket id (shuffle bounded by bucket sizes, not n²).
    Recall < 1 by design — tested against ``cosine_topk`` recall.
    ``multiprobe`` additionally probes all hamming-1 buckets.
    """
    hp = _hyperplanes(dim, planes, seed)
    c = corpus.select(
        F.col(id_col).alias("cand_id"), to_double_array(vec_col).alias("cv")
    ).withColumn("bucket", lsh_bucket(F.col("cv"), hp))
    q = queries.select(
        F.col(id_col).alias("query_id"), to_double_array(vec_col).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), hp))
    if multiprobe:
        # probe the exact bucket plus every hamming-1 neighbor (flip one
        # hyperplane sign): recall of near-boundary vectors goes way up
        # at the cost of planes+1 probes per query — still an equi-join,
        # corpus side untouched.
        probe = F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(planes)
                ],
            )
        )
        q = q.withColumn("bucket", probe)
    return _exact_rerank_topk(c.join(F.broadcast(q), "bucket"), k)

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from census_asc5_data_pipeline_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_lsh,
    cosine_topk,
    ivf_topk,
    lsh_topk,
    rademacher_planes,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(200, 16).astype("float32")
    # plant: vec 100 = vec 0 + tiny noise (guaranteed nearest neighbor)
    vecs[100] = vecs[0] + 0.01 * rng.randn(16).astype("float32")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, schema)


def test_brute_force_topk_exact(emb):
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=5, vec_col="embedding")
    rows = sorted(out.collect(), key=lambda r: r.rn)
    assert rows[0].cand_id == 100  # the planted near-duplicate wins
    assert rows[0].cos_micro > 990000
    assert [r.rn for r in rows] == [1, 2, 3, 4, 5]


def test_brute_force_matches_numpy(emb):
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 3), k=3)
    pdf = emb.toPandas().sort_values("vec_id")
    mat = np.array(pdf["embedding"].tolist(), dtype="float64")
    q = mat[3]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    cos[3] = -np.inf
    top = np.argsort(-cos)[:3]
    got = [r.cand_id for r in sorted(out.collect(), key=lambda r: r.rn)]
    assert got == top.tolist()


def test_lsh_recall_of_planted_pair(emb):
    out = lsh_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=5, planes=4, dim=16
    ).collect()
    # near-identical vectors land in the same hyperplane bucket
    assert any(r.cand_id == 100 for r in out)


def test_ivf_recall_of_planted_pair(emb):
    out = ivf_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=5, n_centroids=8, nprobe=3
    ).collect()
    # the near-duplicate shares (or neighbors) the query's inverted list
    assert any(r.cand_id == 100 for r in out)


def test_ivf_recall_vs_brute_force(emb):
    queries = emb.filter(F.col("vec_id") < 10)
    brute = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        brute.setdefault(r.query_id, set()).add(r.cand_id)
    approx = {}
    for r in ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=4).collect():
        approx.setdefault(r.query_id, set()).add(r.cand_id)
        # every approx score must equal the exact score (subset property)
    hits = sum(len(brute[q] & approx.get(q, set())) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    assert hits / total >= 0.5  # nprobe=4 of 8 lists — recall well above chance


def test_multiprobe_recall_dominates_single_probe(emb):
    queries = emb.filter(F.col("vec_id") < 20)
    single = {
        (r.query_id, r.cand_id)
        for r in lsh_topk(emb, queries, k=5, planes=4, dim=16).collect()
    }
    multi = {
        (r.query_id, r.cand_id)
        for r in lsh_topk(
            emb, queries, k=5, planes=4, dim=16, multiprobe=True
        ).collect()
    }
    brute = {
        (r.query_id, r.cand_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    # hamming-1 probing can only widen the candidate set → recall ≥
    assert len(multi & brute) >= len(single & brute)
    assert len(multi & brute) > 0


def test_lsh_is_subset_of_brute_force_scores(emb):
    brute = {
        (r.query_id, r.cand_id): r.cos_micro
        for r in cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=200).collect()
    }
    for r in lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, planes=4, dim=16).collect():
        assert brute[(r.query_id, r.cand_id)] == r.cos_micro


# ------------------------- cosine_near_dup_pairs_lsh vs brute kernel


def test_near_dup_lsh_subset(emb):
    """Every LSH pair is a brute pair with the identical exact score
    (precision 1.0 by construction)."""
    brute = {
        (r.vec_id_a, r.vec_id_b): r.cos_micro
        for r in cosine_near_dup_pairs(emb, threshold_micro=300000).collect()
    }
    lsh = cosine_near_dup_pairs_lsh(emb, threshold_micro=300000).collect()
    assert len(lsh) > 0
    for r in lsh:
        assert brute[(r.vec_id_a, r.vec_id_b)] == r.cos_micro


def test_near_dup_lsh_planted_recall(spark):
    """Planted near-identical pairs (cos >= ~0.99) are ALL recovered —
    the OR-amplified miss probability at 8x8 multiprobe is ~1e-6 per
    pair, and the md5-derived planes make the outcome deterministic."""
    rng = np.random.RandomState(11)
    base = rng.randn(40, 32).astype("float64")
    rows = []
    planted = set()
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # id 1000+i is a near-copy of i
        rows.append((1000 + i, [float(x) for x in v + 0.01 * rng.randn(32)]))
        planted.add((i, 1000 + i))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in cosine_near_dup_pairs_lsh(df, threshold_micro=900000).collect()
    }
    assert planted <= got, planted - got


def test_near_dup_lsh_planted_recall_at_registered_sizing(spark):
    """Same planted-recall property at the sizing the REGISTERED
    dedup_embedding_cosine query uses (8 bands x 12 planes/band,
    multiprobe) — the 11x-fewer-candidates configuration must still
    recover every true near-duplicate (miss prob < 1e-3 per pair by the
    OR-amplification curve; md5 planes make the outcome deterministic)."""
    from census_asc5_data_pipeline_spark.queries import (
        _EMB_LSH_BANDS,
        _EMB_LSH_PPB,
        _EMB_LSH_SEED,
    )

    rng = np.random.RandomState(13)
    base = rng.randn(40, 32).astype("float64")
    rows = []
    planted = set()
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in v + 0.01 * rng.randn(32)]))
        planted.add((i, 1000 + i))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in cosine_near_dup_pairs_lsh(
            df,
            threshold_micro=900000,
            bands=_EMB_LSH_BANDS,
            planes_per_band=_EMB_LSH_PPB,
            seed=_EMB_LSH_SEED,
            multiprobe=True,
        ).collect()
    }
    assert planted <= got, planted - got


def test_near_dup_lsh_derives_dim_from_data(spark):
    """dim=None derives the plane width from the data — a 16-dim corpus
    must not silently degenerate to bucket-0 (the ADVICE failure mode
    for a hardcoded dim=64)."""
    rng = np.random.RandomState(5)
    vecs = rng.randn(30, 16).astype("float64")
    vecs[20] = vecs[3] + 0.005 * rng.randn(16)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in cosine_near_dup_pairs_lsh(df, threshold_micro=900000).collect()
    }
    assert (3, 20) in got
    # and buckets are non-degenerate: far fewer candidate pairs than n²
    all_pairs = cosine_near_dup_pairs_lsh(df, threshold_micro=-1000000).count()
    assert all_pairs < 30 * 29 / 2


def test_rademacher_planes_deterministic_and_balanced():
    p1 = rademacher_planes(64, 8, seed=42)
    p2 = rademacher_planes(64, 8, seed=42)
    assert p1 == p2
    flat = [x for row in p1 for x in row]
    assert set(flat) == {-1, 1}
    # md5 signs should be roughly balanced (binomial, 512 draws)
    assert 0.35 < flat.count(1) / len(flat) < 0.65


def test_lsh_topk_derives_dim_from_data(spark):
    """A fixed too-large dim default would null every unrolled dot and
    hash all vectors into bucket 0 (silent O(n²) fallback). With dim
    derived from the data, narrow vectors bucket normally and recall
    against brute top-k stays high."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qs = df.filter(F.col("vec_id") < 3)
    got = lsh_topk(df, qs, k=5, planes=4, multiprobe=True)
    brute = cosine_topk(df, qs, k=5)
    g = {(r.query_id, r.cand_id) for r in got.collect()}
    b = {(r.query_id, r.cand_id) for r in brute.collect()}
    assert len(g & b) >= int(0.5 * len(b))
    # buckets are non-degenerate: more than one distinct bucket id
    from census_asc5_data_pipeline_spark.operators.similarity import (
        _hyperplanes,
        lsh_bucket,
    )
    hp = _hyperplanes(16, 4, 42)
    nb = (
        df.select(lsh_bucket(F.col("embedding"), hp).alias("b"))
        .select(F.countDistinct("b").alias("n"))
        .collect()[0]["n"]
    )
    assert nb > 1


def test_pq_topk_recall_of_planted_pair(emb):
    from census_asc5_data_pipeline_spark.operators.similarity import pq_topk

    out = pq_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=5, m=8, n_codes=16, shortlist=50
    ).collect()
    # the near-identical vector reconstructs to near-identical codes
    assert any(r.cand_id == 100 for r in out)


def test_pq_topk_recall_vs_brute_force(emb):
    from census_asc5_data_pipeline_spark.operators.similarity import pq_topk

    queries = emb.filter(F.col("vec_id") < 10)
    brute = {}
    for r in cosine_topk(emb, queries, k=5).collect():
        brute.setdefault(r.query_id, set()).add(r.cand_id)
    approx = {}
    scores = {}
    for r in pq_topk(emb, queries, k=5, m=8, n_codes=16, shortlist=50).collect():
        approx.setdefault(r.query_id, set()).add(r.cand_id)
        scores[(r.query_id, r.cand_id)] = r.cos_micro
    hits = sum(len(brute[q] & approx.get(q, set())) for q in brute)
    total = sum(len(brute[q]) for q in brute)
    assert hits / total >= 0.5  # 16-code/8-subspace ADC shortlist=50
    # emitted scores are the EXACT rerank, never the ADC approximation
    exact = {
        (r.query_id, r.cand_id): r.cos_micro
        for r in cosine_topk(emb, queries, k=200).collect()
    }
    for key, s in scores.items():
        assert exact[key] == s


def test_kmeans_assign_deterministic_and_recovers_planted_pair(emb):
    from census_asc5_data_pipeline_spark.operators.similarity import kmeans_assign

    a = {r.vec_id: r.cluster for r in kmeans_assign(emb, k=4).collect()}
    b = {r.vec_id: r.cluster for r in kmeans_assign(emb, k=4).collect()}
    assert a == b  # deterministic seeds + tiebreak -> identical runs
    assert set(a) == {r.vec_id for r in emb.select("vec_id").collect()}
    assert all(0 <= c < 4 for c in a.values())
    # the planted near-identical pair must share a cluster
    assert a[0] == a[100]

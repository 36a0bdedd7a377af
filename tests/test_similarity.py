"""Similarity search: brute-force cosine is the exact baseline; the LSH
and IVF variants are approximations whose top-k must (a) be drawn from
the true ranking (no fabricated scores) and (b) achieve high recall@k on
the test embeddings."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.pipeline import similarity as SIM

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def qvec(emb):
    return emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]


@pytest.fixture(scope="module")
def base(emb):
    return emb.filter(F.col("vec_id") != 0)


@pytest.fixture(scope="module")
def exact_top(base, qvec):
    return [r["vec_id"] for r in SIM.cosine_topk(base, qvec, k=10).collect()]


def test_bruteforce_matches_numpy(base, qvec, exact_top):
    import numpy as np

    rows = base.collect()
    q = np.asarray(qvec)
    sims = sorted(
        (
            (
                -float(
                    np.dot(q, r["embedding"])
                    / (np.linalg.norm(q) * np.linalg.norm(r["embedding"]))
                ),
                r["vec_id"],
            )
            for r in rows
        )
    )[:10]
    assert [v for _, v in sims] == exact_top


def test_lsh_recall(base, qvec, exact_top):
    got = [
        r["vec_id"]
        for r in SIM.lsh_cosine_topk(base, qvec, k=10, max_hamming=8).collect()
    ]
    recall = len(set(got) & set(exact_top)) / 10
    assert recall >= 0.7, (recall, got, exact_top)


def test_ivf_recall_and_scores(base, qvec, exact_top):
    assigned, centroids = SIM.ivf_build(base, n_lists=8)
    assert len(centroids) == 8
    # every vector landed in exactly one list
    assert assigned.count() == base.count()
    got_rows = SIM.ivf_cosine_topk(
        assigned, centroids, qvec, k=10, n_probe=4
    ).collect()
    got = [r["vec_id"] for r in got_rows]
    recall = len(set(got) & set(exact_top)) / 10
    assert recall >= 0.6, (recall, got, exact_top)
    # probing ALL lists must recover the exact answer
    full = SIM.ivf_cosine_topk(assigned, centroids, qvec, k=10, n_probe=8)
    assert [r["vec_id"] for r in full.collect()] == exact_top

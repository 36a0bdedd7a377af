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


# ---------- materialized (partitioned) ANN indexes ----------


@pytest.fixture(scope="module")
def lsh_dir(spark, base, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "lsh")
    SIM.ann_build_lsh(base, out, dim=64, n_planes=16, bands=4, seed=42)
    return out


@pytest.fixture(scope="module")
def ivf_dir(spark, base, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "ivf")
    SIM.ann_build_ivf(base, out, n_lists=8, seed=42)
    return out


def test_ann_lsh_signature_matches_inline(spark, base, lsh_dir):
    """The numpy-matmul build signatures must equal the interpreted
    inline HOF expression's (same hyperplanes, same bits)."""
    planes = SIM.hyperplanes(64, 16, 42)
    inline = {
        r["vec_id"]: r["sig"]
        for r in base.select(
            "vec_id", SIM.rp_signature_expr(F.col("embedding"), planes).alias("sig")
        ).collect()
    }
    stored = {
        r["vec_id"]: r["sig"]
        for r in spark.read.parquet(f"{lsh_dir}/vectors")
        .select("vec_id", "sig")
        .dropDuplicates(["vec_id"])
        .collect()
    }
    assert stored == inline


def test_ann_lsh_probe_prunes_partitions(spark, base, qvec, lsh_dir):
    """The banded probe must (a) be a real partition prune — the plan's
    parquet scan carries PartitionFilters on band/band_val — and (b)
    guarantee the Hamming-(bands-1) ball by pigeonhole."""
    q = SIM.ann_query_lsh(spark, lsh_dir, qvec, k=500, max_hamming=15)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "band" in plan
    probed = {r["vec_id"] for r in q.collect()}
    assert len(probed) < base.count()  # genuinely pruned
    # pigeonhole guarantee: every vector within hamming<=3 is probed
    planes = SIM.hyperplanes(64, 16, 42)
    import numpy as np

    qsig = sum(1 << i for i, p in enumerate(planes) if float(np.dot(p, qvec)) > 0)
    sigs = {
        r["vec_id"]: r["sig"]
        for r in spark.read.parquet(f"{lsh_dir}/vectors")
        .select("vec_id", "sig")
        .dropDuplicates(["vec_id"])
        .collect()
    }
    within = {v for v, s in sigs.items() if bin(s ^ qsig).count("1") <= 3}
    assert within <= probed


def test_embedding_near_dup_pairs(spark, base):
    """Banded candidates must (a) report EXACT cosines (subset of the
    brute-force pair set, never fabricated), and (b) always catch true
    duplicates — identical vectors share every band."""
    import numpy as np

    rows = base.limit(50).collect()
    dup = spark.createDataFrame(
        [(9001, rows[0]["embedding"]), (9002, rows[0]["embedding"])],
        "vec_id long, embedding array<float>",
    )
    vecs = base.select("vec_id", "embedding").limit(50).union(dup)
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in SIM.embedding_near_dup_pairs(
            vecs, dim=64, threshold=0.2, n_planes=16, bands=4
        ).collect()
    }
    # the planted exact duplicate is always found, cosine 1.0 (and the
    # original row pairs with both copies)
    assert got[(9001, 9002)] == pytest.approx(1.0)
    assert (rows[0]["vec_id"], 9001) in got
    # every reported cosine equals the numpy value and clears threshold
    emb = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in vecs.collect()}
    for (a, b), c in got.items():
        v, w = emb[a], emb[b]
        truth = float(v @ w / (np.linalg.norm(v) * np.linalg.norm(w)))
        assert c == pytest.approx(round(truth, 6), abs=2e-6)
        assert c >= 0.2


def test_ann_ivf_query_matches_unmaterialized(spark, base, qvec, ivf_dir):
    """Materialized probe-all == exact; partial probe prunes partitions."""
    exact = [r["vec_id"] for r in SIM.cosine_topk(base, qvec, k=10).collect()]
    full = SIM.ann_query_ivf(spark, ivf_dir, qvec, k=10, n_probe=8)
    assert [r["vec_id"] for r in full.collect()] == exact
    part = SIM.ann_query_ivf(spark, ivf_dir, qvec, k=10, n_probe=4)
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    got = {r["vec_id"] for r in part.collect()}
    assert len(got & set(exact)) >= 6

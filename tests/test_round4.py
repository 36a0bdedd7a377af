"""Round-4 pins: k beyond the stored THETA_TOPK arrays falls back to the
per-block metadata scan and stays DAAT-identical; the block_summary
RAM-load decision is memoized per engine instance."""

import pytest

from searchengine_spark.index.builder import THETA_TOPK
from searchengine_spark.query.engine import SearchEngine


@pytest.fixture(scope="module")
def engine(spark, index_dir):
    return SearchEngine(spark, index_dir)


def test_k_beyond_theta_topk_uses_block_max_fallback(engine):
    """k=200 exceeds THETA_TOPK (=100): _theta_from_blocks must skip the
    block_summary arrays (only K entries stored) and reproduce the
    brute-force per-block-metadata bound exactly."""
    assert THETA_TOPK == 100  # the pin below encodes this boundary
    k = 2 * THETA_TOPK
    terms = engine.tokenize_query("spark table join fast value")
    stats = engine._term_stats(terms)
    terms = [t for t in terms if t in stats]
    theta = engine._theta_from_blocks(terms, "bm25", k)
    want = 0.0
    for t, blocks in engine._block_maxima(terms).items():
        if len(blocks) >= k:
            want = max(
                want,
                sorted((b["block_max_bm25"] for b in blocks), reverse=True)[
                    k - 1
                ],
            )
    assert theta == want


def test_k200_maxscore_identical_to_daat(engine):
    """The fallback theta (usually 0 at fixture scale — no term has 200
    skip blocks) must leave MaxScore exact: same rows as DAAT at k=200."""
    q = "spark table join fast value"
    a = [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in engine.search(q, k=200).collect()
    ]
    b = [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in engine.search(q, k=200, algo="maxscore").collect()
    ]
    assert a == b
    assert len(a) > 0


def test_block_summary_load_decision_memoized(engine):
    """The full-load decision is computed once per instance: after the
    first probe the flag is set and a repeat probe answers from RAM
    (the ADVICE fix — no per-call directory re-walk)."""
    engine._block_summary(["spark"])
    assert engine._block_summary_should_load is not None
    # fixture-scale summary must take the RAM-resident path
    assert engine._block_summary_should_load is True
    assert engine._block_summary_full is True
    # refresh() resets the decision
    engine.refresh()
    assert engine._block_summary_should_load is None


# ---------- delta-docID compressed index (EngineConfig.delta_docids) ----------

QUERIES4 = [
    "spark table join fast",
    "window agg customer stream",
    "index merge batch",
]


@pytest.fixture(scope="module")
def delta_dir(spark, corpus, tmp_path_factory):
    from searchengine_spark.config import EngineConfig
    from searchengine_spark.index.builder import build_index

    d = str(tmp_path_factory.mktemp("idxd") / "idx")
    cfg = EngineConfig(
        stopstem=True,
        skip_threshold=64,
        compression=True,
        delta_docids=True,
        shuffle_partitions=8,
    )
    build_index(spark, corpus, d, cfg)
    return d


def _res(eng, q, **kw):
    return [
        (r["rank"], r["doc_id"], round(r["score"], 9))
        for r in eng.search(q, k=10, **kw).collect()
    ]


def test_delta_index_matches_raw_results(spark, engine, delta_dir):
    de = SearchEngine(spark, delta_dir)
    assert de.config.delta_docids and de.config.compression
    for q in QUERIES4:
        assert _res(engine, q) == _res(de, q), q
        assert _res(engine, q) == _res(de, q, algo="maxscore"), q


def test_delta_index_batch_path(spark, engine, delta_dir):
    de = SearchEngine(spark, delta_dir)
    qs = [(f"q{i}", q) for i, q in enumerate(QUERIES4)]
    raw = engine.batch_search(qs, k=10).orderBy("query_id", "rank").collect()
    dl = de.batch_search(qs, k=10).orderBy("query_id", "rank").collect()
    assert [tuple(r) for r in raw] == [tuple(r) for r in dl]


def test_delta_candidates_driver_path(spark, delta_dir):
    """The driver-side pyarrow candidate read must decode gaps too:
    force the range-prune path and check MaxScore == DAAT on the delta
    index."""
    de = SearchEngine(spark, delta_dir)
    de.PRUNE_MIN_POSTINGS = 0
    try:
        q = QUERIES4[0]
        assert _res(de, q) == _res(de, q, algo="maxscore")
    finally:
        del de.PRUNE_MIN_POSTINGS

"""Dedup family: exact groups, MinHash-LSH recall, Jaccard-on-candidates
composition, SimHash Hamming pairing (banded vs brute force), and the
end-to-end near-duplicate verdict (LSH -> verify -> connected components).
"""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.pipeline import dedup as DD

# hand-built corpus: 1/2 exact dups; 3/4/5 a near-dup CHAIN — jaccard
# (3,4)=0.938 and (4,5)=0.824 sit above the 0.8 threshold but (3,5)=0.771
# falls below, so grouping all three REQUIRES transitivity; 6 unique;
# 7/8 exact dups of each other
BASE = (
    "the quick brown fox jumps over the lazy dog again and again today "
    "while the rain falls softly on the quiet green hills far away"
)
BASE2 = BASE.replace("rain", "snow")
S1 = "alpha beta gamma delta epsilon zeta eta theta"
S2 = "alpha beta gamma delta epsilon zeta eta iota"
DOCS = [
    (1, BASE),
    (2, BASE),
    (3, BASE + " " + S1),
    (4, BASE + " " + S2),
    (5, BASE2 + " " + S2),
    (6, "completely different content about spark shuffles and parquet files"),
    (7, "some other duplicated page body text here"),
    (8, "some other duplicated page body text here"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, content string").persist()


@pytest.fixture(scope="module")
def shingled(docs):
    toks = F.split(F.col("content"), " ")
    return docs.select("doc_id", DD.token_shingles(toks, 3).alias("shingles"))


def test_exact_duplicate_groups(docs):
    rows = DD.exact_duplicate_groups(docs).collect()
    got = {(r["n_dups"], r["keep_doc_id"]) for r in rows}
    assert got == {(2, 1), (2, 7)}


def test_lsh_candidates_cover_true_near_dups(shingled):
    sigs = DD.minhash_signatures(shingled, num_perm=16)
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in DD.lsh_candidate_pairs(sigs, num_perm=16, bands=4).collect()
    }
    # exact duplicates always collide in every band
    assert (1, 2) in cand and (7, 8) in cand
    # high-jaccard neighbours are candidates
    assert (3, 4) in cand and (4, 5) in cand


def test_minhash_xxhash64_fast_path(shingled):
    """The production hash (xxhash64) must band identically in structure
    and catch the same true near-dups as the oracle-reproducible md5."""
    for hf in ("md5", "xxhash64"):
        sigs = DD.minhash_signatures(shingled, num_perm=16, hash_fn=hf)
        assert sigs.count() == 8 * 16  # one row per (doc, perm)
        cand = {
            (r["doc_a"], r["doc_b"])
            for r in DD.lsh_candidate_pairs(sigs, 16, 4).collect()
        }
        # exact duplicates collide in every band under ANY hash
        assert (1, 2) in cand and (7, 8) in cand
    with pytest.raises(ValueError, match="unknown hash_fn"):
        DD.minhash_signatures(shingled, hash_fn="sha9000").collect()


def test_jaccard_on_candidates_matches_standalone(shingled, spark):
    sigs = DD.minhash_signatures(shingled, num_perm=16)
    cand = DD.lsh_candidate_pairs(sigs, num_perm=16, bands=4)
    composed = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.jaccard_on_candidates(shingled, cand, threshold=0.0).collect()
    }
    standalone = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.jaccard_pairs(shingled, threshold=0.0).collect()
    }
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    want = {p: j for p, j in standalone.items() if p in cand_set}
    assert composed == want
    assert composed[(1, 2)] == 1.0


def test_near_duplicate_groups_transitive(shingled):
    rows = DD.near_duplicate_groups(
        shingled, num_perm=16, bands=4, threshold=0.8
    ).collect()
    by_doc = {r["doc_id"]: (r["group_id"], r["keep"]) for r in rows}
    # exact pairs group under the min id
    assert by_doc[1] == (1, True) and by_doc[2] == (1, False)
    assert by_doc[7] == (7, True) and by_doc[8] == (7, False)
    # the 3~4~5 chain is ONE group via transitivity even if (3,5) alone
    # is below threshold
    assert by_doc[3] == (3, True)
    assert by_doc[4][0] == 3 and by_doc[5][0] == 3
    assert not by_doc[4][1] and not by_doc[5][1]
    # unique doc not reported
    assert 6 not in by_doc


def test_connected_components_two_components(spark):
    edges = spark.createDataFrame(
        [(10, 20), (20, 30), (30, 40), (100, 200)], "doc_a long, doc_b long"
    )
    comp = {r["doc_id"]: r["group_id"]
            for r in DD.connected_components(edges).collect()}
    assert comp == {10: 10, 20: 10, 30: 10, 40: 10, 100: 100, 200: 100}


def test_simhash_identical_docs_equal_fingerprints(shingled):
    fp = {r["doc_id"]: r["simhash"] for r in DD.simhash64(shingled).collect()}
    assert fp[1] == fp[2] and fp[7] == fp[8]
    assert fp[1] != fp[6]


def test_simhash_near_pairs_matches_bruteforce(shingled):
    fp_df = DD.simhash64(shingled)
    fp = {r["doc_id"]: r["simhash"] for r in fp_df.collect()}
    want = {
        (a, b, bin((fp[a] ^ fp[b]) & (2**64 - 1)).count("1"))
        for a in fp
        for b in fp
        if a < b and bin((fp[a] ^ fp[b]) & (2**64 - 1)).count("1") <= 3
    }
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in DD.simhash_near_pairs(fp_df, max_hamming=3, bands=4).collect()
    }
    # banding guarantees FULL recall for hamming <= bands-1 (pigeonhole)
    assert got == want
    assert (1, 2, 0) in got

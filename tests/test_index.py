"""Index build tests: deterministic doc_ids, Q-1 stats parity, lexicon
df/cf vs brute force, sha256 row invariant, block structure, resume."""

import json
import math
import os
from collections import Counter

import pandas as pd
import pytest
from pyspark.sql import functions as F

from searchengine_spark.config import EngineConfig
from searchengine_spark.functions.text import tokenize_doc_py
from searchengine_spark.index.builder import build_index, term_bucket_py
from searchengine_spark.sources.corpus import (
    assign_doc_ids,
    load_csv_corpus,
    load_jsonl_corpus,
    load_table_corpus,
)

from .conftest import TEST_CONFIG


@pytest.fixture(scope="module")
def doctable(spark, index_dir):
    return spark.read.parquet(os.path.join(index_dir, "doctable")).toPandas()


@pytest.fixture(scope="module")
def corpus_pdf(corpus):
    return corpus.toPandas()


def test_doc_ids_dense_and_ordered(doctable):
    ids = sorted(doctable["doc_id"])
    assert ids == list(range(1, len(doctable) + 1))
    # ordered by natural key
    sorted_by_key = doctable.sort_values(["repo", "path", "commit"])
    assert sorted_by_key["doc_id"].tolist() == ids


def test_table_source_matches_parquet_source(spark, corpus):
    """Catalog-table source (spark.read.table — the Iceberg entry point
    on a real cluster) must yield the identical canonical frame; the
    sandbox exercises it via a temp view over the same rows."""
    corpus.createOrReplaceTempView("corpus_tbl")
    via_table = load_table_corpus(spark, "corpus_tbl")
    assert via_table.schema == corpus.schema
    assert via_table.exceptAll(corpus).count() == 0
    assert corpus.exceptAll(via_table).count() == 0


def test_stats_cli_report(index_dir, capsys):
    from searchengine_spark.__main__ import main as cli_main

    cli_main(["stats", "--index", index_dir])
    out = json.loads(capsys.readouterr().out)
    assert out["collection"]["n_docs"] == out["collection"]["true_doc_count"] + 1
    for stage in ("doctable", "tf", "lexicon", "postings"):
        assert out["stages"][stage]["rows"] > 0
        assert out["stages"][stage]["bytes"] > 0


def test_jsonl_and_csv_sources_roundtrip(spark, corpus, tmp_path):
    """Writing the canonical frame as JSONL/TSV and reading it back via
    the format sources must reproduce the same rows (explicit schema, no
    inference)."""
    sample = corpus.limit(50)
    jdir = str(tmp_path / "jsonl")
    sample.write.json(jdir)
    got_j = load_jsonl_corpus(spark, jdir)
    assert got_j.schema == sample.schema
    assert got_j.exceptAll(sample).count() == 0
    assert sample.exceptAll(got_j).count() == 0

    # TSV cannot carry embedded tabs/newlines — filter to clean rows
    import pyspark.sql.functions as SF

    flat = sample.filter(~SF.col("content").rlike("[\t\n\r]")).limit(20)
    cdir = str(tmp_path / "tsv")
    flat.write.option("sep", "\t").option("header", "true").csv(cdir)
    got_c = load_csv_corpus(spark, cdir)
    assert got_c.exceptAll(flat).count() == 0
    assert flat.exceptAll(got_c).count() == 0


def test_two_phase_matches_global_window(spark, corpus):
    a = assign_doc_ids(corpus, two_phase=True).select("repo", "path", "doc_id")
    b = assign_doc_ids(corpus, two_phase=False).select("repo", "path", "doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_two_phase_invariant_to_parallelism(spark, corpus):
    a = assign_doc_ids(corpus, num_partitions=2).select("path", "doc_id")
    b = assign_doc_ids(corpus, num_partitions=16).select("path", "doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_sha256_invariant(doctable, corpus_pdf):
    import hashlib

    want = {
        r.path: hashlib.sha256(r.content.encode()).hexdigest()
        for r in corpus_pdf.itertuples()
    }
    for r in doctable.itertuples():
        assert r.sha256 == want[r.path]


def test_stats_q1_parity(index_dir, doctable):
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    assert stats["n_docs"] == len(doctable) + 1  # Q-1: counter starts at 1
    assert stats["tot_doc_len"] == float(doctable["doc_len"].sum())
    assert stats["avgdl"] == stats["tot_doc_len"] / stats["n_docs"]


def test_doc_len_matches_python_pipeline(doctable, corpus_pdf):
    by_path = {r.path: r.content for r in corpus_pdf.itertuples()}
    for r in doctable.itertuples():
        assert r.doc_len == len(tokenize_doc_py(by_path[r.path], TEST_CONFIG))


def test_lexicon_df_cf_idf(spark, index_dir, doctable, corpus_pdf):
    lex = spark.read.parquet(os.path.join(index_dir, "lexicon")).toPandas()
    # brute force df/cf
    df_b, cf_b = Counter(), Counter()
    for r in corpus_pdf.itertuples():
        toks = [t[:20] for t in tokenize_doc_py(r.content, TEST_CONFIG)]
        cf_b.update(toks)
        df_b.update(set(toks))
    assert set(lex["term"]) == set(df_b)
    n_docs = len(doctable) + 1
    for r in lex.itertuples():
        assert r.df == df_b[r.term]
        assert r.cf == cf_b[r.term]
        assert r.idf == pytest.approx(math.log10(n_docs / r.df), abs=1e-12)
        assert r.term_bucket == term_bucket_py(r.term, TEST_CONFIG.n_term_buckets)


def test_postings_complete_and_sorted(spark, index_dir, corpus_pdf, doctable):
    post = spark.read.parquet(os.path.join(index_dir, "postings")).toPandas()
    # rebuild brute-force postings
    key_to_id = {
        (r.repo, r.path, r.commit): r.doc_id for r in doctable.itertuples()
    }
    want: dict[str, dict[int, int]] = {}
    for r in corpus_pdf.itertuples():
        did = key_to_id[(r.repo, r.path, r.commit)]
        for t in tokenize_doc_py(r.content, TEST_CONFIG):
            want.setdefault(t[:20], Counter())[did] += 1
    got: dict[str, list[tuple[int, int]]] = {}
    for r in post.itertuples():
        assert list(r.doc_ids) == sorted(r.doc_ids)  # M3 invariant
        assert r.max_doc_id == r.doc_ids[-1]
        assert r.n_postings == len(r.doc_ids)
        got.setdefault(r.term, []).extend(zip(r.doc_ids, r.tfs))
    assert set(got) == set(want)
    for term, pl in got.items():
        assert sorted(pl) == sorted(want[term].items()), term


def test_count_mode_block_structure(spark, corpus, tmp_path):
    cfg = EngineConfig(stopstem=True, skip_threshold=64, block_mode="count",
                       shuffle_partitions=8)
    d = str(tmp_path / "idx_count")
    build_index(spark, corpus, d, cfg)
    post = spark.read.parquet(os.path.join(d, "postings")).toPandas()
    lex = spark.read.parquet(os.path.join(d, "lexicon")).toPandas()
    df_map = dict(zip(lex["term"], lex["df"]))
    for term, grp in post.groupby("term"):
        n = df_map[term]
        if n >= cfg.skip_threshold:
            bs = math.ceil(math.sqrt(n))
            assert len(grp) == math.ceil(n / bs), term
            sizes = grp.sort_values("block_id")["n_postings"].tolist()
            assert all(s == bs for s in sizes[:-1])
            assert sizes[-1] == n - bs * (len(sizes) - 1)
        else:
            assert len(grp) == 1
        # blocks doc_id-disjoint and ordered
        g = grp.sort_values("block_id")
        maxima = g["max_doc_id"].tolist()
        minima = [min(ids) for ids in g["doc_ids"]]
        for prev_max, next_min in zip(maxima, minima[1:]):
            assert prev_max < next_min


def test_resume_skips_completed_stages(spark, corpus, tmp_path):
    d = str(tmp_path / "idx_resume")
    m1 = build_index(spark, corpus, d, TEST_CONFIG)
    stamp = os.path.getmtime(os.path.join(d, "postings", "_SUCCESS"))
    m2 = build_index(spark, corpus, d, TEST_CONFIG, resume=True)
    assert os.path.getmtime(os.path.join(d, "postings", "_SUCCESS")) == stamp
    assert m1["stages"].keys() == m2["stages"].keys()


def test_manifest_lineage(index_dir):
    with open(os.path.join(index_dir, "manifest.json")) as f:
        manifest = json.load(f)
    for stage in ("doctable", "tf", "lexicon", "postings"):
        entry = manifest["stages"][stage]
        assert entry["rows"] == sum(entry["files"].values())
        assert entry["duration_sec"] > 0 and entry["rows_per_sec"] > 0

"""Degenerate-vector equivalence for the embedding similarity family.

Real 100 TB embedding columns are dirty: NULL rows (failed encoder
calls), zero vectors (empty inputs), exact duplicates, antipodal pairs,
and pairs that graze the near-dup threshold.  Before the `_cos` nullif
pinning (catalog.py) these inputs split the engine three ways — Spark 4's
ANSI mode raised DIVIDE_BY_ZERO on any zero-norm vector, the numpy
blocked paths crashed on NULL rows with an inhomogeneous-shape error, and
DuckDB quietly produced NULL-or-NaN depending on which operand was
degenerate (NaN outranking every real neighbor in a desc window).

Pinned semantics, identical in both dialects and the numpy paths: an
undefined cosine is SQL NULL — near-dup thresholds drop the pair, top-k
windows rank it last and still use it to fill out k when a query has
fewer than k finite neighbors (exactly like the all-pairs oracle).

Every embedding-family query must match its DuckDB oracle row-for-row on
this corpus.
"""

import math

import duckdb
import pytest

from cqi_engine.queries.catalog import CATALOG, run_query

QUERIES = ["embed_neardup", "embed_neardup_lsh", "embed_neardup_ivf",
           "ann_topk", "ann_topk_blocked", "ann_lsh_bucket", "ann_ivf_topk"]

D = 64


def _vec(*head):
    v = list(head) + [0.0] * (D - len(head))
    return [float(x) for x in v]


_K = math.sqrt(351.0)  # cos([10,0,...], [7,k,0,...]) == 7/20 at k=sqrt(351)

ROWS = [
    (0, _vec(10.0), 0),
    (1, _vec(10.0), 0),               # exact duplicate of 0 -> cosine 1
    (2, _vec(7.0, _K), 0),            # grazes the 0.35 threshold
    (3, _vec(7.0, _K * 1.001), 0),    # just below
    (4, _vec(7.0, _K * 0.999), 0),    # just above
    (5, _vec(0.0), 0),                # zero vector: undefined cosine
    (6, _vec(-10.0), 0),              # antipodal to 0
    (7, None, 0),                     # NULL embedding
    (8, _vec(1.0, 1.0, 1.0), 1),
    (9, _vec(1.0, 1.0, 1.0000001), 1),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("degenerate_embeddings")
    emb = spark.createDataFrame(
        ROWS, "vec_id long, embedding array<float>, label int")
    emb.coalesce(1).write.mode("overwrite").parquet(
        str(root / "embeddings.parquet"))
    return str(root)


def _norm_rows(rows):
    return sorted(
        tuple(None if v is None
              else (round(float(v), 6) if isinstance(v, float) else v)
              for v in r)
        for r in rows)


@pytest.mark.parametrize("name", QUERIES)
def test_embedding_query_matches_oracle_on_degenerate_corpus(spark,
                                                             corpus_dir,
                                                             name):
    got = _norm_rows(run_query(spark, corpus_dir, CATALOG[name]).collect())
    con = duckdb.connect()
    con.sql("create view embeddings as select * from "
            f"'{corpus_dir}/embeddings.parquet/*.parquet'")
    want = _norm_rows(con.sql(CATALOG[name].duck_sql).fetchall())
    assert got == want
    assert got  # the corpus is built so every query returns something


def test_null_and_zero_queries_fill_topk_with_null_cosines(spark,
                                                           corpus_dir):
    """The zero vector (5) and the NULL embedding (7) are query points
    too: every cosine they see is NULL, and the oracle still ranks their
    k lowest-id neighbors with NULL cosine — the blocked numpy path must
    reproduce that, not drop the queries."""
    got = run_query(spark, corpus_dir, CATALOG["ann_topk_blocked"]) \
        .filter("query_id in (5, 7)").collect()
    assert len(got) == 10  # 2 queries x k=5
    assert all(r["cosine"] is None for r in got)


def test_degenerate_vectors_never_pair_in_neardup(spark, corpus_dir):
    got = run_query(spark, corpus_dir, CATALOG["embed_neardup"]).collect()
    ids = {r["vec_a"] for r in got} | {r["vec_b"] for r in got}
    assert 5 not in ids and 7 not in ids
    assert {(r["vec_a"], r["vec_b"]) for r in got} >= {(0, 1), (8, 9)}

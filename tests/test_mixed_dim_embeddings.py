"""Mixed-dimension (truncated-row) robustness for the blocked numpy paths.

A 100 TB embedding column accumulates rows whose array LENGTH is wrong —
truncated encoder output, schema drift, empty arrays — not just NULLs.
Two failure modes this file pins shut:

* dimension inference: `ann_topk_blocked` used to take the corpus dim
  from the FIRST non-null query row, so one leading truncated row turned
  every similarity NaN and silently corrupted all top-k results; now the
  dim is the majority length (`operators/ann.py _majority_dim`).
* the GEMM pack: `neardup_candidates_blocked` fed raw python lists to
  `np.array`, which raises an inhomogeneous-shape ValueError the moment
  one non-null row has a foreign length, killing the whole query; now
  the GEMM packs only majority-dim rows and odd-size rows go through an
  exact size-equality pair join.

The semantic truth here is the SPARK all-pairs fold (`ann_topk` /
`embed_neardup` spark_sql): `zip_with` over unequal lengths yields a
NULL product, so cross-dimension cosines are NULL (pair dropped /
ranked last) while SAME-length dirty rows keep their real cosine.  The
DuckDB dialect is NOT the referee for foreign dims — its
`list_aggregate('sum')` skips the NULL tail, producing a partial dot
where Spark pins NULL — so these tests compare the blocked paths
against the Spark SQL baseline, not DuckDB.
"""

import pytest

from cqi_engine.queries.catalog import CATALOG, run_query

D = 64


def _vec(*head, dim=D):
    v = list(head) + [0.0] * (dim - len(head))
    return [float(x) for x in v]


# majority dim 64; one truncated dim-3 pair placed FIRST in vec_id order
# (the old first-row inference breaks exactly here), one empty array,
# one NULL, plus clean near-dup structure among the dim-64 rows.
ROWS = [
    (0, [3.0, 4.0, 0.0]),              # truncated row, FIRST
    (1, [3.0, 4.0, 0.1]),              # same length -> real cosine vs 0
    (2, []),                           # empty array
    (3, None),                         # NULL embedding
    (4, _vec(10.0)),
    (5, _vec(10.0)),                   # dup of 4 -> cosine 1
    (6, _vec(7.0, 1.0)),
    (7, _vec(0.0)),                    # zero vector
    (8, _vec(1.0, 1.0, 1.0)),
    (9, _vec(1.0, 1.0, 1.0000001)),    # near-dup of 8
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("mixed_dim_embeddings")
    emb = spark.createDataFrame(
        ROWS, "vec_id long, embedding array<float>")
    emb.coalesce(1).write.mode("overwrite").parquet(
        str(root / "embeddings.parquet"))
    return str(root)


def _rows(df):
    return sorted(
        tuple(None if v is None
              else (round(float(v), 6) if isinstance(v, float) else v)
              for v in r)
        for r in df.collect())


def test_blocked_topk_matches_spark_allpairs_on_mixed_dims(spark,
                                                           corpus_dir):
    got = _rows(run_query(spark, corpus_dir, CATALOG["ann_topk_blocked"]))
    q = CATALOG["ann_topk"]
    spark.read.parquet(f"{corpus_dir}/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")
    want = _rows(spark.sql(q.spark_sql))
    assert got == want
    # the truncated query 0 must still see its same-length neighbor 1
    # with a REAL cosine (0.9992+), not NULL
    top = {(r[0], r[1]): r[2] for r in got}
    assert top[(0, 1)] is not None and top[(0, 1)] > 0.999


def test_blocked_neardup_matches_spark_allpairs_on_mixed_dims(spark,
                                                              corpus_dir):
    from cqi_engine.queries.catalog import SPARK, _embed_neardup
    got = _rows(run_query(spark, corpus_dir, CATALOG["embed_neardup"]))
    spark.read.parquet(f"{corpus_dir}/embeddings.parquet") \
        .createOrReplaceTempView("embeddings")
    want = _rows(spark.sql(_embed_neardup(SPARK)))
    assert got == want
    pairs = {(r[0], r[1]) for r in got}
    assert (4, 5) in pairs and (8, 9) in pairs   # clean dups survive
    assert (0, 1) in pairs                       # same-length dirty pair
    assert not any(2 in p or 3 in p or 7 in p for p in pairs)

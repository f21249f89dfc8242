"""Boundary-corpus equivalence for the dieted near-dup paths.

The round-4 candidate-stage diets (size-ratio prefilter, first-colliding-
band emission, fused simhash verify, incidence-GEMM shingle Jaccard) are
lossless BY ARGUMENT; the sf0.01 oracle sweep checks them on a template-
heavy synthetic corpus whose pairs sit far from the decision boundaries.
This corpus sits ON them:

* a pair at Jaccard exactly 0.9 whose token counts hit the size-ratio
  prefilter at equality (10*min == 9*max) — off-by-one in either bound
  (``>`` for ``>=``) silently drops a true near-dup pair;
* a 5-clone cluster colliding in EVERY LSH band — first-band-owner must
  emit each of the 10 pairs exactly once (a double emission doubles rows);
* empty-text docs (null minhash band keys must pair with nothing; the
  all-zero SimHash pairs them at hamming 0 — the oracle agrees);
* single-token docs, identical and distinct;
* a subset pair at Jaccard 0.8 that bands may catch but the verify must
  drop.

Each dieted query must match its naive all-pairs/naive-banded DuckDB
oracle row-for-row and value-for-value on this corpus.
"""

import duckdb
import pytest

from cqi_engine.queries.catalog import CATALOG, run_query

QUERIES = ["dedup_minhash_lsh", "dedup_simhash_pairs", "ngram_jaccard"]


def _toks(n: int, pref: str = "tok") -> str:
    return " ".join(f"{pref}{i:02d}" for i in range(n))


ROWS = [
    (1, _toks(9)),             # A: 9 tokens, subset of B
    (2, _toks(10)),            # B: jac(A,B) = 9/10 = threshold exactly
    (3, _toks(20, "c")),       # C == D: collides in all 4 bands
    (4, _toks(20, "c")),
    (5, _toks(8, "e")),        # E subset of F: jac = 0.8, must verify OUT
    (6, _toks(10, "e")),
    (7, ""), (8, ""),          # empty texts
    (9, "solo"), (10, "solo"),
    (11, "uno"), (12, "dos"),
] + [(100 + i, _toks(15, "z")) for i in range(5)]   # C(5,2)=10 clone pairs


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("boundary_corpus")
    docs = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in ROWS],
        "doc_id long, text string, lang string, source string, n_chars long")
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet"))
    return str(root)


def _norm(rows):
    return sorted((int(r[0]), int(r[1]), float(r[2])) for r in rows)


@pytest.mark.parametrize("name", QUERIES)
def test_dieted_path_matches_oracle_on_boundary_corpus(spark, corpus_dir,
                                                       name):
    got = _norm(run_query(spark, corpus_dir, CATALOG[name]).collect())
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            f"'{corpus_dir}/documents.parquet/*.parquet'")
    want = _norm(con.sql(CATALOG[name].duck_sql).fetchall())
    assert got == want
    assert len(got) >= 11  # the clone cluster + identicals are in there


def test_boundary_pair_survives_prefilter(spark, corpus_dir):
    """(1, 2) is jac == 0.9 with counts at the ratio bound's equality —
    pinned explicitly so a lossy prefilter fails THIS line, not a set
    diff."""
    got = _norm(run_query(spark, corpus_dir,
                          CATALOG["dedup_minhash_lsh"]).collect())
    assert (1, 2, 0.9) in got


def test_clone_cluster_pairs_emitted_exactly_once(spark, corpus_dir):
    got = run_query(spark, corpus_dir, CATALOG["dedup_minhash_lsh"]) \
        .filter("doc_a >= 100").collect()
    pairs = [(r["doc_a"], r["doc_b"]) for r in got]
    assert sorted(pairs) == sorted(set(pairs))   # no double emission
    assert len(set(pairs)) == 10

"""Degenerate-text equivalence for the document-analysis family.

Web corpora carry NULL text (failed extraction), empty and whitespace-only
documents, unicode, tabs/newlines, and exact duplicates.  This corpus
found three real defects (all fixed, pinned here):

* ``fingerprint`` crashed under Spark ANSI with an out-of-bounds
  element_at: the polyhash char-position lambda variable was named ``i``
  and CAPTURED the fingerprint template's outer token index — the
  generated SQL indexed the token array by char position (identically
  wrong in both dialects, so the sf oracles matched; it only blew up when
  a token was longer than the doc's token count).
* ``dedup_exact`` diverged across dialects on keyless docs: Spark keyed
  every empty/whitespace doc on md5('') while DuckDB's chain nulled out
  and lumped NULL text in with them.  Pinned: a doc with no tokens has no
  dedup key and is excluded in both dialects.
* the media stubs (decode/resize/frame-sample) crashed on NULL payloads
  with ``bytes(None)``.  Pinned: NULL payload -> NULL metadata, NULL
  resized payload, zero sampled frames — matching the hash-arithmetic
  oracle's NULL propagation.

Every document-family query must match its DuckDB oracle row-for-row on
this corpus.
"""

import duckdb
import pytest

from cqi_engine.queries.catalog import CATALOG, run_query

QUERIES = ["langid", "quality_score", "token_count", "fingerprint",
           "dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
           "ngram_jaccard", "media_meta", "media_pipeline",
           "dedup_components"]

ROWS = [
    (0, None, "en", "s", 0),                   # NULL text
    (1, "", "en", "s", 0),                     # empty
    (2, "   ", None, "s", 3),                  # whitespace only, NULL lang
    (3, "héllo wörld ünïcode tëxt", "de", "s", 24),
    (4, "the the the the", "en", "s", 15),     # one distinct token
    (5, "a", "en", None, 1),                   # single char, NULL source
    (6, "word " * 50, "en", "s", 250),
    (7, "word " * 50, "en", "s", 250),         # exact duplicate of 6
    (8, "\tTAB\nnewline mixed   spaces", "en", "s", 27),
    (9, "Res ipsa loquitur, the quick brown fox; punct! and? marks.",
     "en", "s", 59),
]


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("degenerate_documents")
    docs = spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(root / "documents.parquet"))
    return str(root)


def _norm(rows):
    out = []
    for r in rows:
        out.append(tuple(
            None if v is None
            else (round(float(v), 6) if isinstance(v, float) else v)
            for v in r))
    return sorted(out, key=lambda t: tuple((v is None, str(type(v)), v)
                                           for v in t))


@pytest.mark.parametrize("name", QUERIES)
def test_document_query_matches_oracle_on_degenerate_corpus(spark,
                                                            corpus_dir,
                                                            name):
    got = _norm(run_query(spark, corpus_dir, CATALOG[name]).collect())
    con = duckdb.connect()
    con.sql("create view documents as select * from "
            f"'{corpus_dir}/documents.parquet/*.parquet'")
    want = _norm(con.sql(CATALOG[name].duck_sql).fetchall())
    assert got == want


def test_dedup_exact_excludes_keyless_docs(spark, corpus_dir):
    got = run_query(spark, corpus_dir, CATALOG["dedup_exact"]).collect()
    # only the real duplicate pair (6, 7); NULL/empty/whitespace docs
    # have no dedup key
    assert [(r["dup_cnt"], r["keep_doc"]) for r in got] == [(2, 6)]


def test_media_pipeline_null_text_row_is_all_null(spark, corpus_dir):
    row = run_query(spark, corpus_dir, CATALOG["media_pipeline"]) \
        .filter("doc_id = 0").collect()[0]
    assert row["n_bytes"] is None and row["media_type"] is None
    assert row["resized_n_bytes"] is None and row["resized_hex"] is None
    assert row["n_sampled"] == 0 and row["frame0_hex"] is None

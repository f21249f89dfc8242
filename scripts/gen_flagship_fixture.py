#!/usr/bin/env python
"""Regenerate the flagship-oracle fixture module.

Runs the PANDAS reference path (cqi_engine.sources.webways.flagship_expected
— the golden-verified kernel, no Spark) over the sf0.01 corpus and writes
the (id, side, way_type, index, stress_level) projection as a static DuckDB
VALUES literal into ``cqi_engine/queries/_flagship_fixture.py``.

The committed module is pinned by
tests/test_oracle_parity.py::test_flagship_fixture_fresh — if the kernel or
the synthesis changes, regenerate with:

    python scripts/gen_flagship_fixture.py
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cqi_engine.sources.webways import (FLAGSHIP_PROJECTION,
                                        flagship_expected,
                                        flagship_full_expected)

# the COMMITTED fixture is always sf0.01 (the driver grades there); the
# env override exists for the scale-decade sweep procedure: regenerate at
# sf0.1, run scripts/check_oracles.py at sf0.1 with the fixture queries
# included, then regenerate back (test_oracle_parity pins freshness)
SF_DIR = os.environ.get("SPARK_GRAFT_FIXTURE_SF_DIR",
                        "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "cqi_engine", "queries", "_flagship_fixture.py")


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v):
            return str(int(v))
        return repr(v)
    if isinstance(v, (int,)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def _values_sql(df, cols) -> str:
    rows = ["(" + ", ".join(_lit(v) for v in t) + ")"
            for t in df.itertuples(index=False)]
    col_list = ", ".join(f'"{c}"' for c in cols)
    return ("select * from (values\n" + ",\n".join(rows)
            + f"\n) as t({col_list})")


def main() -> None:
    from cqi_engine.sources.webways import scored_pandas
    scored = scored_pandas(SF_DIR)  # the expensive step — run it once
    exp = flagship_expected(SF_DIR, scored=scored)
    sql = _values_sql(exp, FLAGSHIP_PROJECTION)
    full = flagship_full_expected(SF_DIR, scored=scored)
    full_sql = _values_sql(full, list(full.columns))
    body = (
        '"""Flagship-oracle fixture (GENERATED — do not edit by hand).\n\n'
        "Produced by scripts/gen_flagship_fixture.py from the PANDAS\n"
        f"reference path over {SF_DIR}; pinned fresh by\n"
        "tests/test_oracle_parity.py::test_flagship_fixture_fresh.\n\n"
        "FIXTURE_SQL grades the 5-column deterministic projection;\n"
        "FULL_FIXTURE_SQL grades a per-row sha256 digest covering ALL 38\n"
        "output columns (webways.digest_rows_pdf canonicalization).\n"
        '"""\n\n'
        f"N_ROWS = {len(exp)}\n\n"
        f'FIXTURE_SQL = """{sql}"""\n\n'
        f'FULL_FIXTURE_SQL = """{full_sql}"""\n'
    )
    with open(OUT, "w", encoding="utf-8") as fh:
        fh.write(body)
    print(f"wrote {OUT}: {len(exp)} rows (+{len(full)} digest rows)")


if __name__ == "__main__":
    main()

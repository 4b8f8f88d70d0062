"""Fast contract lint — no query execution.

For every ``queries()`` entry: build the DataFrame (Catalyst analysis
only) and, when an oracle exists, parse the oracle SQL in DuckDB via
EXPLAIN and compare SORTED column names — the same column contract
the driver's value-hash comparison depends on. Catches schema drift
(renamed aggregate, missing alias, added column) in seconds, where
the full gate (tools/check_oracle.py) takes minutes of execution.

Usage: python tools/lint_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as mod
    from bht_etl_app_spark import get_spark

    spark = get_spark("contract-lint")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = mod.queries(), mod.oracle_sql()
    problems = []
    for name, fn in qs.items():
        try:
            cols = fn(spark, sf_dir).columns  # analysis only, no jobs
        except Exception as e:
            problems.append(f"{name}: Spark analysis failed: {e}")
            continue
        if name not in oracles:
            continue
        try:
            cur = con.execute(f"DESCRIBE {oracles[name]}")
            ocols = [r[0] for r in cur.fetchall()]
        except Exception as e:
            problems.append(f"{name}: oracle SQL failed to plan: {str(e)[:200]}")
            continue
        if sorted(cols) != sorted(ocols):
            problems.append(
                f"{name}: column mismatch spark={sorted(cols)} oracle={sorted(ocols)}"
            )
    orphans = set(oracles) - set(qs)
    for name in sorted(orphans):
        problems.append(f"{name}: oracle_sql entry with no queries() entry")

    for p in problems:
        print("LINT", p)
    print(f"{len(qs)} queries, {len(oracles)} oracles, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

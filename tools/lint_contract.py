"""Fast contract lint — no query execution.

For every ``queries()`` entry: build the DataFrame (Catalyst analysis
only) and, when an oracle exists, parse the oracle SQL in DuckDB via
EXPLAIN and compare SORTED column names — the same column contract
the driver's value-hash comparison depends on. Catches schema drift
(renamed aggregate, missing alias, added column) in seconds, where
the full gate (tools/check_oracle.py) takes minutes of execution.

Driver-hashability rules (both r5 driver reds were this class): the
driver canonicalizes BOTH result sets through pandas before hashing,
so on every oracle-checked key
- Spark output may not contain array/struct/map columns (pandas
  cannot hash list cells -> ``TypeError: unhashable type``), and
- oracle output may not contain LIST/STRUCT/MAP *or HUGEINT* columns
  (duckdb's pandas conversion turns HUGEINT into float64 while the
  Spark side arrives as int64 — equal values, diverging hash; cast
  ``sum(BIGINT)`` results to BIGINT).
Rows-only keys are exempt: the driver only counts their rows.

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


def type_class(t: str) -> str:
    """Coarse cross-engine type class: the driver hashes both result
    sets after pandas conversion, so a Spark/oracle pair whose
    classes differ (decimal vs double, date vs timestamp) can
    hash-diverge on equal values. Same-class width differences
    (int32/int64) are canonicalized by the driver — r1-r5 greens
    include INTEGER-vs-long pairs."""
    t = t.lower()
    if t.startswith(("decimal", "hugeint")):
        return "dec"
    if t in ("bigint", "int", "integer", "smallint", "tinyint", "long",
             "short", "byte", "ubigint", "uinteger", "usmallint", "utinyint"):
        return "int"
    if t == "double":
        return "float"
    if t in ("float", "real"):
        # 32-bit floats are NOT the driver-canonicalized same class as
        # double: pandas lands them as float32 vs float64, which
        # hash-diverges on equal values (ADVICE r6) — the exact bug
        # class this lint exists to catch, so they get their own class
        return "float32"
    if t in ("string", "varchar"):
        return "str"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        # tz-aware is its own class: duckdb TIMESTAMPTZ -> pandas
        # tz-aware datetime64[ns, UTC], while Spark timestamps arrive
        # naive — equal instants, diverging hash
        if "with time zone" in t or t.startswith("timestamptz"):
            return "tstz"
        return "ts"
    if t in ("boolean", "bool"):
        return "bool"
    if t in ("binary", "blob", "bytea", "varbinary"):
        return "bin"
    if t.startswith("interval"):
        return "interval"
    return t


def spark_type_hazard(dtype: str) -> bool:
    """True for Spark output types the driver's pandas hasher cannot
    canonicalize (nested cells are unhashable)."""
    return dtype.startswith(("array<", "struct<", "map<"))


def oracle_type_hazard(duck_type: str) -> bool:
    """True for DuckDB output types whose pandas conversion diverges
    from Spark's: nested -> unhashable, HUGEINT -> float64 vs int64.
    Covers both variable ("BIGINT[]") and fixed-size ("BIGINT[3]")
    array suffixes."""
    import re

    tu = duck_type.upper()
    return (
        "HUGEINT" in tu
        or re.search(r"\[\d*\]$", tu) is not None
        or tu.startswith(("STRUCT", "MAP", "LIST", "UNION"))
    )


def lint_reverify_literal(entry_path: str) -> list[str]:
    """AST-lint the ``_REVERIFY`` dict literal (r8 review #1): the
    restamp log deliberately keeps HISTORY as duplicate keys (a key
    restamped in r4 and again in r7 appears twice; Python keeps the
    last), which is safe ONLY while restamps are appended at the end
    — a new stamp inserted ABOVE an existing later duplicate is
    silently shadowed and the key never re-verifies (exactly the
    stale-green failure mode the dict exists to prevent). Enforce the
    invariant mechanically: every duplicated key's values must be
    non-decreasing in source order, so the winning (last) entry is
    always the newest round."""
    import ast

    # entry_path comes from mod.__file__, which can point into
    # __pycache__ (…/__pycache__/__spark_entry__.cpython-311.pyc) when
    # the module was loaded from bytecode; a naive .pyc→.py swap keeps
    # the __pycache__ dir and the cpython tag, so the open() below
    # would crash with FileNotFoundError instead of reporting
    # (r8 ADVICE). importlib owns the inverse mapping — use it.
    if entry_path.endswith((".pyc", ".pyo")):
        import importlib.util

        try:
            entry_path = importlib.util.source_from_cache(entry_path)
        except ValueError:
            # legacy layout: foo.pyc sitting beside foo.py
            entry_path = entry_path[:-1]
    with open(entry_path) as f:
        tree = ast.parse(f.read())
    out: list[str] = []
    found = False
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and len(node.targets) == 1
            and isinstance(node.targets[0], ast.Name)
            and node.targets[0].id == "_REVERIFY"
            and isinstance(node.value, ast.Dict)
        ):
            found = True
            seen: dict[str, int] = {}
            for k, v in zip(node.value.keys, node.value.values):
                if not (
                    isinstance(k, ast.Constant)
                    and isinstance(v, ast.Constant)
                    and isinstance(v.value, int)
                ):
                    out.append(
                        "_REVERIFY: non-literal or non-int key/value at "
                        f"line {k.lineno if k else v.lineno}"
                    )
                    continue
                if k.value in seen and v.value < seen[k.value]:
                    out.append(
                        f"_REVERIFY: {k.value!r} restamped at round "
                        f"{v.value} BELOW an earlier {seen[k.value]} "
                        f"(line {k.lineno}) — later duplicate shadows "
                        "it; append restamps at the end"
                    )
                seen[k.value] = max(v.value, seen.get(k.value, v.value))
            break
    if not found:
        # refactoring _REVERIFY out of a plain dict literal silently
        # disables this guard — fail loudly instead (r8 review #3)
        out.append(
            "_REVERIFY: dict literal not found in the contract file — "
            "the shadowed-restamp guard cannot run; keep _REVERIFY a "
            "plain `_REVERIFY = {...}` assignment"
        )
    return out


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
            sdf = fn(spark, sf_dir)  # analysis only, no jobs
            cols = sdf.columns
        except Exception as e:
            problems.append(f"{name}: Spark analysis failed: {e}")
            continue
        if name not in oracles:
            continue
        for c, t in sdf.dtypes:
            if spark_type_hazard(t):
                problems.append(
                    f"{name}: spark column {c!r} is {t} — the driver's "
                    "pandas hasher cannot hash nested cells; reshape to "
                    "scalar columns or drop the oracle (rows-only)"
                )
        try:
            cur = con.execute(f"DESCRIBE {oracles[name]}")
            odesc = [(r[0], r[1]) for r in cur.fetchall()]
            ocols = [c for c, _ in odesc]
        except Exception as e:
            problems.append(f"{name}: oracle SQL failed to plan: {str(e)[:200]}")
            continue
        for c, t in odesc:
            if oracle_type_hazard(t):
                problems.append(
                    f"{name}: oracle column {c!r} is {t} — duckdb->pandas "
                    "canonicalization diverges from Spark's (HUGEINT -> "
                    "float64, nested -> unhashable); CAST to a scalar "
                    "SQL type"
                )
        if sorted(cols) != sorted(ocols):
            problems.append(
                f"{name}: column mismatch spark={sorted(cols)} oracle={sorted(ocols)}"
            )
        sdtypes = dict(sdf.dtypes)
        for c, ot in odesc:
            st = sdtypes.get(c)
            if st is not None and type_class(st) != type_class(ot):
                problems.append(
                    f"{name}: type-class mismatch on {c!r}: spark {st} "
                    f"vs oracle {ot} — may hash-diverge after the "
                    "driver's pandas canonicalization"
                )
    orphans = set(oracles) - set(qs)
    for name in sorted(orphans):
        problems.append(f"{name}: oracle_sql entry with no queries() entry")

    problems.extend(lint_reverify_literal(mod.__file__))

    for p in problems:
        print("LINT", p)
    print(f"{len(qs)} queries, {len(oracles)} oracles, {len(problems)} problems")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())

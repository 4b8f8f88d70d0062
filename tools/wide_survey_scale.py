"""Scale run for the §2 survey kernels on a wide fixture
(VERDICT r5 item #7): 1000 columns x N rows (default 10^6 — 10^9
cells through A10's single unpivot), timing A6 selected_counts and
A10 full_tabulation and cross-checking both against the generator's
closed form. Results recorded in PERFORMANCE.md.

Usage: python tools/wide_survey_scale.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_wide_survey import N_COLS, _phase_counts, make_wide_survey  # noqa: E402


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    from bht_etl_app_spark import get_spark
    from bht_etl_app_spark.operators.aggregates import (
        full_tabulation,
        selected_counts,
    )

    spark = get_spark("wide-survey-scale")
    spark.sparkContext.setLogLevel("ERROR")

    wide = make_wide_survey(spark, n_rows, N_COLS)
    qcols = [c for c in wide.columns if c != "id"]

    t0 = time.perf_counter()
    sel = {r["brand"]: r["count"] for r in selected_counts(wide, qcols).collect()}
    t_sel = time.perf_counter() - t0
    for i in (0, 499, 999):
        pc = _phase_counts(n_rows, i)
        assert sel[f"q{i:04d}"] == pc[0] + pc[1] + pc[2], f"A6 wrong at col {i}"

    t0 = time.perf_counter()
    tab = full_tabulation(wide, qcols).collect()
    t_tab = time.perf_counter() - t0
    assert len(tab) == N_COLS * 4
    assert sum(r["count"] for r in tab) == n_rows * N_COLS, "A10 mass wrong"

    print(
        f"rows={n_rows} cols={N_COLS} cells={n_rows * N_COLS:.1e} "
        f"selected_counts={t_sel:.1f}s full_tabulation={t_tab:.1f}s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

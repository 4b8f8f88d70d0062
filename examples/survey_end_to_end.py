"""End-to-end survey ETL walkthrough — the full reference workflow
(upload -> codebook recode -> auto-map -> transform -> export,
app.py:197-615) as a headless script.

Usage:
    python examples/survey_end_to_end.py [out_dir]

Writes the aggregate-table bundle (JSON + parquet) under out_dir
(default: a temp dir) and prints each table.
"""

from __future__ import annotations

import csv
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bht_etl_app_spark import get_spark
from bht_etl_app_spark.config import MappingConfig
from bht_etl_app_spark.io import (
    apply_codebook,
    read_codebook,
    read_table,
    write_json_bundle,
    write_parquet_bundle,
)
from bht_etl_app_spark.pipeline import BhtPipeline

SURVEY_ROWS = [
    # resp_id, gender, region, tom_brand, UA_Indomie, UA_Sedaap, aa_Supermi,
    # ever_indomie, bumo, consider_sedaap, csat, nps_score, weight
    ["1", "M", "W. Java", "Indomie", "1", "", "1", "1", "Indomie", "0", "5", "10", "1.5"],
    ["2", "F", "E. Java", "Sedaap", "", "1", "1", "0", "Sedaap", "1", "4", "9", "2"],
    ["3", "F", "Sumatra", "", "0", "x", "1", "1", "Indomie", "1", "", "7", ""],
    ["4", "", "W. Java", "Indomie", "0.0", "0", "0", "1", "Indomie", "0", "3", "6", "0.5"],
    ["5", "M", "Bali", "Supermi", "yes", "1", "", "0", "Supermi", "1", "5", "0", "1"],
    ["6", "F", "W. Java", " Indomie ", "No", "1", "1", "1", "Indomie", "1", "2", "8", "2"],
]
HEADER = ["resp_id", "gender", "region", "tom_brand", "UA_Indomie",
          "UA_Sedaap", "aa_Supermi", "ever_indomie", "bumo",
          "consider_sedaap", "csat", "nps_score", "weight"]

CODEBOOK = [
    ["column", "value", "label"],
    ["gender", "M", "Male"],
    ["gender", "F", "Female"],
    ["region", "W. Java", "West Java"],
    ["region", "E. Java", "East Java"],
]


def main(out_dir: str) -> None:
    spark = get_spark("survey-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. "upload": land the raw export + codebook as CSVs, ingest
    raw_csv = os.path.join(out_dir, "survey.csv")
    cb_csv = os.path.join(out_dir, "codebook.csv")
    with open(raw_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(SURVEY_ROWS)
    with open(cb_csv, "w", newline="") as f:
        csv.writer(f).writerows(CODEBOOK)

    raw = read_table(spark, raw_csv)

    # 2. codebook recode (broadcast-join form of app.py:221-227)
    recoded = apply_codebook(raw, read_codebook(spark, cb_csv))

    # 3. auto-detect the mapping from headers (app.py:38-72) and save it
    cfg = MappingConfig.guess(recoded.columns)
    cfg.save(os.path.join(out_dir, "mapping_config.json"))
    print("detected mapping:", cfg.to_dict())

    # 4. transform -> dict of lazy aggregate tables (app.py:462-574)
    tables = BhtPipeline(cfg, weight_col="weight").transform(recoded)

    # 5. export (app.py:592-615; Excel needs openpyxl, so JSON+parquet here)
    write_json_bundle(tables, os.path.join(out_dir, "bundle.json"))
    write_parquet_bundle(tables, os.path.join(out_dir, "tables"))

    for name, df in tables.items():
        print(f"\n== {name} ==")
        df.show(10, truncate=False)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="survey-out-")
    os.makedirs(out, exist_ok=True)
    main(out)
    print("\nwrote bundle to", out)

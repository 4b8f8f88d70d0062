"""Pandas re-implementations of the reference kernels, used as golden
oracles in differential tests. Semantics follow /root/reference/app.py
(cited per function); code is written fresh for the test harness.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def weights(df: pd.DataFrame, weight_col: str | None) -> pd.Series:
    # app.py:101-105
    if weight_col and weight_col in df.columns:
        return pd.to_numeric(df[weight_col], errors="coerce").fillna(0)
    return pd.Series(1, index=df.index, dtype="float64")


def safe_value_counts(series: pd.Series) -> pd.DataFrame:
    # app.py:84-92
    s = series.dropna().astype(str).str.strip()
    s = s[s.ne("")]
    vc = s.value_counts(dropna=True)
    return vc.rename_axis("option").reset_index(name="count")


def freq_table(df, col, weight_col=None, decimals=1) -> pd.DataFrame:
    # app.py:108-115
    w = weights(df, weight_col)
    g = df[col].astype(str).str.strip()
    counts = w.groupby(g).sum().rename("count").reset_index().rename(columns={col: "value"})
    total = counts["count"].sum()
    counts["pct_total"] = (counts["count"] / total * 100).round(decimals)
    counts.insert(0, "column", col)
    return counts.sort_values("count", ascending=False).reset_index(drop=True)


def crosstab_table(df, rows, cols, weight_col=None, percent="total",
                   include_totals=True, decimals=1) -> pd.DataFrame:
    # app.py:118-156
    w = weights(df, weight_col)
    tmp = df[[rows, cols]].copy()
    tmp["__w__"] = w
    piv = pd.pivot_table(tmp, index=rows, columns=cols, values="__w__",
                         aggfunc="sum", fill_value=0)
    if percent == "row":
        denom = piv.sum(axis=1).replace(0, np.nan)
        pct = piv.div(denom, axis=0) * 100
    elif percent == "col":
        denom = piv.sum(axis=0).replace(0, np.nan)
        pct = piv.div(denom, axis=1) * 100
    else:
        denom = piv.values.sum()
        denom = denom if denom != 0 else np.nan
        pct = piv / denom * 100
    pct = pct.round(decimals)
    if include_totals:
        piv.loc["Total", :] = piv.sum(axis=0)
        piv.loc[:, "Total"] = piv.sum(axis=1)
        pct.loc["Total", :] = pct.sum(axis=0) if percent != "row" else 100.0
        pct.loc[:, "Total"] = pct.sum(axis=1) if percent != "col" else 100.0
    piv = piv.reset_index()
    pct = pct.reset_index()
    piv["__type__"] = "count"
    pct["__type__"] = f"%_{percent}"
    return pd.concat([piv, pct], ignore_index=True)


def multi_dim_tabulation(df, dims, weight_col=None, percent_by="total",
                         decimals=1) -> pd.DataFrame:
    # app.py:159-178
    w = weights(df, weight_col)
    tmp = df[dims].copy()
    tmp["__w__"] = w
    grp = tmp.groupby(dims, dropna=False)["__w__"].sum().rename("count").reset_index()
    total = grp["count"].sum()
    if percent_by == "total":
        grp["pct"] = (grp["count"] / (total if total else np.nan) * 100).round(decimals)
    elif percent_by in dims:
        denom = grp.groupby(percent_by)["count"].transform("sum").replace(0, np.nan)
        grp["pct"] = (grp["count"] / denom * 100).round(decimals)
    else:
        grp["pct"] = np.nan
    return grp


def selected_counts(df, cols) -> pd.DataFrame:
    # app.py:396-434 (sel-predicate at 401/412/427)
    items = []
    for c in cols:
        if c in df.columns:
            s = df[c]
            sel = s.notna() & s.astype(str).str.strip().ne("") & s.astype(str).str.lower().ne("0")
            items.append({"brand": c, "count": int(sel.sum())})
    return pd.DataFrame(items)


def satisfaction_table(df, csat_col) -> pd.DataFrame:
    # app.py:437-444
    s = pd.to_numeric(df[csat_col], errors="coerce")
    return pd.DataFrame({
        "metric": ["mean", "top2_box", "n"],
        "value": [
            s.mean(skipna=True),
            (s >= s.max() - 1).mean() if s.notna().any() else np.nan,
            float(s.notna().sum()),
        ],
    })


def nps_table(df, nps_col) -> pd.DataFrame:
    # app.py:447-459
    s = pd.to_numeric(df[nps_col], errors="coerce")
    detractors = float(((s >= 0) & (s <= 6)).sum())
    passives = float(((s >= 7) & (s <= 8)).sum())
    promoters = float(((s >= 9) & (s <= 10)).sum())
    n = float(s.notna().sum())
    if n == 0:
        return pd.DataFrame({"metric": ["nps", "n"], "value": [np.nan, 0.0]})
    nps = (promoters / n - detractors / n) * 100
    return pd.DataFrame({
        "metric": ["nps", "n", "promoters", "passives", "detractors"],
        "value": [nps, n, promoters, passives, detractors],
    })


def full_tabulation(df) -> pd.DataFrame:
    # app.py:519-531
    rows = []
    for col in df.columns:
        ser = df[col].astype(str).str.strip()
        for val, cnt in ser.value_counts(dropna=False).items():
            rows.append({"column": col, "value": val, "count": int(cnt)})
    return pd.DataFrame(rows)

"""Time-series joins Spark lacks as built-ins: as-of join and
interval/range join.

**As-of join** — for every left row, the single most recent right row
with ``right.ts <= left.ts`` (optionally within a tolerance), per key.
The lakehouse-standard implementation: cogroup both sides by key and
run pandas ``merge_asof`` per group — each group arrives ts-sorted
(sorted locally, group-sized state), one shuffle per side on the key,
no row multiplication ever.  kdb's ``aj``, DuckDB's ``ASOF JOIN``,
Flink's temporal join — same semantics, so the DuckDB oracle replays
it natively.

**Range join** — pair left rows with right INTERVALS that contain
them (``start <= ts < end``).  The naive non-equi join degenerates to
per-key cartesian; the scale shape is the standard BINNING rewrite:
buckets of width ``bin``, intervals explode to the buckets they span,
points map to one bucket, equi-join on ``(key, bucket)``, then the
exact containment filter.  Join work becomes proportional to true
overlaps (plus interval span / bin), never |L|×|R| — the same rewrite
Databricks' range-join optimization applies from a hint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: str,
    right_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Left rows + the latest right row at-or-before each left ts,
    per ``by`` key.  Unmatched left rows keep nulls (left join).
    ``tolerance`` (e.g. ``"30 minutes"``) bounds the lookback like
    pandas' merge_asof tolerance."""
    # self-source safety: when left and right derive from the same
    # DataFrame (e.g. two filters of one events table), their columns
    # share Catalyst expression ids and the cogroup plan dedupes the
    # shared attributes out of the right side — re-aliasing mints
    # fresh ids so the right group keeps every column
    right = right.select(*[F.col(c).alias(c) for c in right.columns])
    rcols = right_cols or [c for c in right.columns
                           if c not in (ts_col, by)]
    out_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in left.schema.fields
    )
    r_schema = {f.name: f.dataType.simpleString()
                for f in right.schema.fields}
    out_schema = out_fields + ", " + ", ".join(
        f"`r_{c}` {r_schema[c]}" for c in rcols
    )
    tol = pd.Timedelta(tolerance) if tolerance else None
    lcols = list(left.columns)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(l_pdf):  # key exists only on the right side
            return pd.DataFrame(columns=lcols + [f"r_{c}" for c in rcols])
        l_pdf = l_pdf.sort_values(ts_col, kind="stable")
        if not len(r_pdf):
            for c in rcols:
                l_pdf[f"r_{c}"] = None
            return l_pdf[lcols + [f"r_{c}" for c in rcols]]
        r_pdf = (
            r_pdf[[ts_col] + rcols]
            .sort_values(ts_col, kind="stable")
            .rename(columns={c: f"r_{c}" for c in rcols})
        )
        kw = {"tolerance": tol} if tol is not None else {}
        m = pd.merge_asof(l_pdf, r_pdf, on=ts_col,
                          direction="backward", **kw)
        return m[lcols + [f"r_{c}" for c in rcols]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(lambda l, r: merge(l, r), out_schema)
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    by: str | None = None,
    bin_seconds: int = 3600,
) -> DataFrame:
    """(point row ⨯ containing interval row) pairs via the binning
    rewrite; containment is ``start <= ts < end`` (half-open).  Pick
    ``bin_seconds`` near the median interval length — too small
    explodes intervals into many buckets, too large degrades the
    equi-join's selectivity; either way results are exact."""
    b = F.lit(bin_seconds)
    pt = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(ts_col)) / b)
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                # end is exclusive: a zero-length tail bucket is fine —
                # the exact filter below removes any overreach
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    on = [pt["_bin"] == iv["_bin"]]
    if by is not None:
        on.append(pt[by] == iv[by])
    cond = on[0]
    for c in on[1:]:
        cond = cond & c
    joined = pt.join(iv, cond).where(
        (pt[ts_col] >= iv[start_col]) & (pt[ts_col] < iv[end_col])
    )
    keep = [pt[c] for c in points.columns] + [
        iv[c].alias(f"iv_{c}") for c in intervals.columns
        if c != by
    ]
    return joined.select(*keep)

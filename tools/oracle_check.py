"""Local replica of the driver's correctness gate.

Runs every catalog query in Spark AND its oracle SQL in DuckDB over the
same parquet tables, then compares row count, column names, and an
order-insensitive canonical form of every value. Used by the pytest suite
and runnable standalone:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from healthcare_data_warehouse_spark.config import TABLES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v) -> str:
    """Canonical string for a cell — doubles keep full bit precision."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return "<null>"
        return v.isoformat()
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "<null>"
    except (TypeError, ValueError):
        pass
    return repr(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def arrow_to_frame(table) -> pd.DataFrame:
    """Arrow table → DataFrame of Python objects (logical types preserved —
    date32 stays datetime.date instead of pandas promoting it to
    datetime64)."""
    return pd.DataFrame({name: table.column(name).to_pylist() for name in table.column_names})


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns: spark={sc} oracle={oc}")
        return problems
    s_rows, o_rows = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            (a, b) for a, b in zip(s_rows, o_rows) if a != b
        ][:3]
        extra = abs(len(s_rows) - len(o_rows))
        problems.append(f"values differ; first diffs={diffs} (+{extra} length delta)")
    return problems


def compare_frames_tolerant(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                            rel_tolerance: float) -> list[str]:
    """Tolerance-mode comparison for entries whose values are correct
    but not hash-matchable (sketch estimates vs exact ground truth,
    libm ulp drift): row count and column set must match exactly;
    non-numeric columns must match exactly after sorting; every numeric
    cell must sit within rel_tolerance of the oracle's
    (|s - o| <= rel_tolerance * max(1, |o|)). Rows align by sorting on
    the non-numeric columns first, then numerics — sound when the
    leading sort columns form a key (true for every soft-oracle entry)."""
    import numbers

    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        return [f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"]
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        return [f"columns: spark={sc} oracle={oc}"]

    def _is_num(col: pd.Series) -> bool:
        return all(isinstance(v, numbers.Number) and not isinstance(v, bool)
                   for v in col if v is not None)

    num_cols = [c for c in sc if _is_num(spark_pdf[c]) and _is_num(oracle_pdf[c])]
    key_cols = [c for c in sc if c not in num_cols] + num_cols

    def _rows(pdf):
        return sorted(
            (tuple(_canon_cell(row[c]) if c not in num_cols else row[c]
                   for c in key_cols))
            for _, row in pdf.iterrows()
        )

    for i, (srow, orow) in enumerate(zip(_rows(spark_pdf), _rows(oracle_pdf))):
        for c, sv, ov in zip(key_cols, srow, orow):
            if c not in num_cols:
                if sv != ov:
                    problems.append(f"row {i} col {c}: {sv!r} != {ov!r}")
            else:
                if sv is None or ov is None:
                    if (sv is None) != (ov is None):
                        problems.append(f"row {i} col {c}: {sv} vs {ov}")
                elif abs(float(sv) - float(ov)) > rel_tolerance * max(1.0, abs(float(ov))):
                    problems.append(
                        f"row {i} col {c}: {sv} outside {rel_tolerance:.0%} of {ov}")
        if len(problems) >= 3:
            break
    return problems


def compare_recall(spark_pdf: pd.DataFrame, truth_pdf: pd.DataFrame,
                   cols: tuple[str, ...], floor: float) -> list[str]:
    """Recall-band comparison for APPROXIMATE neighbor queries: project
    both sides to the id columns and require
    |spark ∩ truth| / |truth| >= floor. The floor is a MEASURED recall
    pinned below the operator's calibrated value, so a knob regression
    (probe count, refine size, routing bug) fails the gate while the
    contractual approximation passes. Also refuses silent over-returning
    (more rows than the truth's k-list — an exactness bug, not recall)."""
    missing = [c for c in cols if c not in spark_pdf.columns]
    if missing:
        return [f"recall cols missing from spark result: {missing}"]
    s = set(map(tuple, spark_pdf[list(cols)].itertuples(index=False,
                                                        name=None)))
    t = set(map(tuple, truth_pdf[list(cols)].itertuples(index=False,
                                                        name=None)))
    if not t:
        return [] if not s else ["truth empty but spark returned rows"]
    recall = len(s & t) / len(t)
    problems = []
    if recall < floor:
        problems.append(
            f"recall {recall:.3f} below pinned floor {floor:.2f} "
            f"(|spark∩truth|={len(s & t)}, |truth|={len(t)})")
    if len(s) > len(t):
        problems.append(
            f"spark returned {len(s)} ids > truth's {len(t)} (over-return)")
    return problems


def compare_containment(spark_pdf: pd.DataFrame, truth_pdf: pd.DataFrame,
                        cols: tuple[str, ...], floor: float,
                        filt: str) -> list[str]:
    """Containment-band comparison for flag-selecting model queries
    (classifier positives, anomaly flags): filter the spark result to the
    flagged subset, project to the id columns, and require
    |flag ∩ truth| / |flag| >= floor — i.e. the model's selections must
    sit inside the SQL-derived superset (actual labels, robust-outlier
    top fraction) at a precision pinned from measurement. An EMPTY flag
    set fails: a model that stops selecting anything would otherwise
    pass vacuously."""
    missing = [c for c in cols if c not in spark_pdf.columns]
    if missing:
        return [f"containment cols missing from spark result: {missing}"]
    try:
        flagged = spark_pdf.query(filt)
    except Exception as exc:  # noqa: BLE001
        return [f"containment filter {filt!r} failed: {exc}"]
    s = set(map(tuple, flagged[list(cols)].itertuples(index=False,
                                                      name=None)))
    if not s:
        return [f"containment filter {filt!r} selected 0 rows "
                f"(model flags nothing — vacuous pass refused)"]
    t = set(map(tuple, truth_pdf[list(cols)].itertuples(index=False,
                                                        name=None)))
    containment = len(s & t) / len(s)
    if containment < floor:
        return [f"containment {containment:.3f} below pinned floor "
                f"{floor:.2f} (|flag∩truth|={len(s & t)}, |flag|={len(s)})"]
    return []


def check_query(spark, name: str, sf_dir: str) -> list[str]:
    import __spark_entry__ as e
    from healthcare_data_warehouse_spark.plans.catalog import _REGISTRY

    q = e.queries()[name]
    sql = e.oracle_sql().get(name)
    sdf = q(spark, sf_dir)
    s_arrow = sdf.toArrow()
    spark_pdf = arrow_to_frame(s_arrow)
    if sql is None:
        entry = _REGISTRY.get(name)
        if entry is not None and entry.soft_oracle:
            con = duck_connection(sf_dir)
            oracle_pdf = arrow_to_frame(con.execute(entry.soft_oracle).arrow())
            con.close()
            return compare_frames_tolerant(spark_pdf, oracle_pdf,
                                           entry.rel_tolerance)
        if entry is not None and entry.recall_oracle:
            con = duck_connection(sf_dir)
            truth_pdf = arrow_to_frame(
                con.execute(entry.recall_oracle).arrow())
            con.close()
            return compare_recall(spark_pdf, truth_pdf, entry.recall_cols,
                                  entry.recall_floor)
        if entry is not None and entry.containment_oracle:
            con = duck_connection(sf_dir)
            truth_pdf = arrow_to_frame(
                con.execute(entry.containment_oracle).arrow())
            con.close()
            return compare_containment(spark_pdf, truth_pdf,
                                       entry.containment_cols,
                                       entry.containment_floor,
                                       entry.containment_filter)
        if entry is not None and entry.band_oracle:
            con = duck_connection(sf_dir)
            band_pdf = arrow_to_frame(con.execute(entry.band_oracle).arrow())
            con.close()
            if len(band_pdf) != 1:
                return [f"band oracle returned {len(band_pdf)} rows, want 1"]
            return list(entry.band_check(spark_pdf, band_pdf.iloc[0]))
        return [] if len(spark_pdf) >= 0 else ["spark query failed"]
    con = duck_connection(sf_dir)
    o_arrow = con.execute(sql).arrow()
    oracle_pdf = arrow_to_frame(o_arrow)
    con.close()
    problems = compare_frames(spark_pdf, oracle_pdf)
    s_types = {f.name: str(f.type) for f in s_arrow.schema}
    o_types = {f.name: str(f.type) for f in o_arrow.schema}
    for c in sorted(set(s_types) | set(o_types)):
        if s_types.get(c) != o_types.get(c):
            problems.append(
                f"dtype {c}: spark={s_types.get(c)} oracle={o_types.get(c)}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    os.chdir(REPO)
    import __spark_entry__ as e
    from healthcare_data_warehouse_spark.session import get_spark

    spark = get_spark("oracle-check")
    names = sys.argv[2:] or list(e.queries())
    failed = []
    for name in names:
        try:
            problems = check_query(spark, name, sf_dir)
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
        status = "OK" if not problems else "FAIL"
        has_oracle = name in e.oracle_sql()
        if has_oracle:
            tag = ""
        else:
            from healthcare_data_warehouse_spark.plans.catalog import _REGISTRY
            entry = _REGISTRY.get(name)
            if entry is not None and entry.soft_oracle:
                tag = f" (tolerance {entry.rel_tolerance:.0%})"
            elif entry is not None and entry.recall_oracle:
                tag = f" (recall >= {entry.recall_floor:.2f})"
            elif entry is not None and entry.containment_oracle:
                tag = f" (containment >= {entry.containment_floor:.2f})"
            elif entry is not None and entry.band_oracle:
                tag = " (band)"
            else:
                tag = " (rows-only)"
        print(f"[{status}] {name}{tag}")
        for p in problems:
            print(f"       {p}")
        if problems:
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

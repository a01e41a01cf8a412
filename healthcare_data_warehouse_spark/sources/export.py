"""Driver-edge export utilities (reference S2/S5: export_utils.py).

Exports are edge concerns, not engine operators: the result of an
aggregated query is small by construction, so ``toPandas`` at the driver
is the right boundary (the reference does the same via pd.read_sql →
to_csv/to_excel, export_utils.py:23-64). Excel needs openpyxl, which may
be absent — gated behind an import-try.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Default driver-side collect bound for exports. Export results are
#: aggregated reports (KPI blocks, top-k listings) — thousands of rows,
#: not facts. 1M rows of a typical report row (~100 B) is ~100 MB at
#: the driver: far above any real report, far below an OOM.
DEFAULT_EXPORT_MAX_ROWS = 1_000_000


class ExportTooLargeError(ValueError):
    """Raised when an export's result exceeds its row cap — almost
    always a plan mistake (exporting a fact table instead of the
    aggregate). Exports collect at the driver by design; at warehouse
    scale an unbounded ``toPandas`` of a 100 TB fact would OOM the
    driver long before the write starts, so the cap fails fast with
    the fix in the message."""


def _bounded_pandas(df: DataFrame, max_rows: int | None):
    """``toPandas`` behind a ``limit(n+1)`` probe: collects at most
    max_rows+1 rows (never the unbounded result), then raises if the
    probe row shows the result is over-cap. Mirrors the serving layer's
    ``max_rows`` page bound (plans/http_api.py)."""
    if max_rows is None:
        return df.toPandas()
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ExportTooLargeError(
            f"export result exceeds max_rows={max_rows}; exports are "
            "driver-side collects meant for aggregated reports. Aggregate "
            "or LIMIT the query first, write large results with "
            "df.write.parquet/csv (distributed), or raise max_rows "
            "explicitly if the size is intended."
        )
    return pdf


def export_csv(df: DataFrame, path: str,
               max_rows: int | None = DEFAULT_EXPORT_MAX_ROWS) -> None:
    """Single-file CSV export of a (small, aggregated) result.
    Row-capped (see ExportTooLargeError); pass ``max_rows=None`` only
    when the caller has already bounded the plan."""
    _bounded_pandas(df, max_rows).to_csv(path, index=False)


def export_excel(sheets: dict[str, DataFrame], path: str,
                 max_rows: int | None = DEFAULT_EXPORT_MAX_ROWS) -> bool:
    """Multi-sheet Excel export, one query result per sheet
    (export_utils.py:43-64). Returns False when openpyxl is unavailable.
    Each sheet is row-capped (see ExportTooLargeError)."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError:
        return False
    with pd.ExcelWriter(path, engine="openpyxl") as writer:
        for sheet_name, df in sheets.items():
            _bounded_pandas(df, max_rows).to_excel(
                writer, sheet_name=sheet_name[:31], index=False)
    return True


def generate_analytics_report(spark, sf_dir: str, path: str) -> bool:
    """The reference's bundled analytics report (export_utils.py:67-125):
    KPI block, age-group stats, top diagnoses, provider stats, monthly
    trend — one catalog query per sheet, one multi-sheet workbook. Each
    sheet's plan is the already-oracle-checked catalog entry; this is
    pure edge composition (no new query semantics)."""
    from ..plans import catalog

    qs = catalog.queries()
    sheets = {
        "KPIs": qs["kpi_block"](spark, sf_dir),
        "Age_Groups": qs["agg_by_agegroup"](spark, sf_dir),
        "Top_Diagnoses": qs["topk_diagnoses"](spark, sf_dir),
        "Provider_Stats": qs["provider_utilization"](spark, sf_dir),
        "Monthly_Trends": qs["agg_monthly_trend"](spark, sf_dir),
    }
    return export_excel(sheets, path)


def export_patient_data(spark, sf_dir: str, patient_key: int, path: str) -> None:
    """Per-patient anonymized export (export_utils.py:128-149): the
    parameterized patient-history query (typed bind, no SQL splicing)
    written as one CSV."""
    from ..plans import catalog

    df = catalog.queries()["patient_history"](spark, sf_dir,
                                              patient_key=patient_key)
    export_csv(df, path)


def export_ml_predictions(spark, sf_dir: str, path: str, limit: int = 1000) -> None:
    """Top-risk model-score export (export_utils.py:152-165) off the
    upserted ml_predictions store via the anomaly listing query."""
    from ..plans import catalog

    df = catalog.queries()["anomaly_listing"](spark, sf_dir, k=limit)
    export_csv(df, path)

"""Driver-edge export utilities (reference S2/S5: export_utils.py).

Exports are edge concerns, not engine operators: the result of an
aggregated query is small by construction, so ``toPandas`` at the driver
is the right boundary (the reference does the same via pd.read_sql →
to_csv/to_excel, export_utils.py:23-64). Excel needs openpyxl, which may
be absent — gated behind an import-try.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_csv(df: DataFrame, path: str) -> None:
    """Single-file CSV export of a (small, aggregated) result."""
    df.toPandas().to_csv(path, index=False)


def export_excel(sheets: dict[str, DataFrame], path: str) -> bool:
    """Multi-sheet Excel export, one query result per sheet
    (export_utils.py:43-64). Returns False when openpyxl is unavailable."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError:
        return False
    with pd.ExcelWriter(path, engine="openpyxl") as writer:
        for sheet_name, df in sheets.items():
            df.toPandas().to_excel(writer, sheet_name=sheet_name[:31], index=False)
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

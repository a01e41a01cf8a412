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

"""Tests for warehouse DDL (S6) and driver-edge exports (S2/S5)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from healthcare_data_warehouse_spark.config import SCRATCH_DIR
from healthcare_data_warehouse_spark.sources.ddl import create_star_schema, save_as_table
from healthcare_data_warehouse_spark.sources.export import export_csv, export_excel

from conftest import SF_SMOKE


def test_create_star_schema_tables(spark):
    create_star_schema(spark, db="hdw_test")
    tables = {t.name for t in spark.catalog.listTables("hdw_test")}
    assert {"dim_customer", "dim_supplier", "fact_orders"} <= tables
    # idempotent
    create_star_schema(spark, db="hdw_test")
    spark.sql("DROP DATABASE hdw_test CASCADE")


def test_save_as_table_partitioned_roundtrip(spark):
    from healthcare_data_warehouse_spark.sources.loaders import load_table

    o = load_table(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    save_as_table(o, "orders_part_test", partition_by=["order_year"])
    back = spark.table("orders_part_test")
    assert back.count() == o.count()
    pruned = back.filter(F.col("order_year") == 1997)
    assert pruned.count() > 0
    spark.sql("DROP TABLE orders_part_test")


def test_export_csv(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    path = os.path.join(SCRATCH_DIR, "export_test.csv")
    export_csv(df, path)
    with open(path) as fh:
        lines = fh.read().strip().splitlines()
    assert lines[0] == "k,v" and len(lines) == 3
    os.remove(path)


def test_export_excel_gated(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    path = os.path.join(SCRATCH_DIR, "export_test.xlsx")
    ok = export_excel({"sheet1": df}, path)
    if ok:
        assert os.path.exists(path)
        os.remove(path)
    # when openpyxl is missing the export degrades to a clean False


def test_composed_report_exports(spark, tmp_path):
    from healthcare_data_warehouse_spark.sources.export import (
        export_ml_predictions,
        export_patient_data,
        generate_analytics_report,
    )

    xlsx = str(tmp_path / "report.xlsx")
    ok = generate_analytics_report(spark, SF_SMOKE, xlsx)
    if ok:  # openpyxl present: workbook carries all five sheets
        import openpyxl

        wb = openpyxl.load_workbook(xlsx)
        assert set(wb.sheetnames) == {
            "KPIs", "Age_Groups", "Top_Diagnoses", "Provider_Stats",
            "Monthly_Trends"}

    csv1 = str(tmp_path / "patient.csv")
    export_patient_data(spark, SF_SMOKE, patient_key=7, path=csv1)
    import pandas as pd

    pdf = pd.read_csv(csv1)
    assert len(pdf.columns) > 1  # patient-history projection, not empty

    csv2 = str(tmp_path / "preds.csv")
    export_ml_predictions(spark, SF_SMOKE, csv2, limit=5)
    assert len(pd.read_csv(csv2)) <= 5


def test_export_row_cap_raises_with_clear_message(spark, tmp_path):
    # an accidental full-fact export must fail fast instead of OOMing
    # the driver: the cap collects at most max_rows+1 rows via limit()
    import pytest

    from healthcare_data_warehouse_spark.sources.export import (
        ExportTooLargeError,
        export_csv,
    )

    df = spark.range(100).toDF("k")
    path = str(tmp_path / "capped.csv")
    with pytest.raises(ExportTooLargeError, match="max_rows=10"):
        export_csv(df, path, max_rows=10)
    assert not os.path.exists(path)  # nothing written on refusal

    export_csv(df, path, max_rows=100)  # at-cap result exports fine
    import pandas as pd

    assert len(pd.read_csv(path)) == 100


def test_export_excel_row_cap(spark, tmp_path):
    # openpyxl present: the cap raises per sheet. openpyxl absent: the
    # import gate returns False before any collect (both paths bounded).
    import pytest

    from healthcare_data_warehouse_spark.sources.export import (
        ExportTooLargeError,
        export_excel,
    )

    df = spark.range(50).toDF("k")
    try:
        import openpyxl  # noqa: F401
        have_openpyxl = True
    except ImportError:
        have_openpyxl = False
    if have_openpyxl:
        with pytest.raises(ExportTooLargeError):
            export_excel({"s": df}, str(tmp_path / "capped.xlsx"), max_rows=5)
    else:
        assert export_excel({"s": df}, str(tmp_path / "capped.xlsx"),
                            max_rows=5) is False

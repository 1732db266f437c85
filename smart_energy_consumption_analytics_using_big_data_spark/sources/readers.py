"""Source readers.

Design points vs the reference (SURVEY.md SS2.1):

* S1/S2 - one multi-path ``spark.read.csv`` replaces the reference's
  168-iteration per-file loop + chained union (`data_ingestion.py:87-103`);
  Spark parallelizes file listing and reading natively, and the single
  scan keeps the plan flat (a 168-arm union defeats AQE planning).
* P5 - the ``"Null"`` sentinel is handled by the reader's ``nullValue``
  option instead of a post-hoc ``when(col=="Null", None)`` rewrite
  (`data_preprocessing.py:132-137`), so the column is typed in one pass
  and Parquet/CSV pushdown still applies.
* S5 - tiny dimension tables (the reference's Tariffs.xlsx,
  `data_preprocessing.py:57-64`) enter through pandas -> Arrow ->
  DataFrame; they are dimension-sized by contract, never fact data.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    paths: str | Iterable[str],
    schema: T.StructType,
    null_value: str | None = "Null",
    header: bool = True,
) -> DataFrame:
    """Typed CSV scan over one path, a glob, or a list of paths."""
    reader = spark.read.option("header", header).schema(schema)
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if isinstance(paths, str):
        return reader.csv(paths)
    return reader.csv(list(paths))


def read_csv_audited(
    spark: SparkSession,
    paths: str | Iterable[str],
    schema: T.StructType,
    null_value: str | None = "Null",
    header: bool = True,
) -> DataFrame:
    """CSV scan that CAPTURES malformed rows instead of nulling them
    silently (the default PERMISSIVE mode's failure shape) or killing
    the job (FAILFAST): the returned frame carries a ``_corrupt_record``
    column holding the raw text of every row that failed the typed
    parse. Production ingest splits on it — clean rows continue, the
    corrupt slice lands in a dead-letter sink with full fidelity for
    replay after a fix. Same one-scan cost as read_csv.
    """
    audited = T.StructType(
        schema.fields + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    reader = (
        spark.read.option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(audited)
    )
    if null_value is not None:
        reader = reader.option("nullValue", null_value)
    if isinstance(paths, str):
        return reader.csv(paths)
    return reader.csv(list(paths))


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan (stage boundary format, `data_preprocessing.py:97`)."""
    return spark.read.parquet(path)


def read_jsonl(
    spark: SparkSession,
    paths: str | Iterable[str],
    schema: T.StructType | str,
) -> DataFrame:
    """JSON-lines scan with an explicit schema.

    JSONL is the canonical LLM-corpus interchange format; the explicit
    schema matters twice at 100 TB: it skips Spark's whole-corpus
    inference pre-pass, and it prunes parsing to the requested fields
    (Jackson stops tokenizing unrequested keys). Malformed lines go to
    PERMISSIVE-mode nulls rather than failing the scan - filter
    downstream if the corpus needs strict parsing.
    """
    reader = spark.read.schema(schema)
    if isinstance(paths, str):
        return reader.json(paths)
    return reader.json(list(paths))


def dim_from_pandas(
    spark: SparkSession,
    pdf: pd.DataFrame,
    schema: T.StructType | None = None,
    expected_columns: Iterable[str] | None = None,
) -> DataFrame:
    """Driver-local dimension -> DataFrame (Excel/tariff adapter, S5).

    Validates expected columns like `data_preprocessing.py:75-78`. Only
    for dimension-sized data: the frame is shipped from the driver.
    """
    if expected_columns is not None:
        missing = set(expected_columns) - set(pdf.columns)
        if missing:
            raise ValueError(f"dimension is missing expected columns: {sorted(missing)}")
    if schema is not None:
        return spark.createDataFrame(pdf, schema=schema)
    return spark.createDataFrame(pdf)


def read_excel_dim(
    spark: SparkSession,
    path: str,
    sheet_name: int | str = 0,
    expected_columns: Iterable[str] | None = None,
) -> DataFrame:
    """Excel dimension source (S5; `data_preprocessing.py:57-64`).

    Prefers pandas' engine when available; otherwise falls back to the
    vendored stdlib SpreadsheetML parser (`sources/xlsx.py`), so the
    literal .xlsx path works with zero optional dependencies.
    """
    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name)
    except ImportError:  # no openpyxl in this environment
        from smart_energy_consumption_analytics_using_big_data_spark.sources.xlsx import read_xlsx

        pdf = read_xlsx(path, sheet=sheet_name)
    return dim_from_pandas(spark, pdf, expected_columns=expected_columns)

"""Spark 4 Python DataSource exposing .xlsx as a first-class format:
``spark.read.format("xlsx").load(path_or_glob)``.

This lifts the stdlib SpreadsheetML parser (sources/xlsx.py, the S5
dimension source - ref data_preprocessing.py:57-64) from a
driver-side helper into the engine's source API proper: schema
inference happens once on the driver from the first matching file,
then each file becomes its own InputPartition so a directory of
workbooks parses in parallel on the executors. Dimension workbooks
are small by contract; the parallelism is per-file, which is the
right grain for "a folder of monthly tariff sheets".

Registration is explicit (spark.dataSource.register) - see
sources/readers.read_excel_dim for the non-DataSource path used when
a plain function call is enough.
"""

from __future__ import annotations

import glob as _glob

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _expand(path: str) -> list[str]:
    files = sorted(_glob.glob(path)) if any(ch in path for ch in "*?[") else [path]
    if not files:
        raise FileNotFoundError(f"xlsx source: no files match {path!r}")
    return files


def _pandas_to_spark_type(dtype) -> object:
    import pandas as pd

    if pd.api.types.is_bool_dtype(dtype):
        return BooleanType()
    if pd.api.types.is_integer_dtype(dtype):
        return LongType()
    if pd.api.types.is_float_dtype(dtype):
        return DoubleType()
    return StringType()


class XlsxFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XlsxDataSourceReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.path = options["path"]
        self.sheet = options.get("sheet", 0)

    def partitions(self):
        return [XlsxFilePartition(p) for p in _expand(self.path)]

    def read(self, partition: XlsxFilePartition):
        from smart_energy_consumption_analytics_using_big_data_spark.sources.xlsx import read_xlsx

        pdf = read_xlsx(partition.path, sheet=self.sheet)
        cols = [f.name for f in self.schema_.fields]
        missing = [c for c in cols if c not in pdf.columns]
        if missing:
            raise ValueError(
                f"{partition.path}: columns {missing} absent (schema is "
                "inferred from the first file; all files must agree)"
            )
        for row in pdf[cols].itertuples(index=False, name=None):
            yield tuple(None if v != v else v for v in row)  # NaN -> NULL


class XlsxDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self):
        from smart_energy_consumption_analytics_using_big_data_spark.sources.xlsx import read_xlsx

        first = _expand(self.options["path"])[0]
        pdf = read_xlsx(first, sheet=self.options.get("sheet", 0))
        return StructType(
            [
                StructField(str(c), _pandas_to_spark_type(pdf[c].dtype), True)
                for c in pdf.columns
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return XlsxDataSourceReader(schema, dict(self.options))

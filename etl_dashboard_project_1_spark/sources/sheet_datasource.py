"""Spark 4 Python DataSource for messy spreadsheet ingestion at scale.

Reference parity: /root/reference/src/transform_pipeline.py:23-30 reads a
2-3 sheet workbook eagerly on one machine (``pd.read_excel(dtype=str)``).
At 100 TB the unit of ingestion is a LANDING DIRECTORY of many workbooks;
this module re-expresses the scan as a proper Spark data source:

- ``SheetGridDataSource`` (format ``"sheetgrid"``): one InputPartition per
  (file, sheet) — sheets parse IN EXECUTORS, scaling with the file count.
  Output is the raw all-string cell grid (``file, sheet, row_idx, cells``),
  deliberately schema-free: messy headers are data, not schema, at scan
  time.
- ``grids_to_long``: distributed per-sheet header inference — the existing
  driver-side pandas logic (``excel.infer_header_structure`` +
  ``HeaderCanonicalizer``) runs per sheet group under ``applyInPandas``,
  emitting a LONG (file, sheet, row_id, column, value) table whose schema
  is stable no matter how heterogeneous the sheets are. Pivot downstream
  once a canonical column set is chosen.

Caveat (documented, deliberate): each sheet task builds its own
``HeaderCanonicalizer``, so H7 collision SUFFIXES (``_1``/``_2``) are
per-sheet, not corpus-global — same-named distinct headers in different
sheets both map to their per-sheet suffix. Corpus-global suffixing would
be a second pass over the (tiny) distinct-header set.

Excel engines (openpyxl/xlrd) are absent in this sandbox, so ``.xlsx`` /
``.xls`` parsing is engine-gated exactly like ``excel.read_excel_sheets``;
``.csv`` files (one sheet each) exercise the full partition/parse path.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

GRID_SCHEMA = "file string, sheet int, row_idx bigint, cells array<string>"
LONG_SCHEMA = "file string, sheet int, row_id bigint, column string, value string"


class SheetPartition(InputPartition):
    def __init__(self, path: str, sheet: int):
        self.path = path
        self.sheet = sheet


def _list_sheet_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.rsplit(".", 1)[-1].lower() in ("csv", "xls", "xlsx")
        )
    return [path]


def _read_grid(path: str, sheet: int) -> list[list[str | None]]:
    """Parse one sheet to an all-string grid; blank cells -> None (the
    spreadsheet blank semantic the header inference expects)."""
    ext = path.rsplit(".", 1)[-1].lower()
    if ext == "csv":
        with open(path, newline="", encoding="utf-8") as f:
            return [[c if c != "" else None for c in row] for row in csv.reader(f)]
    try:  # pragma: no cover - needs an Excel engine
        import pandas as pd

        pdf = pd.read_excel(path, sheet_name=sheet, header=None, dtype=str)
        return [[None if pd.isna(c) else str(c) for c in row] for row in pdf.values]
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "no Excel engine (openpyxl/xlrd) in this environment; land "
            "sheets as .csv or install an engine"
        ) from exc


class SheetGridReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sheetgrid requires a 'path' option")
        self.num_sheets = int(options.get("num_sheets", "1"))

    def partitions(self):
        # planning is metadata-only (a directory listing on the driver);
        # cell parsing happens in read() on executors
        parts = []
        for f in _list_sheet_files(self.path):
            sheets = 1 if f.lower().endswith(".csv") else self.num_sheets
            parts.extend(SheetPartition(f, s) for s in range(sheets))
        return parts

    def read(self, partition: SheetPartition):
        name = os.path.basename(partition.path)
        for i, row in enumerate(_read_grid(partition.path, partition.sheet)):
            yield (name, partition.sheet, i, row)


class SheetGridDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sheetgrid"

    def schema(self) -> str:
        return GRID_SCHEMA

    def reader(self, schema) -> SheetGridReader:
        return SheetGridReader(self.options)


def register(spark: SparkSession) -> None:
    """Idempotent format registration (re-registering overwrites)."""
    spark.dataSource.register(SheetGridDataSource)


def read_sheet_grids(spark: SparkSession, path: str, num_sheets: int = 1) -> DataFrame:
    register(spark)
    return (
        spark.read.format("sheetgrid")
        .option("path", path)
        .option("num_sheets", str(num_sheets))
        .load()
    )


def grids_to_long(grids: DataFrame) -> DataFrame:
    """Distributed per-sheet ingestion: header inference + canonical rename
    + body slice per (file, sheet) group, long-format output.

    Mirrors ``excel.ingest_messy_frame`` exactly (same inference, same
    ``first_data_row + 2`` body slice, same duplicate-projection drop) but
    runs where the data is — one Arrow-batched task per sheet.
    """
    import pandas as pd

    def one_sheet(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        from etl_dashboard_project_1_spark.functions.headers import HeaderCanonicalizer
        from etl_dashboard_project_1_spark.sources.excel import (
            canonical_rename_map,
            infer_header_structure,
        )

        pdf = pdf.sort_values("row_idx")
        width = max((len(c) for c in pdf["cells"]), default=0)
        grid = pd.DataFrame(
            [list(c) + [None] * (width - len(c)) for c in pdf["cells"]],
            columns=[f"Unnamed: {i}" for i in range(width)],
        )
        inference = infer_header_structure(grid)
        rename = canonical_rename_map(inference, HeaderCanonicalizer())
        body = grid.iloc[inference.first_data_row + 2 :]
        keep = [c for c in body.columns if c in rename]
        body = body[keep].rename(columns=rename)
        body = body.loc[:, ~body.columns.duplicated()]
        body = body.reset_index(drop=True)
        if body.empty:
            return pd.DataFrame(columns=["file", "sheet", "row_id", "column", "value"])
        long = body.melt(ignore_index=False, var_name="column", value_name="value")
        long["row_id"] = long.index.astype("int64")
        long["file"] = key[0]
        long["sheet"] = key[1]
        return long[["file", "sheet", "row_id", "column", "value"]]

    return grids.groupBy("file", "sheet").applyInPandas(one_sheet, LONG_SCHEMA)

"""Google-Sheets-style small-table source + sink (SURVEY §2.1 S31, §2.2 K3/K4).

Reference semantics (d2b_data/Google_Spreadsheet.py):

- ``read_data_dataframe`` pulls a 2-D values range; the FIRST row becomes
  the header, remaining rows the data, everything a string
  (Google_Spreadsheet.py:33-47).
- ``update``/``append`` push a small DataFrame back as USER_ENTERED
  values (:93-114); ``delete`` clears a range (ALL / ROWS / COLUMNS ×
  VALUES / FORMAT, :49-91).

Spark shape: a sheet is a *small-table edge*, not distributed data — the
read lands as a driver-built DataFrame (broadcast-join candidate), and
the sink takes ``df.limit(n).toPandas()``-scale egress. Large frames are
rejected loudly rather than silently truncated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from d2b_dataframework_spark.sources.rest import rows_to_df

MAX_EGRESS_ROWS = 100_000  # small-result contract; sheets hard-cap is ~10M cells


def values_to_rows(values: list[list]) -> tuple[list[str], list[dict]]:
    """First row = header; short data rows null-fill, long rows truncate
    (the reference relies on pandas doing the same alignment)."""
    if not values:
        return [], []
    header = [str(h) for h in values[0]]
    rows = []
    for raw in values[1:]:
        padded = [*raw, *([None] * (len(header) - len(raw)))][: len(header)]
        rows.append({h: (None if v is None else str(v)) for h, v in zip(header, padded)})
    return header, rows


def read_range(
    spark: SparkSession, transport, spreadsheet_id: str, range_name: str
) -> DataFrame:
    """S31: values().get → header + all-string columns
    (Google_Spreadsheet.py:33-47)."""
    payload = transport.get(f"spreadsheets/{spreadsheet_id}/values/{range_name}")
    header, rows = values_to_rows(payload.get("values", []))
    schema = StructType([StructField(h, StringType()) for h in header])
    return rows_to_df(spark, rows, schema)


def _df_to_values(df: DataFrame, max_rows: int) -> list[list]:
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"sheets egress exceeds {max_rows} rows; aggregate before writing"
        )
    values = [[str(c) for c in pdf.columns]]
    for tup in pdf.itertuples(index=False):
        values.append(["" if v is None else str(v) for v in tup])
    return values


def update_range(
    transport, df: DataFrame, spreadsheet_id: str, range_name: str,
    max_rows: int = MAX_EGRESS_ROWS,
) -> dict:
    """K3: values().update with USER_ENTERED (Google_Spreadsheet.py:93-103)."""
    return transport.post(
        f"spreadsheets/{spreadsheet_id}/values/{range_name}:update",
        {"valueInputOption": "USER_ENTERED", "values": _df_to_values(df, max_rows)},
    )


def append_range(
    transport, df: DataFrame, spreadsheet_id: str, range_name: str,
    max_rows: int = MAX_EGRESS_ROWS,
) -> dict:
    """K3: values().append with USER_ENTERED (Google_Spreadsheet.py:105-114).
    Appends data rows only (no header re-send)."""
    values = _df_to_values(df, max_rows)[1:]
    return transport.post(
        f"spreadsheets/{spreadsheet_id}/values/{range_name}:append",
        {"valueInputOption": "USER_ENTERED", "values": values},
    )


def delete_range(
    transport, spreadsheet_id: str, sheet_id: int,
    dimension: str = "ALL", fields: str = "VALUES",
    start: int | None = None, end: int | None = None,
) -> dict:
    """K4: updateCells clear over ALL/ROWS/COLUMNS × VALUES/FORMAT
    (Google_Spreadsheet.py:49-91)."""
    if dimension not in {"ALL", "ROWS", "COLUMNS"}:
        raise ValueError(f"dimension must be ALL|ROWS|COLUMNS, got {dimension}")
    if fields not in {"VALUES", "FORMAT", "ALL"}:
        raise ValueError(f"fields must be VALUES|FORMAT|ALL, got {fields}")
    grid: dict = {"sheetId": sheet_id}
    if dimension == "ROWS" and start is not None:
        grid.update({"startRowIndex": start, "endRowIndex": end})
    if dimension == "COLUMNS" and start is not None:
        grid.update({"startColumnIndex": start, "endColumnIndex": end})
    field_spec = {"VALUES": "userEnteredValue", "FORMAT": "userEnteredFormat", "ALL": "*"}
    return transport.post(
        f"spreadsheets/{spreadsheet_id}:batchUpdate",
        {"requests": [{"updateCells": {"range": grid, "fields": field_spec[fields]}}]},
    )

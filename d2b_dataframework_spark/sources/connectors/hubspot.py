"""HubSpot CRM objects source (SURVEY §2.1 S24).

Reference semantics (d2b_data/HubSpot_Api.py):

- ``call_api(method, endpoint, params, json_data)``: generic REST
  primitive; errors → ``{}`` (:34-57).
- ``to_dataframe``: flatten each object's ``properties`` dict into
  columns next to the top-level scalars; ``id`` renamed
  ``hs_object_id`` (:74-102).

Spark shape: properties are a dynamic key set (SURVEY §7.5.3) — the
union of keys across the page defines the schema (pandas does the same
alignment implicitly); all property values land as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from d2b_dataframework_spark.sources.rest import rows_to_df


def call_api(transport, method: str, endpoint: str, params: dict | None = None,
             json_data: dict | None = None) -> dict:
    """S24: generic call; failures → {} (HubSpot_Api.py:34-57)."""
    try:
        if method.upper() == "GET":
            return transport.get(endpoint, params)
        return transport.post(endpoint, json_data or params)
    except Exception:  # noqa: BLE001 — reference swallows and returns {}
        return {}


def flatten_objects(payload: dict) -> tuple[list[str], list[dict]]:
    """Properties-dict flattening (HubSpot_Api.py:74-102): top-level
    scalars + union of property keys; id → hs_object_id."""
    results = payload.get("results", [])
    prop_keys = sorted({k for r in results for k in (r.get("properties") or {})})
    rows = []
    for r in results:
        props = r.get("properties") or {}
        rows.append(
            {
                "hs_object_id": str(r.get("id")) if r.get("id") is not None else None,
                "createdAt": r.get("createdAt"),
                "updatedAt": r.get("updatedAt"),
                "archived": bool(r.get("archived", False)),
                **{k: (None if props.get(k) is None else str(props.get(k))) for k in prop_keys},
            }
        )
    return prop_keys, rows


def read_objects(
    spark: SparkSession, transport, object_type: str, params: dict | None = None
) -> DataFrame:
    """CRM v3 object list → flattened DataFrame."""
    payload = call_api(transport, "GET", f"crm/v3/objects/{object_type}", params)
    prop_keys, rows = flatten_objects(payload)
    schema = StructType(
        [
            StructField("hs_object_id", StringType()),
            StructField("createdAt", StringType()),
            StructField("updatedAt", StringType()),
            StructField("archived", BooleanType()),
        ]
        + [StructField(k, StringType()) for k in prop_keys]
    )
    return rows_to_df(spark, rows, schema)

"""Shopify orders/refunds source (SURVEY §2.1 S22/S23, §2.7 F13/F14, §2.3
P11).

Reference semantics (d2b_data/shopify_api.py):

- ``get_orders``: ``/orders.json`` with a ``created_at`` range,
  ``order=created_at asc``, ``limit ≤ 250``; RFC-5988 ``Link: next``
  pagination (:30-95, Link :85-94) → pagination.link_pages.
- ``get_refunds`` / ``get_partially_refundeds``: same scan with
  ``financial_status=refunded|partially_refunded`` over an ``updated_at``
  range, keeping only orders with non-empty ``refunds`` (P11,
  :205-270, :273-338, filter :253-257,321-325).
- ``orders_to_dataframe`` (:98-186): per-order financial derivations —
  returns = Σ(subtotal + total_tax) over refund line items, shipping
  refund = |Σ shipping_refund adjustments|, net/total/custom_total math
  (F13, :113-156); nested money access with defaults (F14, :135-142).
  Money stays DOUBLE to match the reference's float math (SURVEY §7.5.2).

Spark shape: the Link walk is serial on the driver (next URL comes from
the response); the financial math runs distributed as column expressions
(functions.money) including the refund higher-order aggregation — no
Python in the hot path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from d2b_dataframework_spark.functions.money import order_financials, refund_totals
from d2b_dataframework_spark.sources.pagination import link_pages
from d2b_dataframework_spark.sources.rest import rows_to_df

PAGE_LIMIT = 250  # shopify_api.py:41

REFUND_TYPE = ArrayType(
    StructType(
        [
            StructField(
                "refund_line_items",
                ArrayType(
                    StructType(
                        [
                            StructField("subtotal", DoubleType()),
                            StructField("total_tax", DoubleType()),
                        ]
                    )
                ),
            ),
            StructField(
                "order_adjustments",
                ArrayType(
                    StructType(
                        [
                            StructField("amount", DoubleType()),
                            StructField("kind", StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
)

RAW_SCHEMA = StructType(
    [
        StructField("order_id", LongType()),
        StructField("order_number", LongType()),
        StructField("created_at", StringType()),
        StructField("closed_at", StringType()),
        StructField("fulfillment_status", StringType()),
        StructField("financial_status", StringType()),
        StructField("currency", StringType()),
        StructField("customer_email", StringType()),
        StructField("cancel_reason", StringType()),
        StructField("total_price", DoubleType()),
        StructField("subtotal_price", DoubleType()),
        StructField("total_discounts", DoubleType()),
        StructField("total_tax", DoubleType()),
        StructField("shipping_amount", DoubleType()),
        StructField("duties_amount", DoubleType()),
        StructField("fees_amount", DoubleType()),
        StructField("refunds_json", StringType()),  # parsed to REFUND_TYPE later
    ]
)


def _money(d: dict, *path, default=0.0) -> float:
    """F14: order.get(a,{}).get(b,{}).get(c, 0) nested access
    (shopify_api.py:135-142)."""
    cur = d
    for p in path:
        if not isinstance(cur, dict):
            return default
        cur = cur.get(p, default if p == path[-1] else {})
    try:
        return float(cur)
    except (TypeError, ValueError):
        return default


def flatten_order(order: dict) -> dict:
    return {
        "order_id": order.get("id"),
        "order_number": order.get("order_number"),
        "created_at": order.get("created_at"),
        "closed_at": order.get("closed_at"),
        "fulfillment_status": order.get("fulfillment_status"),
        "financial_status": order.get("financial_status"),
        "currency": order.get("currency"),
        "customer_email": order.get("email"),
        "cancel_reason": order.get("cancel_reason"),
        "total_price": _money(order, "total_price"),
        "subtotal_price": _money(order, "subtotal_price"),
        "total_discounts": _money(order, "total_discounts"),
        "total_tax": _money(order, "total_tax"),
        "shipping_amount": _money(
            order, "total_shipping_price_set", "shop_money", "amount"
        ),
        "duties_amount": _money(order, "current_total_duties_set", "shop_money", "amount"),
        "fees_amount": _money(order, "current_total_additional_fees_set", "shop_money", "amount"),
        "refunds_json": json.dumps(order.get("refunds", [])),
    }


def _walk_orders(transport, params: dict) -> list[dict]:
    """S22: Link-header walk, serial on the driver (shopify_api.py:85-94)."""

    def fetch(next_url):
        if next_url is None:
            payload = transport.get("orders.json", params)
        else:
            payload = transport.get(next_url, None)
        rows = payload.get("orders", [])
        return rows, payload.get("link_next")

    out: list[dict] = []
    for batch in link_pages(fetch):
        out.extend(batch)
    return out


def read_orders(
    spark: SparkSession,
    transport,
    date_start: str,
    date_end: str,
    status: str = "any",
    limit: int = PAGE_LIMIT,
) -> DataFrame:
    """S22 scan + distributed F13/F14 financial derivations."""
    params = {
        "created_at_min": date_start,
        "created_at_max": date_end,
        "status": status,
        "limit": min(limit, PAGE_LIMIT),
        "order": "created_at asc",
    }
    raw = rows_to_df(
        spark, [flatten_order(o) for o in _walk_orders(transport, params)], RAW_SCHEMA
    )
    return derive_financials(raw)


def read_refunds(
    spark: SparkSession,
    transport,
    date_start: str,
    date_end: str,
    financial_status: str = "refunded",
    limit: int = PAGE_LIMIT,
) -> DataFrame:
    """S23: refund scan over updated_at range; keep only orders with
    refunds (P11 — F.size > 0, shopify_api.py:253-257,321-325)."""
    params = {
        "updated_at_min": date_start,
        "updated_at_max": date_end,
        "financial_status": financial_status,
        "status": "any",
        "limit": min(limit, PAGE_LIMIT),
    }
    raw = rows_to_df(
        spark, [flatten_order(o) for o in _walk_orders(transport, params)], RAW_SCHEMA
    )
    raw = raw.withColumn("refunds", F.from_json("refunds_json", REFUND_TYPE))
    return derive_financials(
        raw.filter(F.size("refunds") > 0).drop("refunds")
    )


def derive_financials(raw: DataFrame) -> DataFrame:
    """F13: the reference's order financial formulas as column
    expressions (shopify_api.py:113-156) — runs in whole-stage codegen."""
    df = raw.withColumn("refunds", F.from_json("refunds_json", REFUND_TYPE))
    returns, shipping_refund = refund_totals("refunds")
    df = df.withColumns(
        {
            "gross_sales": F.col("subtotal_price") + F.col("total_discounts"),
            "discounts": F.col("total_discounts"),
            "returns": returns,
            "shipping_charges": F.col("shipping_amount") - shipping_refund,
            "duties": F.col("duties_amount"),
            "additional_fees": F.col("fees_amount"),
            "taxes": F.col("total_tax"),
        }
    )
    df = order_financials(df)
    return df.drop("refunds", "refunds_json")

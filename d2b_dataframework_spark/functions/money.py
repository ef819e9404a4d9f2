"""Financial derivations (SURVEY §2.7 F13), Shopify-style.

The reference computes order financials with per-order float math
(d2b_data/shopify_api.py:98-186). We reproduce the formulas as column
expressions. For exactness at scale (and bit-stable aggregation results),
helpers accept a ``decimal`` flag that routes arithmetic through
DecimalType — double sums are order-dependent across partitions, decimal
sums are exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MONEY_DECIMAL = "decimal(18,4)"


def money(col: Column | str, decimal: bool = False) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY_DECIMAL) if decimal else c.cast("double")


def order_financials(
    df: DataFrame,
    gross: str = "gross_sales",
    discounts: str = "discounts",
    returns: str = "returns",
    shipping: str = "shipping_charges",
    duties: str = "duties",
    fees: str = "additional_fees",
    taxes: str = "taxes",
    decimal: bool = False,
) -> DataFrame:
    """Shopify financial rollup (d2b_data/shopify_api.py:113-156):

    - ``net_sales  = gross - discounts - returns``
    - ``total_sales = net_sales + shipping + duties + fees + taxes``
    - ``custom_total_sales = total_sales - returns``
    """
    g, d, r = money(gross, decimal), money(discounts, decimal), money(returns, decimal)
    net = g - d - r
    total = net + money(shipping, decimal) + money(duties, decimal) + money(fees, decimal) + money(taxes, decimal)
    return df.withColumns(
        {
            "net_sales": net,
            "total_sales": total,
            "custom_total_sales": total - r,
        }
    )


def refund_totals(refunds: Column | str) -> tuple[Column, Column]:
    """From ``refunds array<struct<refund_line_items array<struct<subtotal,
    total_tax>>, order_adjustments array<struct<amount,kind>>>>`` compute

    - returns  = Σ (subtotal + total_tax) over all refund line items
    - shipping_refund = |Σ shipping_refund adjustments|

    (d2b_data/shopify_api.py:108-127,144-145) — pure higher-order
    aggregation, no UDF, so it runs inside whole-stage codegen.
    """
    c = F.col(refunds) if isinstance(refunds, str) else refunds
    line_items = F.flatten(F.transform(c, lambda r: r["refund_line_items"]))
    returns = F.aggregate(
        line_items,
        F.lit(0.0),
        lambda acc, li: acc + F.coalesce(li["subtotal"], F.lit(0.0)) + F.coalesce(li["total_tax"], F.lit(0.0)),
    )
    adjustments = F.flatten(F.transform(c, lambda r: r["order_adjustments"]))
    shipping = F.abs(
        F.aggregate(
            F.filter(adjustments, lambda a: a["kind"] == F.lit("shipping_refund")),
            F.lit(0.0),
            lambda acc, a: acc + F.coalesce(a["amount"], F.lit(0.0)),
        )
    )
    return returns, shipping

"""Tiered label assignment — the reference's pandas mask-overwrite chains
re-expressed as ordered `when` chains (order matters; SURVEY.md §2.5 C1/C4/
C6/C7 derive the effective precedence from the pandas overwrite order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def customer_segment(spent: Column, orders: Column, p80_spent: Column, p60_spent: Column, p80_orders: Column) -> Column:
    """Gold/Silver/Bronze (reference batch_processor.py:113-128).

    Gold iff spent>=p80 AND orders>=p80; Silver iff (spent>=p60 OR
    orders>=p80) and not Gold — note Silver reuses the ORDERS P80 threshold
    (reference quirk, preserved).
    """
    gold = (spent >= p80_spent) & (orders >= p80_orders)
    silver = (spent >= p60_spent) | (orders >= p80_orders)
    return F.when(gold, "Gold").when(silver, "Silver").otherwise("Bronze")


def recency_status(days_since: Column) -> Column:
    """Inactive / Active(<=30d) / Very Active(<=7d), later-rule-overwrites
    (reference batch_processor.py:140-142)."""
    return (
        F.when(days_since <= 7, "Very Active")
        .when(days_since <= 30, "Active")
        .otherwise("Inactive")
    )


def performance_category(revenue: Column, turnover: Column, p80_revenue: Column, p80_turnover: Column) -> Column:
    """Low Performer / High Revenue / Fast Moving / Star — pandas overwrite
    order revenue→turnover→both means Star wins, then Fast Moving, then High
    Revenue (reference batch_processor.py:157-167)."""
    return (
        F.when((revenue >= p80_revenue) & (turnover >= p80_turnover), "Star")
        .when(turnover >= p80_turnover, "Fast Moving")
        .when(revenue >= p80_revenue, "High Revenue")
        .otherwise("Low Performer")
    )


def stock_status(qty: Column, low: int = 10, overstock: int = 500) -> Column:
    """Normal / Low / Out / Overstock — pandas overwrite order low→out→
    overstock means Overstock wins last (reference batch_processor.py:170-173)."""
    return (
        F.when(qty >= overstock, "Overstock")
        .when(qty <= 0, "Out of Stock")
        .when(qty <= low, "Low Stock")
        .otherwise("Normal")
    )


def alert_severity(alert_type: Column) -> Column:
    """Alert type → severity, default MEDIUM (reference
    stream_processor.py:313-321)."""
    return (
        F.when(alert_type == "high_value_order", "HIGH")
        .when(alert_type == "bulk_orders", "MEDIUM")
        .when(alert_type == "rapid_stock_depletion", "HIGH")
        .when(alert_type == "geographic_concentration", "LOW")
        .otherwise("MEDIUM")
    )

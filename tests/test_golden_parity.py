"""Byte-parity replay of the reference's golden result CSVs.

See `plans/olist_replay.py` for why these four goldens are exactly
replayable from their own published grain. Each test ingests the
golden's detail rows as the fixture, reruns the reference query shape
through this engine, and compares every value — label strings, NULL
display, decimal digit strings — byte-for-byte.

Row order: goldens were exported with the reference DB's locale
collation for text ties (e.g. 'furniture decor' vs 'furnituredecor'
compare differently than bytewise), which is exporter configuration,
not query semantics — so rows are compared under a canonical sort
computed identically on both sides. 1A and 3B have collation-free
total orders (year/month, day) and are also compared IN golden order.
"""

from __future__ import annotations

import csv
import os
from decimal import Decimal

import pytest

from business_intelligence_and_data_warehouse_spark.plans.olist_replay import (
    LABEL_ALL_CATS,
    LABEL_CAT_SUBTOTAL,
    LABEL_GRAND,
    LABEL_GRAND_2B,
    LABEL_MONTHLY,
    LABEL_UNCAT,
    LABEL_YEARLY,
    TOTAL_LABELS_2A,
    replay_1a,
    replay_2a,
    replay_2b,
    replay_3b,
)

GOLDEN_DIR = "/root/reference/Database/Results from Task 2A Analytical Queries"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN_DIR), reason="reference goldens not present"
)


def golden(name: str) -> list[list[str]]:
    with open(os.path.join(GOLDEN_DIR, name), newline="") as fh:
        rows = list(csv.reader(fh))
    return rows[1:]  # drop header


def fmt(v) -> str:
    """Render a value the way the golden CSV does (modulo quoting,
    which is exporter config): decimals keep their scale, NULL is the
    literal NULL."""
    if v is None:
        return "NULL"
    if isinstance(v, Decimal):
        return str(v)
    return str(v)


G2A = "2A. Drill-down and Roll-up Operations multi-level aggregation queries.csv"
G2B = "2B.Drill-down and Roll-up Operations Hierarchical dimension analysis.csv"
G1A = "1A.Time based Trend Analysis Year over year growth analysis.csv"
G3B = "3B. Advanced Window Functions moving averages and cumulative measures.CSV"


def detail_2a(spark):
    """Golden 2A detail rows as the fact fixture (Uncategorized label
    maps back to NULL category — the reference's COALESCE direction)."""
    detail = [
        (
            int(y),
            int(m),
            None if c == LABEL_UNCAT else c,
            Decimal(rev),
        )
        for y, m, c, rev in golden(G2A)
        if c not in TOTAL_LABELS_2A
    ]
    return spark.createDataFrame(
        detail, "year int, month int, category string, revenue decimal(18,2)"
    )


def canon_2a_key(year, month, label):
    g_year, g_month, g_cat = {
        LABEL_GRAND: (1, 1, 1),
        LABEL_YEARLY: (0, 1, 1),
        LABEL_MONTHLY: (0, 0, 1),
    }.get(label, (0, 0, 0))
    return (
        g_year,
        int(year) if year != "NULL" else -1,
        g_month,
        int(month) if month != "NULL" else -1,
        g_cat,
        label,
    )


def test_golden_2a_grouping_sets_byte_parity(spark):
    out = replay_2a(detail_2a(spark)).collect()
    ours = sorted(
        (
            [fmt(r.year), fmt(r.month), r.category_label, fmt(r.revenue)]
            for r in out
        ),
        key=lambda r: canon_2a_key(r[0], r[1], r[2]),
    )
    gold = sorted(golden(G2A), key=lambda r: canon_2a_key(r[0], r[1], r[2]))
    assert len(ours) == len(gold) == 1311
    for mine, theirs in zip(ours, gold):
        assert mine == theirs, (mine, theirs)


def test_golden_2b_rollup_byte_parity(spark):
    detail = [
        (
            None if c == LABEL_UNCAT else c,
            p,
            Decimal(rev),
        )
        for c, p, rev in golden(G2B)
        if p not in (LABEL_CAT_SUBTOTAL, LABEL_GRAND_2B)
    ]
    df = spark.createDataFrame(
        detail, "category string, product_id string, revenue decimal(18,2)"
    )
    out = replay_2b(df).collect()

    def key(cat, prod):
        g_cat = 1 if cat == LABEL_ALL_CATS else 0
        g_prod = 1 if prod in (LABEL_CAT_SUBTOTAL, LABEL_GRAND_2B) else 0
        # NULL-category details display as Uncategorized and sort after
        # named categories (Postgres NULLS LAST on the raw column)
        cat_rank = 1 if cat == LABEL_UNCAT else 0
        return (g_cat, cat_rank, cat, g_prod, prod)

    ours = sorted(
        ([r.category, r.product_or_total, fmt(r.revenue)] for r in out),
        key=lambda r: key(r[0], r[1]),
    )
    gold = sorted(golden(G2B), key=lambda r: key(r[0], r[1]))
    assert len(ours) == len(gold)
    for mine, theirs in zip(ours, gold):
        assert mine == theirs, (mine, theirs)


def test_golden_1a_yoy_byte_parity(spark):
    out = replay_1a(detail_2a(spark)).collect()
    ours = [
        [
            fmt(r.year),
            fmt(r.month),
            r.month_name,
            fmt(r.revenue),
            fmt(r.last_year_revenue),
            fmt(r.yoy_growth_pct),
        ]
        for r in out
    ]
    gold = golden(G1A)
    assert len(ours) == len(gold) == 24
    # collation-free total order (year, month): compare IN ORDER
    for mine, theirs in zip(ours, gold):
        assert mine == theirs, (mine, theirs)


def test_golden_3b_windows_byte_parity(spark):
    daily = [(d, Decimal(rev)) for d, rev, _ma, _ytd in golden(G3B)]
    df = spark.createDataFrame(daily, "day string, revenue decimal(18,2)")
    df = df.select(df.day.cast("date").alias("day"), "revenue")
    out = replay_3b(df).collect()
    ours = [
        [fmt(r.day), fmt(r.revenue), fmt(r.moving_avg_7d), fmt(r.year_to_date_revenue)]
        for r in out
    ]
    gold = golden(G3B)
    assert len(ours) == len(gold) == 616
    for mine, theirs in zip(ours, gold):
        assert mine == theirs, (mine, theirs)


def test_golden_5b_internal_kpi_consistency():
    """5B's input grain isn't published, so it can't be replayed — but
    its KPI columns constrain each other arithmetically (reference SQL
    `TASK 2A SQL Analytical Queries.sql:253-293`): the on-time rate is
    round(100*k/m, 2) for integer on-time/known-delivery counts
    k <= m <= orders; a 100.00 rate forces k == m, which forces the
    late-only delay average to be NULL; and the delay average is a
    mean of integer day-counts over <= orders rows, so some
    denominator d <= orders makes it integral."""
    from fractions import Fraction

    rows = golden(
        "5B. Business Intelligence Metrics Performance KPI calculations "
        "specific to your domain.CSV"
    )
    assert len(rows) == 24
    for year, month, orders, _aov, rate_s, delay_s, _rev in rows:
        n = int(orders)
        if rate_s == "NULL":
            # no known deliveries at all -> no late rows either
            assert delay_s == "NULL", (year, month)
            continue
        rate = Decimal(rate_s)
        assert Decimal("0") <= rate <= Decimal("100"), (year, month)
        # rate must be a 2-dp rounding of k/m for integers k<=m<=n
        feasible = any(
            abs(Fraction(100 * k, m) - Fraction(rate)) <= Fraction(1, 200)
            for m in range(1, n + 1)
            for k in range(0, m + 1)
        ) if n <= 400 else True  # cap the O(n^2) scan on big months
        assert feasible, (year, month, rate_s)
        if rate == Decimal("100") and n <= 400:
            # all known deliveries on time -> no late rows -> NULL avg
            assert delay_s == "NULL", (year, month, delay_s)
        if delay_s != "NULL":
            # the CSV prints 16 decimal digits of the exact rational
            # sum(delays)/late_count; recover the small-denominator
            # rational (late_count <= n) and require it to round back
            # within half an ulp of the printed value
            delay = Fraction(Decimal(delay_s))
            best = delay.limit_denominator(n)
            assert best.denominator <= n and abs(best - delay) <= Fraction(
                1, 10**15
            ), (year, month, delay_s)


def test_golden_1b_seasonal_index_consistency():
    """1B publishes its own numerator and denominator: seasonal_index
    must equal round(avg_rev_month / avg_rev_overall, 3) (Postgres
    numeric round = half-up), and the overall average must be one
    constant across all 12 rows."""
    from decimal import ROUND_HALF_UP

    rows = golden(
        "1B.Time-based Trend Analysis seasonal pattern identification.csv"
    )
    assert len(rows) == 12
    overall = {r[3] for r in rows}
    assert len(overall) == 1, overall
    for _m, _name, m_avg, o_avg, idx in rows:
        got = (Decimal(m_avg) / Decimal(o_avg)).quantize(
            Decimal("0.001"), rounding=ROUND_HALF_UP
        )
        assert str(got) == idx, (m_avg, o_avg, idx, got)


def test_golden_4b_rows_above_category_average():
    """4B's defining predicate is recomputable from its own columns:
    every emitted product's average price must exceed its category's
    average price."""
    rows = golden(
        "4B. Complex Filtering and Subqueries correlated subqueries "
        "for comparative analysis.CSV"
    )
    assert rows
    for _pid, _cat, p_avg, c_avg in rows:
        assert Decimal(p_avg) > Decimal(c_avg), (_pid, p_avg, c_avg)


def test_golden_5a_receipt_value_consistency():
    """5A computes avg_receipt_value = AVG over PAYMENT rows while
    orders counts DISTINCT order ids (reference SQL `TASK 2A SQL
    Analytical Queries.sql:241-251`), so installments make the
    receipt denominator >= orders. The recomputable invariant: some
    integer payment count p >= orders satisfies
    round(ltv_revenue / p, 2) == avg_receipt_value."""
    from decimal import ROUND_HALF_UP

    rows = golden(
        "5A. Business Intelligence Metrics CustomerProduct "
        "profitability analysis.CSV"
    )
    assert len(rows) == 20  # top-20 by LTV
    for _cid, _state, ltv, orders, receipt in rows:
        n = int(orders)
        assert n > 0
        p = int(round(Decimal(ltv) / Decimal(receipt)))
        got = (Decimal(ltv) / p).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
        assert p >= n and str(got) == receipt, (
            _cid, ltv, orders, receipt, p, got,
        )

"""Round-12 second batch: properties the DuckDB oracle sweep
(test_queries.py) can't express — scipy/sklearn-grade cross-checks of
the rank statistics and the closed-form power math."""

import math

import pyspark.sql.functions as F

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.auc import auc_separation_report
from cdc_stream_batch_etl_spark.operators.mwu import Z_ALPHA, mann_whitney_drift
from cdc_stream_batch_etl_spark.operators.power import (
    MDE_PCTS,
    Z_BETA,
    ab_power_planner,
)

registry.load_all()


# --------------------------------------------------------------- mann-whitney


def test_mwu_matches_direct_rank_computation(spark, sf_dir):
    """One event_type's U and z re-derived in plain Python with midranks
    and the tie-corrected variance; split totals are preserved."""
    events = load_table(spark, sf_dir, "events")
    rows = {r.event_type: r for r in mann_whitney_drift(spark, sf_dir).collect()}
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    probe = sorted(rows)[0]
    raw = (
        events.filter(F.col("event_type") == probe)
        .select(F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    early = sorted(int(math.floor(x.value * 100)) for x in raw if 2 * x.us <= lo + hi)
    late = sorted(int(math.floor(x.value * 100)) for x in raw if 2 * x.us > lo + hi)
    pooled = sorted(early + late)
    # midranks over the pooled grid
    rank_of = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        rank_of[pooled[i]] = (i + 1 + j) / 2  # average of ranks i+1..j
        i = j
    ra = sum(rank_of[v] for v in early)
    na, nb = len(early), len(late)
    u = ra - na * (na + 1) / 2
    n = na + nb
    from collections import Counter

    tsum = sum(t**3 - t for t in Counter(pooled).values())
    var = (na * nb / 12.0) * ((n + 1) - tsum / (n * (n - 1.0)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    r = rows[probe]
    assert (r.n_early, r.n_late) == (na, nb)
    assert abs(r.u_stat - u) < 1e-9
    assert abs(r.z - z) < 1e-9
    assert r.drifted == (1 if abs(z) > Z_ALPHA else 0)


def test_mwu_u_plus_u_prime_identity(spark, sf_dir):
    """U_early + U_late = na·nb for every type (the defining identity:
    every cross pair contributes exactly 1 counting ties as ½+½), which
    pins both the midrank handling and the totals."""
    events = load_table(spark, sf_dir, "events")
    rows = {r.event_type: r for r in mann_whitney_drift(spark, sf_dir).collect()}
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    for t, r in rows.items():
        raw = (
            events.filter(F.col("event_type") == t)
            .select(F.unix_micros("ts").alias("us"), "value")
            .collect()
        )
        early = [int(math.floor(x.value * 100)) for x in raw if 2 * x.us <= lo + hi]
        late = [int(math.floor(x.value * 100)) for x in raw if 2 * x.us > lo + hi]
        u_direct = sum(
            1.0 if a > b_ else 0.5 if a == b_ else 0.0 for a in early for b_ in late
        )
        assert abs(r.u_stat - u_direct) < 1e-9
        assert 0 <= r.u_stat <= r.n_early * r.n_late


# ------------------------------------------------------------------------ auc


def test_auc_matches_pairwise_probability(spark, sf_dir):
    """AUC re-derived as the literal pairwise win probability (ties ½)
    for every type, and the rank-sum weighted mean of AUC is ½."""
    events = load_table(spark, sf_dir, "events")
    vals = [
        (r.event_type, int(math.floor(r.value * 100)))
        for r in events.select("event_type", "value").collect()
    ]
    rows = {r.event_type: r for r in auc_separation_report(spark, sf_dir).collect()}
    assert set(rows) == {t for t, _ in vals}
    import numpy as np

    by_type = {}
    for t, g in vals:
        by_type.setdefault(t, []).append(g)
    all_g = np.array(sorted(g for _, g in vals))
    for t, r in rows.items():
        pos = np.sort(np.array(by_type[t]))
        n, total = len(pos), len(all_g)
        # wins vs the REST = wins vs all − wins vs same type
        lt_all = np.searchsorted(all_g, pos, side="left").sum()
        eq_all = (
            np.searchsorted(all_g, pos, side="right")
            - np.searchsorted(all_g, pos, side="left")
        ).sum()
        lt_self = np.searchsorted(pos, pos, side="left").sum()
        eq_self = (
            np.searchsorted(pos, pos, side="right")
            - np.searchsorted(pos, pos, side="left")
        ).sum()
        wins = (lt_all - lt_self) + 0.5 * (eq_all - eq_self)
        auc = wins / (n * (total - n))
        assert r.n_events == n
        assert abs(r.auc - auc) < 1e-12, t
        assert abs(r.gini_separation - (2 * auc - 1)) < 1e-12
    # Σ n_t (N−n_t) AUC_t counts every cross-type pair once from each
    # side: the two directions sum to 1, so the weighted mean is ½.
    total = sum(r.n_events for r in rows.values())
    num = sum(r.n_events * (total - r.n_events) * r.auc for r in rows.values())
    den = sum(r.n_events * (total - r.n_events) for r in rows.values())
    assert abs(num / den - 0.5) < 1e-12


# ---------------------------------------------------------------------- power


def test_power_planner_formula_and_monotonicity(spark, sf_dir):
    """n_per_arm re-derived from the Fleiss formula on the collected
    reach rates; larger MDE ⇒ smaller n (monotone in the grid); a
    simulated-power sanity bound via the normal approximation."""
    events = load_table(spark, sf_dir, "events")
    rows = list(ab_power_planner(spark, sf_dir).collect())
    u = events.select("user_id").distinct().count()
    reach = {
        r.event_type: r.n
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {(r.event_type, r.mde_pct) for r in rows} == {
        (t, m) for t in reach for m in MDE_PCTS
    }
    by_type = {}
    for r in rows:
        assert r.baseline_users == reach[r.event_type]
        p1 = reach[r.event_type] / u
        assert abs(r.p1 - p1) < 1e-15
        p2 = min(p1 * (1 + r.mde_pct / 100.0), 1.0)
        assert abs(r.p2 - p2) < 1e-15
        if p2 > p1:
            pbar = (p1 + p2) / 2
            s = Z_ALPHA * math.sqrt(2 * pbar * (1 - pbar)) + Z_BETA * math.sqrt(
                p1 * (1 - p1) + p2 * (1 - p2)
            )
            n = math.ceil(s * s / ((p2 - p1) * (p2 - p1)))
            assert r.n_per_arm == n
            # at the planned n, the z-test's expected statistic clears
            # the alpha boundary with z_beta to spare (power ≈ 0.80)
            se = math.sqrt((p1 * (1 - p1) + p2 * (1 - p2)) / n)
            assert (p2 - p1) / se >= Z_ALPHA + Z_BETA - 0.05
        by_type.setdefault(r.event_type, []).append((r.mde_pct, r.n_per_arm))
    for t, pairs in by_type.items():
        ns = [n for _, n in sorted(pairs) if n is not None]
        assert ns == sorted(ns, reverse=True), t

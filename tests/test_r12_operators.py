"""Round-12 operators: properties the DuckDB oracle sweep
(test_queries.py) can't express — plan-level pruning claims and
algebraic invariants."""

import pyspark.sql.functions as F

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.dedup import shingles_col
from cdc_stream_batch_etl_spark.dedup.prefixjoin import (
    T_DEN,
    T_NUM,
    prefix_filter_jaccard_pairs,
)
from cdc_stream_batch_etl_spark.operators.gkfold import K_FOLDS, group_kfold_assignment
from cdc_stream_batch_etl_spark.operators.rollingdau import (
    WINDOW_DAYS,
    rolling_distinct_users,
)

registry.load_all()


# ---------------------------------------------------------------- prefix join


def test_prefix_join_equals_quadratic_yardstick(spark, sf_dir):
    """The whole point: the prefix-filtered plan returns EXACTLY the
    pairs the full shingle self-join (ngram_jaccard_pairs) returns —
    exactness is not traded for the pruning (τ matches: both 0.5)."""
    fast = {
        (r.doc_a, r.doc_b): (r.shared, round(r.jaccard, 12))
        for r in prefix_filter_jaccard_pairs(spark, sf_dir).collect()
    }
    slow = {
        (r.doc_a, r.doc_b): (r.shared, round(r.jaccard, 12))
        for r in registry.QUERIES["ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    assert fast == slow


def test_prefix_pruning_joins_fewer_tokens(spark, sf_dir):
    """The candidate join must run on substantially fewer rows than the
    full token explode — at τ=0.5 the prefix is ~n/2 tokens, and it is
    the RARE half (stop-shingles sort last and never enter the join)."""
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(
        F.size(shingles_col()).alias("n")
    ).select(
        "n",
        (F.col("n") - F.expr(f"((n * {T_NUM} + {T_DEN - 1}) div {T_DEN})") + F.lit(1)).alias("p"),
    ).agg(F.sum("n").alias("total"), F.sum("p").alias("prefix")).first()
    assert stats.prefix < stats.total * 0.6, (
        f"prefix carries {stats.prefix}/{stats.total} tokens — pruning "
        f"is not engaging"
    )


# ---------------------------------------------------------------- group kfold


def test_group_kfold_partitions_customers(spark, sf_dir):
    """Every customer lands in exactly one fold; folds cover the table;
    per-fold customer counts sum to the customer count."""
    customer = load_table(spark, sf_dir, "customer")
    report = group_kfold_assignment(spark, sf_dir).collect()
    assert sorted(r.fold for r in report) == list(range(K_FOLDS))
    assert sum(r.n_customers for r in report) == customer.count()
    # assignment is a pure function of the key: re-running yields the
    # identical report (content-addressed md5, no RNG state anywhere)
    again = group_kfold_assignment(spark, sf_dir).collect()
    assert sorted(map(tuple, report)) == sorted(map(tuple, again))


def test_group_kfold_no_group_leakage(spark, sf_dir):
    """No customer's orders can span folds: fold is derived from
    c_custkey alone, so grouping orders by customer yields exactly one
    fold per customer."""
    from cdc_stream_batch_etl_spark.dedup import hash64_expr

    orders = load_table(spark, sf_dir, "orders")
    spans = (
        orders.select(
            "o_custkey",
            (F.expr(hash64_expr("cast(o_custkey as string)")) % K_FOLDS).alias(
                "fold"
            ),
        )
        .groupBy("o_custkey")
        .agg(F.countDistinct("fold").alias("nf"))
        .filter(F.col("nf") > 1)
        .count()
    )
    assert spans == 0


# ------------------------------------------------------------ k-core contract


def test_kcore_reaches_fixpoint_within_declared_depth(spark, sf_dir):
    """Backs the r12 depth-contract docstring: at the test SF the 3-peel
    partial core IS the true k-core — the last two ledger rows are
    equal. If data growth ever makes the fringe deeper, this fails and
    PEEL_ROUNDS becomes a conscious decision instead of a silent
    truncation."""
    rows = sorted(
        registry.QUERIES["k_core_decomposition"](spark, sf_dir).collect(),
        key=lambda r: r.round,
    )
    last, prev = rows[-1], rows[-2]
    assert (last.nodes_remaining, last.edges_remaining) == (
        prev.nodes_remaining,
        prev.edges_remaining,
    ), "3 peels no longer reach the fixpoint — revisit the depth contract"


# ---------------------------------------------------------------- rolling DAU


def test_rolling_dau_brute_force_spot_check(spark, sf_dir):
    """users_7d on a mid-range day equals a direct distinct count over
    the trailing window; users_1d equals the plain per-day distinct."""
    events = load_table(spark, sf_dir, "events")
    rows = {r.day: r for r in rolling_distinct_users(spark, sf_dir).collect()}
    days = sorted(rows)
    assert days[-1] == events.agg(F.max(F.col("ts").cast("date"))).first()[0]
    probe = days[len(days) // 2]
    direct_7d = (
        events.filter(
            (F.col("ts").cast("date") <= F.lit(probe))
            & (
                F.col("ts").cast("date")
                >= F.date_sub(F.lit(probe), WINDOW_DAYS - 1)
            )
        )
        .select("user_id")
        .distinct()
        .count()
    )
    direct_1d = (
        events.filter(F.col("ts").cast("date") == F.lit(probe))
        .select("user_id")
        .distinct()
        .count()
    )
    assert rows[probe].users_7d == direct_7d
    assert rows[probe].users_1d == direct_1d
    for r in rows.values():
        assert 0 <= r.users_1d <= r.users_7d
        assert abs(r.stickiness - r.users_1d / r.users_7d) == 0.0


# ------------------------------------------------------------------- KS drift


def test_ks_drift_matches_numpy_ecdf(spark, sf_dir):
    """One event_type's ks_stat equals a direct numpy two-sample KS on
    the same cent grid and the same midpoint split — and the split +
    counts are total-preserving."""
    import numpy as np

    from cdc_stream_batch_etl_spark.operators.ksdrift import ks_drift

    events = load_table(spark, sf_dir, "events")
    rows = {r.event_type: r for r in ks_drift(spark, sf_dir).collect()}
    n_by_type = {
        r.event_type: r.n
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert set(rows) == set(n_by_type)
    for t, r in rows.items():
        assert r.n_early + r.n_late == n_by_type[t]
        assert 0.0 <= r.ks_stat <= 1.0
        assert r.drifted == (1 if r.ks_stat > r.ks_crit else 0)

    probe = sorted(rows)[0]
    # the split point is the GLOBAL stream midpoint (one split for all
    # types — cross-type KS rows share the same epoch boundary)
    lo, hi = (
        events.agg(
            F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
        ).first()
    )
    raw = (
        events.filter(F.col("event_type") == probe)
        .select(F.unix_micros("ts").alias("us"), "value")
        .collect()
    )
    early = np.array(
        sorted(int(np.floor(x.value * 100)) for x in raw if 2 * x.us <= lo + hi)
    )
    late = np.array(
        sorted(int(np.floor(x.value * 100)) for x in raw if 2 * x.us > lo + hi)
    )
    grid = np.unique(np.concatenate([early, late]))
    fa = np.searchsorted(early, grid, side="right") / len(early)
    fb = np.searchsorted(late, grid, side="right") / len(late)
    assert abs(rows[probe].ks_stat - float(np.max(np.abs(fa - fb)))) < 1e-12


# --------------------------------------------------------- join size estimates


def test_join_exact_size_matches_materialized_join(spark, sf_dir):
    """The 'exact' row really is the joined-pair count: materializing
    clicks ⋈ purchases on user_id (the thing the operator exists to
    avoid) agrees, and its q_ratio is exactly 1."""
    from cdc_stream_batch_etl_spark.operators.joinest import (
        SIDE_A,
        SIDE_B,
        join_size_estimates,
    )

    events = load_table(spark, sf_dir, "events")
    rows = {r.method: r for r in join_size_estimates(spark, sf_dir).collect()}
    assert set(rows) == {"exact", "hh_hybrid", "sample10", "uniform_ndv"}
    a = events.filter(F.col("event_type") == SIDE_A).select("user_id")
    b = events.filter(F.col("event_type") == SIDE_B).select(
        F.col("user_id").alias("ub")
    )
    true_size = a.join(b, a.user_id == F.col("ub")).count()
    assert rows["exact"].exact_size == true_size
    assert rows["exact"].estimate == float(true_size)
    assert rows["exact"].q_ratio == 1.0
    for r in rows.values():
        assert r.exact_size == true_size  # shared denominator on every row
        assert r.estimate >= 0.0


def test_join_hh_hybrid_no_worse_than_uniform(spark, sf_dir):
    """The end-biased histogram exists to beat the uniform assumption
    under skew: |log q_ratio| of hh_hybrid must not exceed uniform's
    (equal only if the top-H keys carry no skew signal)."""
    import math

    from cdc_stream_batch_etl_spark.operators.joinest import join_size_estimates

    rows = {r.method: r for r in join_size_estimates(spark, sf_dir).collect()}
    err = lambda m: abs(math.log(rows[m].q_ratio))  # noqa: E731
    assert err("hh_hybrid") <= err("uniform_ndv") + 1e-12


# ------------------------------------------------------------- gopher rules


def test_gopher_rules_conjunction_and_totals(spark, sf_dir):
    """Row totals all equal the corpus size; the all_rules count is at
    most the min of the per-rule counts; one rule (stopword_hits) is
    re-derived brute-force."""
    import re

    from cdc_stream_batch_etl_spark.operators import joinest  # noqa: F401
    from cdc_stream_batch_etl_spark.text.gopher import (
        MIN_STOPWORDS,
        gopher_rules_report,
    )

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    rows = {r.rule: r for r in gopher_rules_report(spark, sf_dir).collect()}
    assert set(rows) == {
        "word_count",
        "mean_word_len",
        "stopword_hits",
        "max_word_ratio",
        "all_rules",
    }
    for r in rows.values():
        assert r.n_pass + r.n_fail == n
        assert abs(r.pass_rate - r.n_pass / n) == 0.0
    assert rows["all_rules"].n_pass <= min(
        rows[k].n_pass for k in rows if k != "all_rules"
    )
    sw = re.compile(r"\b(the|a|of|to|and)\b")
    direct = sum(
        1
        for (t,) in docs.select("text").collect()
        if len(sw.findall(t)) >= MIN_STOPWORDS
    )
    assert rows["stopword_hits"].n_pass == direct


# ------------------------------------------------------------ forecast backtest


def test_forecast_backtest_matches_python_replay(spark, sf_dir):
    """All three forecasters' MAE/bias re-derived in plain Python from
    the collected daily cents series; the eval set is shared (equal
    n_days) so the MAEs are comparable."""
    from cdc_stream_batch_etl_spark.operators.backtest import (
        MIN_IDX,
        SEASON,
        forecast_backtest_mae,
    )

    orders = load_table(spark, sf_dir, "orders")
    daily = sorted(
        (r.day, int(r.cents))
        for r in orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    y = [c for _, c in daily]
    ev = range(MIN_IDX - 1, len(y))  # 0-based: idx >= MIN_IDX
    exp = {}
    for method, err in (
        ("naive", lambda t: y[t] - y[t - 1]),
        ("seasonal_naive", lambda t: y[t] - y[t - SEASON]),
        (
            "moving_avg7",
            lambda t: (SEASON * y[t] - sum(y[t - SEASON : t])) / SEASON,
        ),
    ):
        errs = [err(t) for t in ev]
        exp[method] = (
            len(errs),
            sum(abs(e) for e in errs) / (100 * len(errs)),
            sum(errs) / (100 * len(errs)),
        )
    rows = {r.method: r for r in forecast_backtest_mae(spark, sf_dir).collect()}
    assert set(rows) == set(exp)
    n_days = {r.n_days for r in rows.values()}
    assert len(n_days) == 1  # shared eval support
    for m, (n, mae, bias) in exp.items():
        assert rows[m].n_days == n
        assert abs(rows[m].mae - mae) < 1e-9
        assert abs(rows[m].bias - bias) < 1e-9


# ------------------------------------------------------------- link prediction


def test_link_prediction_brute_force(spark, sf_dir):
    """Candidates re-derived from the materialized support-filtered
    graph: exact common-neighbor counts, no candidate is an existing
    edge, jaccard agrees with the degree arithmetic."""
    from collections import defaultdict

    from cdc_stream_batch_etl_spark.operators.basket import _baskets, _pairs_from
    from cdc_stream_batch_etl_spark.operators.linkpred import (
        MIN_COMMON,
        RA_SCALE,
        link_prediction_jaccard,
    )

    pairs = {
        (r.part_a, r.part_b)
        for r in _pairs_from(_baskets(spark, sf_dir))
        .select("part_a", "part_b")
        .collect()
    }
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    expected = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if len(common) >= MIN_COMMON:
                expected[(u, v)] = (
                    len(common),
                    len(common) / (len(adj[u]) + len(adj[v]) - len(common)),
                    sum(RA_SCALE // len(adj[w]) for w in common),
                )
    got = {
        (r.part_a, r.part_b): (r.common_neighbors, r.jaccard, r.ra_scaled)
        for r in link_prediction_jaccard(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (cn, jac, ra) in expected.items():
        assert got[k][0] == cn
        assert abs(got[k][1] - jac) < 1e-12
        assert got[k][2] == ra
    for u, v in got:
        assert (u, v) not in pairs and (v, u) not in pairs

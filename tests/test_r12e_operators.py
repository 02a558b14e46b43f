"""Round-12 fifth batch: independent re-derivations for the CUSUM
chart (sequential recurrence vs the prefix-extremum identity), the
caliper matching estimator (brute-force nearest control), and the
lexical concentration indices (direct Counter math)."""

import math
from collections import Counter

import pyspark.sql.functions as F

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.calipermatch import (
    CALIPER_CENTS,
    caliper_matched_price_effect,
)
from cdc_stream_batch_etl_spark.operators.cusum import (
    H_SIGMA,
    K_SIGMA,
    cusum_drift,
)
from cdc_stream_batch_etl_spark.text.concentration import (
    TOP_HEAD,
    lexical_concentration_report,
)

registry.load_all()


# -------------------------------------------------------------------- cusum


def test_cusum_matches_sequential_recurrence(spark, sf_dir):
    """The window-expressible prefix-extremum identity must equal the
    textbook sequential recurrence s+_t = max(0, s+_{t-1} + dev_t)."""
    orders = load_table(spark, sf_dir, "orders")
    daily = sorted(
        (r.day, r.x)
        for r in orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("x")
        )
        .collect()
    )
    xs = [x for _, x in daily]
    n_cal = len(xs) // 2
    cal = xs[:n_cal]
    s_cal = sum(cal)
    var = (sum(v * v for v in cal) - s_cal * s_cal / n_cal) / n_cal
    sigma = math.sqrt(var)

    def away(v: float) -> int:  # round half away from zero
        return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)

    k, h = away(K_SIGMA * sigma), away(H_SIGMA * sigma)
    sp = sn = 0
    alarms_up = alarms_dn = 0
    first_up = first_dn = None
    max_sp = max_sn = 0
    for (day, x) in daily:
        sp = max(0, sp + (n_cal * x - s_cal - n_cal * k))
        sn = max(0, sn - (n_cal * x - s_cal + n_cal * k))
        max_sp, max_sn = max(max_sp, sp), max(max_sn, sn)
        if sp > n_cal * h:
            alarms_up += 1
            first_up = first_up or day
        if sn > n_cal * h:
            alarms_dn += 1
            first_dn = first_dn or day
    r = cusum_drift(spark, sf_dir).first()
    assert r.n_days == len(xs) and r.n_cal == n_cal
    assert abs(r.sigma_cents - sigma) < 1e-6
    assert (r.k_cents, r.h_cents) == (k, h)
    assert (r.n_alarms_up, r.n_alarms_down) == (alarms_up, alarms_dn)
    assert r.first_alarm_up == first_up and r.first_alarm_down == first_dn
    assert abs(r.max_s_up_cents - max_sp / n_cal) < 1e-6
    assert abs(r.max_s_down_cents - max_sn / n_cal) < 1e-6


# ------------------------------------------------------------------- caliper


def test_caliper_matches_brute_force_nearest(spark, sf_dir):
    """ATT re-derived by brute-force nearest-control search with the
    same tiebreak (lower |diff|, then lower control price)."""
    li = load_table(spark, sf_dir, "lineitem")
    units = {
        r.pk: r.u
        for r in li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.sum(F.floor("l_quantity").cast("bigint")).alias("u"))
        .collect()
    }
    parts = [
        (r.p_partkey, int(math.floor(r.p_retailprice * 100)), r.p_type == "PROMO")
        for r in load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_retailprice", "p_type")
        .collect()
    ]
    controls = sorted(
        (price, pid) for pid, price, tr in parts if not tr
    )
    treated = [(pid, price) for pid, price, tr in parts if tr]
    import bisect

    n_matched = 0
    eff_sum = 0
    t_sum = c_sum = dist_sum = 0
    for pid, price in treated:
        i = bisect.bisect_right(controls, (price, float("inf")))
        cand = []
        if i > 0:
            bp, bid = controls[i - 1]
            cand.append((abs(price - bp), bp, bid))
        if i < len(controls):
            ap, aid = controls[i]
            cand.append((abs(ap - price), ap, aid))
        if not cand:
            continue
        dist, cp, cid = min(cand)
        if dist <= CALIPER_CENTS:
            n_matched += 1
            tu, cu = units.get(pid, 0), units.get(cid, 0)
            t_sum += tu
            c_sum += cu
            eff_sum += tu - cu
            dist_sum += dist
    r = caliper_matched_price_effect(spark, sf_dir).first()
    assert r.n_treated == len(treated)
    assert r.n_matched == n_matched
    assert r.n_unmatched == len(treated) - n_matched
    assert abs(r.att_units - eff_sum / n_matched) < 1e-9
    assert abs(r.treated_mean_units - t_sum / n_matched) < 1e-9
    assert abs(r.control_mean_units - c_sum / n_matched) < 1e-9
    assert abs(r.mean_match_dist_cents - dist_sum / n_matched) < 1e-9
    assert (
        abs(
            r.att_units - (r.treated_mean_units - r.control_mean_units)
        )
        < 1e-9
    )


# -------------------------------------------------------------- concentration


def test_concentration_matches_counter_math(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    by_source = {}
    for r in docs:
        by_source.setdefault(r.source, Counter()).update(r.text.split(" "))
    out = {r.source: r for r in lexical_concentration_report(spark, sf_dir).collect()}
    assert set(out) == set(by_source)
    for src, cnt in by_source.items():
        n = sum(cnt.values())
        simpson = sum(c * (c - 1) for c in cnt.values()) / (n * (n - 1))
        shannon = -sum((c / n) * math.log(c / n) for c in cnt.values())
        head = sum(
            c for _, c in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_HEAD]
        )
        r = out[src]
        assert r.n_tokens == n and r.n_types == len(cnt)
        assert abs(r.simpson - simpson) < 1e-12
        assert abs(r.inv_simpson - 1 / simpson) < 1e-6
        assert abs(r.shannon_nats - shannon) < 1e-8
        assert abs(r.effective_vocab - math.exp(shannon)) < 1e-6
        assert abs(r.top10_share - head / n) < 1e-12
        # information bounds
        assert 0 < r.shannon_nats <= math.log(r.n_types) + 1e-9
        # without-replacement Simpson's floor is (N-K)/(K(N-1)), reached
        # by the uniform distribution — slightly BELOW the 1/K
        # with-replacement bound
        floor_ = (n - r.n_types) / (r.n_types * (n - 1))
        assert floor_ - 1e-12 <= r.simpson <= 1

"""Round-12 sixth batch: independent re-derivations for the salting
plan (python counter math), the Shewhart I-MR chart (textbook float
recurrence vs the division-free integer test), the Simpson's-paradox
audit (pandas moments), the PR curve (recomputed from the registered
classifier/rule-gate queries), the Fellegi-Sunter weights (hashlib
pairing from raw parquet), and the quantile-regression grid (full
python grid search)."""

import hashlib
import math
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.dedup.fellegi import (
    N_BUCKETS,
    fellegi_sunter_weights,
)
from cdc_stream_batch_etl_spark.operators.qreg import (
    G,
    TAUS,
    time_series_quantile_trend,
)
from cdc_stream_batch_etl_spark.operators.saltplan import (
    SHUFFLE_TARGET,
    TOP_K,
    skew_salt_plan,
)
from cdc_stream_batch_etl_spark.operators.shewhart import shewhart_imr_chart
from cdc_stream_batch_etl_spark.operators.simpson import simpsons_paradox_audit
from cdc_stream_batch_etl_spark.text.prcurve import T_GRID, quality_pr_curve

registry.load_all()


def _daily_cents(spark, sf_dir):
    """The shared integer-cents daily revenue base (the cusum device)."""
    orders = load_table(spark, sf_dir, "orders")
    return sorted(
        (r.day, r.x)
        for r in orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("x")
        )
        .collect()
    )


# ---------------------------------------------------------------- salt plan


def test_salt_plan_matches_counter_math(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("user_id").collect()
    counts = Counter(r.user_id for r in ev)
    total = sum(counts.values())
    ideal = (total + SHUFFLE_TARGET - 1) // SHUFFLE_TARGET
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    out = skew_salt_plan(spark, sf_dir).collect()
    assert len(out) == min(TOP_K, len(counts))
    for rank, (r, (key, n)) in enumerate(zip(out, top), start=1):
        salt = max(1, (n + ideal - 1) // ideal)
        assert (r.key, r.n_rows, r.rank) == (key, n, rank)
        assert r.ideal_task_rows == ideal
        assert r.salt_factor == salt
        assert r.salted_max_rows == (n + salt - 1) // salt
        assert r.salted_max_rows <= ideal  # the plan's whole point
        assert abs(r.share - n / total) < 1e-15


# ------------------------------------------------------------------- I-MR


def test_shewhart_matches_float_recurrence(spark, sf_dir):
    daily = _daily_cents(spark, sf_dir)
    xs = [x for _, x in daily]
    n = len(xs)
    mrs = [abs(b - a) for a, b in zip(xs, xs[1:])]
    xbar = sum(xs) / n
    mrbar = sum(mrs) / (n - 1)
    ucl = xbar + 125 * mrbar / 47
    lcl = xbar - 125 * mrbar / 47
    above = [(d, x) for (d, x) in daily if x > ucl]
    below = [(d, x) for (d, x) in daily if x < lcl]
    r = shewhart_imr_chart(spark, sf_dir).first()
    assert r.n_days == n
    assert abs(r.xbar_cents - xbar) < 1e-9 * abs(xbar)
    assert abs(r.mrbar_cents - mrbar) < 1e-9 * abs(mrbar)
    assert abs(r.sigma_cents - mrbar / 1.128) < 1e-6
    assert abs(r.ucl_cents - ucl) < 1e-9 * abs(ucl)
    # the division-free integer test must agree with the float limits
    # (margins here are far beyond one ulp on this data)
    assert r.n_above == len(above) and r.n_below == len(below)
    assert r.first_above == (min(d for d, _ in above) if above else None)
    assert r.first_below == (min(d for d, _ in below) if below else None)


# ----------------------------------------------------------------- simpson


def test_simpson_matches_pandas_moments(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_extendedprice"
    ).toPandas()
    part = (
        load_table(spark, sf_dir, "part")
        .select("p_partkey", "p_brand")
        .toPandas()
        .set_index("p_partkey")["p_brand"]
    )
    groups = defaultdict(list)
    for _, row in li.iterrows():
        x = int(round(row.l_discount * 100))
        y = int(math.floor(row.l_extendedprice))
        groups[part[row.l_partkey]].append((x, y))
        groups["OVERALL"].append((x, y))

    def stats(pts):
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        syy = sum(y * y for _, y in pts)
        cov_num = n * sxy - sx * sy
        cov = sxy / n - (sx / n) * (sy / n)
        vx = sxx / n - (sx / n) * (sx / n)
        vy = syy / n - (sy / n) * (sy / n)
        sign = 1 if cov_num > 0 else (-1 if cov_num < 0 else 0)
        r = cov / math.sqrt(vx * vy) if vx > 0 and vy > 0 else None
        return n, sign, r

    out = {r.grp: r for r in simpsons_paradox_audit(spark, sf_dir).collect()}
    assert set(out) == set(groups)
    overall_sign = stats(groups["OVERALL"])[1]
    for grp, pts in groups.items():
        n, sign, r = stats(pts)
        row = out[grp]
        assert (row.n_rows, row.cov_sign) == (n, sign)
        assert row.overall_sign == overall_sign
        assert row.paradox_flag == (
            sign != 0 and overall_sign != 0 and sign != overall_sign
        )
        if r is not None:
            assert abs(row.pearson_r - r) < 1e-12


# ---------------------------------------------------------------- PR curve


def test_pr_curve_consistent_with_registered_gates(spark, sf_dir):
    """The curve must be exactly the confusion matrix of the two
    already-oracled queries it composes (logit from quality_classifier,
    'high' label from doc_quality)."""
    logits = {
        r.doc_id: r.logit
        for r in registry.QUERIES["quality_classifier"](spark, sf_dir)
        .select("doc_id", "logit")
        .collect()
    }
    labels = {
        r.doc_id: r.quality_label == "high"
        for r in registry.QUERIES["doc_quality"](spark, sf_dir)
        .select("doc_id", "quality_label")
        .collect()
    }
    assert set(logits) == set(labels)
    pos = sum(labels.values())
    n = len(labels)
    out = quality_pr_curve(spark, sf_dir).collect()
    assert [r.threshold for r in out] == sorted(T_GRID)
    for r in out:
        tp = sum(
            1 for d in logits if logits[d] >= r.threshold and labels[d]
        )
        pp = sum(1 for d in logits if logits[d] >= r.threshold)
        assert (r.tp, r.fp, r.fn, r.tn) == (
            tp,
            pp - tp,
            pos - tp,
            n - pp - pos + tp,
        )
        assert r.precision == (tp / pp if pp else None)
        assert r.recall == (tp / pos if pos else None)
        assert r.f1 == (2 * tp / (pp + pos) if pp + pos else None)
    # the curve is monotone: recall non-increasing in threshold
    recalls = [r.recall for r in out if r.recall is not None]
    assert recalls == sorted(recalls, reverse=True)


# ---------------------------------------------------------------- Fellegi


def test_fellegi_matches_hashlib_rederivation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").collect()
    feat = {}
    for r in docs:
        toks = r.text.split(" ")
        digest = hashlib.md5(" ".join(toks[:8]).encode()).hexdigest()
        h60 = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:15], 16)
        feat[r.doc_id] = (
            digest,
            r.lang,
            r.source,
            r.n_chars // 100,
            len(toks) // 10,
            h60,
        )
    # match pairs: within prefix-digest groups
    by_digest = defaultdict(list)
    for did, f in feat.items():
        by_digest[f[0]].append(did)
    mpairs = [
        (a, b)
        for mem in by_digest.values()
        for i, a in enumerate(mem)
        for b in mem[i + 1 :]
    ]
    # non-match pairs: adjacent in (h60, doc_id) order within md5 bucket
    buckets = defaultdict(list)
    for did, f in feat.items():
        buckets[f[5] % N_BUCKETS].append(did)
    upairs = []
    for mem in buckets.values():
        mem.sort(key=lambda d: (feat[d][5], d))
        for a, b in zip(mem[0::2], mem[1::2]):
            if feat[a][0] != feat[b][0]:
                upairs.append((a, b))

    def agree(pairs, i):
        return sum(1 for a, b in pairs if feat[a][i] == feat[b][i])

    fields = {"lang": 1, "source": 2, "len_bucket": 3, "tok_bucket": 4}
    out = {r.field: r for r in fellegi_sunter_weights(spark, sf_dir).collect()}
    assert set(out) == set(fields)
    for name, i in fields.items():
        r = out[name]
        m_agree, u_agree = agree(mpairs, i), agree(upairs, i)
        assert (r.n_match_pairs, r.n_unmatch_pairs) == (
            len(mpairs),
            len(upairs),
        )
        assert (r.m_agree, r.u_agree) == (m_agree, u_agree)
        assert r.m_rate == (m_agree / len(mpairs) if mpairs else None)
        assert r.u_rate == (u_agree / len(upairs) if upairs else None)
        if mpairs and upairs and u_agree:
            assert abs(
                r.weight_ratio
                - (m_agree / len(mpairs)) / (u_agree / len(upairs))
            ) < 1e-12
        else:
            assert r.weight_ratio is None
    assert len(mpairs) > 0  # the label source must be non-degenerate


# ------------------------------------------------------ quantile regression


def test_qreg_matches_python_grid_search(spark, sf_dir):
    xs = [x for _, x in _daily_cents(spark, sf_dir)]
    n = len(xs)
    step = max(1, (max(xs) - min(xs)) // (n * G))
    out = {r.tau: r for r in time_series_quantile_trend(spark, sf_dir).collect()}
    assert set(out) == set(TAUS)
    for tau in TAUS:
        best = None
        for j in range(-G, G + 1):
            slope = j * step
            resid = sorted(x - slope * t for t, x in enumerate(xs, start=1))
            k = (tau * n + 99) // 100
            q = resid[k - 1]
            loss = sum(
                tau * (e - q) if e >= q else (tau - 100) * (e - q)
                for e in resid
            )
            if best is None or (loss, slope) < best[:2]:
                best = (loss, slope, q)
        r = out[tau]
        assert (r.slope_cents_per_day, r.intercept_cents) == (
            best[1],
            best[2],
        )
        assert abs(r.pinball_loss_cents - best[0] / 100) < 1e-9
        assert (r.n_days, r.grid_step_cents) == (n, step)

"""A/B z-test behavior on PLANTED conversion imbalance — the driver
testdata converts every user on every type, so z is NULL by design
there; the real formula path needs planted arms. The expectation is
recomputed INDEPENDENTLY in Python: same md5-parity arm assignment
(hashlib), same pooled-z formula (math), no SQL involved."""

import hashlib
import math

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.abtest import ab_from_events


def _arm(u: int) -> int:
    return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % 2


def test_planted_imbalance_matches_hand_computation(spark):
    # 100 users all fire 'base'; only users 0..39 fire 'conv'.
    users = list(range(100))
    conv_users = users[:40]
    rows = [("base", u) for u in users] + [("conv", u) for u in conv_users]
    ev = spark.createDataFrame(rows, "event_type string, user_id bigint")
    out = {r.event_type: r for r in ab_from_events(ev).collect()}

    n_a = sum(1 for u in users if _arm(u) == 0)
    n_b = len(users) - n_a
    c_a = sum(1 for u in conv_users if _arm(u) == 0)
    c_b = len(conv_users) - c_a

    r = out["conv"]
    assert (r.c_a, r.c_b, r.n_a, r.n_b) == (c_a, c_b, n_a, n_b)
    p_a, p_b = c_a / n_a, c_b / n_b
    pooled = (c_a + c_b) / (n_a + n_b)
    z = (p_a - p_b) / math.sqrt(
        pooled * (1 - pooled) * (1 / n_a + 1 / n_b)
    )
    assert r.lift_r == round(p_a - p_b, 6)
    assert r.z_r == round(z, 6)

    # 'base' converts everyone → zero variance → NULL z, lift exactly 0
    assert out["base"].z_r is None
    assert out["base"].lift_r == 0.0


def test_driver_data_degenerates_to_null_z(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.abtest import ab_test_zscores

    rows = ab_test_zscores(spark, sf_dir).collect()
    assert len(rows) > 0
    # every user fires every type in the synthetic feed: pooled
    # conversion is 100%, so z must be NULL (guarded), never an error
    assert all(r.z_r is None for r in rows)
    assert all(r.c_a == r.n_a and r.c_b == r.n_b for r in rows)

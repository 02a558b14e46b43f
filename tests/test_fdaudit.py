"""FD-audit behavior on PLANTED violations — NULL-lhs exclusion, NULL
rhs counting as a value, and the driver-data verdict mix (the two
PK-backed FDs hold; the plausible-but-false determinations don't)."""

from cdc_stream_batch_etl_spark.operators.fdaudit import FDS, audit_fds


def test_planted_violation_and_null_semantics(spark):
    t = spark.createDataFrame(
        [
            (1, "a"),
            (1, "a"),  # same rhs twice: no violation
            (2, "a"),
            (2, "b"),
            (2, "c"),  # 3 distinct rhs: the worst key
            (3, None),  # NULL rhs alone: one value, no violation
            (4, "x"),
            (4, None),  # {x, NULL}: IS a violation
            (None, "q"),  # NULL lhs: excluded entirely
        ],
        "k bigint, v string",
    )
    r = audit_fds({"t": t}, (("t", "k", "v"),)).collect()[0]
    assert r.fd == "t: k -> v"
    assert r.n_keys == 4  # NULL lhs not a key
    assert r.n_violating_keys == 2  # keys 2 and 4
    assert r.max_rhs_per_key == 3
    assert r.violation_share == 2 / 4
    assert not r.holds


def test_holding_fd(spark):
    t = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k bigint, v string"
    )
    r = audit_fds({"t": t}, (("t", "k", "v"),)).collect()[0]
    assert r.holds and r.n_violating_keys == 0 and r.max_rhs_per_key == 1


def test_driver_data_verdict_mix(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.fdaudit import (
        functional_dependency_audit,
    )

    rows = {r.fd: r for r in functional_dependency_audit(spark, sf_dir).collect()}
    assert len(rows) == len(FDS)
    # PK-backed determinations hold...
    assert rows["orders: o_orderkey -> o_orderstatus"].holds
    assert rows["nation: n_nationkey -> n_regionkey"].holds
    # ...and the false ones are flagged with a sensible share
    for fd in (
        "orders: o_custkey -> o_orderpriority",
        "customer: c_nationkey -> c_mktsegment",
        "part: p_brand -> p_type",
    ):
        r = rows[fd]
        assert not r.holds and 0 < r.violation_share <= 1.0, fd

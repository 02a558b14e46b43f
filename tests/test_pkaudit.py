"""PK-audit behavior on PLANTED duplicate/NULL keys — driver testdata
is key-clean, so the dup/excess/null branches need planted violations,
including a composite key where only the FULL tuple duplicates."""

from cdc_stream_batch_etl_spark.operators.pkaudit import KEYS, audit_keys


def test_planted_dups_and_nulls(spark):
    t = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "x"), (2, "y"), (None, "z"), (None, "w")],
        "k bigint, v string",
    )
    out = audit_keys({"t": t}, (("t", ("k",)),)).collect()
    r = out[0]
    assert r.pk == "t(k)"
    assert r.total_rows == 6
    assert r.distinct_keys == 2  # 1 and 2; NULL is not a key
    assert r.dup_keys == 1  # key 1 appears 3x
    assert r.excess_rows == 2  # two rows beyond the first for key 1
    assert r.null_key_rows == 2


def test_composite_key_duplicates_only_on_full_tuple(spark):
    t = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 1), (3, None)],
        "a bigint, b bigint",
    )
    r = audit_keys({"t": t}, (("t", ("a", "b")),)).collect()[0]
    assert r.pk == "t(a, b)"
    # (1,1) duplicated; (1,2)/(2,1) distinct despite sharing components;
    # (3,NULL) is a null-key row for the composite.
    assert r.distinct_keys == 3
    assert r.dup_keys == 1
    assert r.excess_rows == 1
    assert r.null_key_rows == 1


def test_driver_data_audit_finds_the_real_violation(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.pkaudit import (
        pk_uniqueness_audit,
    )

    rows = {r.pk: r for r in pk_uniqueness_audit(spark, sf_dir).collect()}
    assert len(rows) == len(KEYS)
    assert all(r.null_key_rows == 0 for r in rows.values())
    # The synthetic generator does NOT enforce TPC-H's composite
    # lineitem key — (l_orderkey, l_linenumber) genuinely duplicates
    # (e.g. 60000 rows / 45832 distinct at sf0.01). The audit exists to
    # surface exactly this; every other declared key is clean.
    li = rows["lineitem(l_orderkey, l_linenumber)"]
    assert li.dup_keys > 0 and li.excess_rows > 0
    for pk, r in rows.items():
        if pk != "lineitem(l_orderkey, l_linenumber)":
            assert r.dup_keys == 0 and r.excess_rows == 0, pk
            assert r.total_rows == r.distinct_keys > 0, pk

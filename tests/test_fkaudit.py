"""FK-audit behavior on PLANTED referential drift — the driver testdata
is referentially clean (every audit row reports zero orphans), so the
orphan and NULL-FK branches need a fixture with real drift: a deleted
parent whose children linger (the classic CDC out-of-order apply) and
children ingested with NULL FKs."""

from cdc_stream_batch_etl_spark.operators.fkaudit import EDGES, audit_edges


def test_planted_orphans_and_nulls(spark):
    child = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200), (4, None), (5, None), (6, 300)],
        "id bigint, fk bigint",
    )
    parent = spark.createDataFrame([(100,), (999,)], "pk bigint")
    out = audit_edges(
        {"child": child, "parent": parent},
        (("child", "fk", "parent", "pk"),),
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.edge == "child.fk->parent.pk"
    assert r.child_rows == 6
    assert r.fk_nulls == 2  # NULL FKs are counted, never orphans
    assert r.distinct_fk == 3  # 100, 200, 300
    assert r.orphan_keys == 2  # 200 and 300 have no parent
    assert r.orphan_rows == 2  # one child row each


def test_driver_data_is_clean(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.fkaudit import (
        fk_integrity_audit,
    )

    rows = fk_integrity_audit(spark, sf_dir).collect()
    assert len(rows) == len(EDGES)
    # The synthetic schema is referentially intact: the audit's healthy
    # answer is all-zero orphans with nonzero row/NDV counts.
    assert all(r.orphan_rows == 0 and r.orphan_keys == 0 for r in rows)
    assert all(r.child_rows > 0 and r.distinct_fk > 0 for r in rows)

"""Bootstrap uplift (operators/bootuplift.py): the per-replicate arm
means must equal a hashlib re-derivation sharing bootstrap.py's draw,
and the arm split must equal ab-parity."""

import hashlib
from collections import defaultdict
from decimal import Decimal

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.bootstrap import (
    N_REPLICATES,
    _THRESHOLDS,
)
from cdc_stream_batch_etl_spark.operators.bootuplift import (
    bootstrap_uplift_ci,
)

registry.load_all()


def _h40(okey, rep):
    return int(
        hashlib.md5(f"{okey}:{rep}".encode()).hexdigest()[:10], 16
    )


def _arm(custkey):
    return int(hashlib.md5(str(custkey).encode()).hexdigest()[:15], 16) % 2


def test_uplift_matches_hashlib_rederivation(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).collect()
    sums = defaultdict(lambda: [0, Decimal(0)])  # (rep, arm) -> [n, sum]
    for o in orders:
        arm = _arm(o.o_custkey)
        price = Decimal(str(o.o_totalprice)).quantize(Decimal("0.01"))
        for rep in range(N_REPLICATES):
            h = _h40(o.o_orderkey, rep)
            w = sum(1 for t in _THRESHOLDS if h >= t)
            if w:
                cell = sums[(rep, arm)]
                cell[0] += w
                cell[1] += price * w
    out = bootstrap_uplift_ci(spark, sf_dir).collect()
    assert len(out) == N_REPLICATES
    for r in out:
        na, sa = sums[(r.replicate, 0)]
        nb, sb = sums[(r.replicate, 1)]
        assert (r.n_a, r.n_b) == (na, nb)
        ma, mb = float(sa) / na, float(sb) / nb
        assert abs(r.mean_a - ma) < 1e-9 * abs(ma)
        assert abs(r.mean_b - mb) < 1e-9 * abs(mb)
        assert abs(r.uplift - (r.mean_b - r.mean_a)) == 0.0
    # both arms populated in every replicate and uplift spread nonzero
    uplifts = [r.uplift for r in out]
    assert min(uplifts) != max(uplifts)

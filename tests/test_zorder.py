"""Z-order layout contract, measured from the parquet footers: a
z-clustered write must give every file tight min/max stats on BOTH
cluster columns, so a box predicate can skip most files — where the
same data sorted on only the first column yields files whose second-
column stats span the whole domain (nothing to skip).

The pruning simulation below is exactly what Spark's parquet reader
does with footer stats: a file is a candidate iff [min, max] overlaps
the predicate interval."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table, write_zorder

N_FILES = 16


def _file_ranges(path, col):
    out = []
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out


def _candidates(ranges, lo, hi):
    return sum(1 for (a, b) in ranges if not (b < lo or a > hi))


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path_factory.mktemp("z") / "orders_z")
    spath = str(tmp_path_factory.mktemp("s") / "orders_sorted")
    write_zorder(orders, zpath, "o_custkey", "o_totalprice", n_files=N_FILES)
    # Baseline: classic single-column clustering at the same file count.
    (
        orders.repartitionByRange(N_FILES, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(spath)
    )
    bounds = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"),
        F.min("o_totalprice"), F.max("o_totalprice"),
    ).first()
    return zpath, spath, bounds


def test_zorder_preserves_rows(spark, sf_dir, layouts):
    zpath, _, _ = layouts
    orders = load_table(spark, sf_dir, "orders")
    z = spark.read.parquet(zpath)
    assert z.count() == orders.count()
    assert z.select(F.sum("o_orderkey")).first()[0] == orders.select(
        F.sum("o_orderkey")
    ).first()[0]


def test_zorder_prunes_second_dimension(layouts):
    zpath, spath, (_, _, plo, phi) = layouts
    width = phi - plo
    lo, hi = plo + 0.4 * width, plo + 0.5 * width  # 10% price slice
    z_files = _file_ranges(zpath, "o_totalprice")
    s_files = _file_ranges(spath, "o_totalprice")
    assert len(z_files) == len(s_files) == N_FILES
    z_hit = _candidates(z_files, lo, hi)
    s_hit = _candidates(s_files, lo, hi)
    # custkey-sorted files all span ~the full price domain: no skipping.
    assert s_hit >= int(0.9 * N_FILES)
    # z-ordered files cover compact rectangles: most files skippable.
    assert z_hit <= N_FILES // 2, (z_hit, s_hit)


def test_zorder_still_prunes_first_dimension(layouts):
    zpath, _, (clo, chi, _, _) = layouts
    width = chi - clo
    lo, hi = clo + 0.4 * width, clo + 0.5 * width  # 10% custkey slice
    z_hit = _candidates(_file_ranges(zpath, "o_custkey"), lo, hi)
    # Not as tight as a dedicated sort, but far from all-files.
    assert z_hit <= N_FILES // 2, z_hit

#!/usr/bin/env python
"""Dump explain('formatted') for named queries to plans/r12/<q>_<suffix>.txt.

Usage: python scripts/dump_plan.py <suffix> <query> [<query> ...]
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.session import get_spark

suffix = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = Path(os.environ.get("SPARK_GRAFT_PLAN_DIR", str(Path(__file__).resolve().parent.parent / "plans" / "r12")))

registry.load_all()
spark = get_spark(app=f"dump_plan_{suffix}")
for name in names:
    df = registry.QUERIES[name](spark, sf_dir)
    txt = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    (out_dir / f"{name}_{suffix}.txt").write_text(txt)
    print(f"wrote {name}_{suffix}.txt ({len(txt.splitlines())} lines)")
    spark.catalog.clearCache()
spark.stop()

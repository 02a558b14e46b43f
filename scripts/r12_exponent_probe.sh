#!/bin/bash
# Fresh-data scaling exponents for the round-12 late-batch operators:
# min-of-2 fresh-JVM runs at sf0.1 (driver fixtures) and benchdata/sf1
# (gen_sf1.py fresh keys, 10x), one JVM per run (SCALING.md protocol).
set -u
OUT=${1:-/tmp/r12_exponents.jsonl}
: > "$OUT"
QUERIES=(
  skew_salt_plan shewhart_imr_chart simpsons_paradox_audit
  quality_pr_curve fellegi_sunter_weights time_series_quantile_trend
  jl_projection_distortion semantic_silhouette
)
for q in "${QUERIES[@]}"; do
  for sf in /root/testdata/sf0.1 /root/repo/benchdata/sf1; do
    SPARK_GRAFT_SF_DIR=$sf python scripts/fresh_jvm_time.py "$q" 2 2>/dev/null \
      | tail -1 >> "$OUT"
  done
done
echo "wrote $OUT"

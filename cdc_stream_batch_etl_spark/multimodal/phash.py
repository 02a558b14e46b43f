"""Perceptual-hash image dedup — the multimodal rung of the dedup ladder.

Text dedup keys on content digests; IMAGE dedup cannot (one re-encode
perturbs every byte), so production pipelines (LAION, DataComp) key on
a PERCEPTUAL hash of the decoded raster. This operator is the classic
aHash (average hash): decode → nearest-neighbor 8×8 downsample →
integer grayscale → mean threshold → 64 bits; identical rasters (and
near-identical ones at real-image resolution) collide, and the dedup is
then the exact-dedup shape keyed on the hash.

Everything on the Spark side is REAL: the payloads are spec-conformant
BMPs (multimodal/binaryops.py codec), the decoder parses headers and
rasters, the downsample is a genuine 2-D gather. Determinism choices
that keep the full DuckDB oracle possible:
- grayscale = (r+g+b) // 3 in integers (no float luma weights);
- threshold by cross-multiplication g*64 > total (no float mean);
- hash emitted as a 16-hex-char string (a 64-bit unsigned value can
  overflow BIGINT; strings hash-compare exactly in both engines).
The oracle never decodes a BMP — it predicts the same 64 bits from
sha256 digest arithmetic (the binaryops resize-oracle pattern), so a
bug anywhere in encode → parse → gather → threshold breaks the match.

Scale: the hash is computed in the scan-local Arrow pass (1:1, no
shuffle, bounded per-batch memory); the dedup agg is one hash-keyed
shuffle — the dedup_exact plan with phash in place of md5. At 100 TB
this is exactly how image corpora dedup: hash at ingest, group later.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table
from ..registry import register
from .binaryops import (
    _DIGEST_BYTES,
    _HEXMAP,
    _doc_pixels,
    bmp_decode,
    bmp_encode,
    spread_for_codec,
)

GRID = 8  # aHash grid: 8×8 = 64 bits

_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("phash", T.StringType()),
    ]
)


_IDX = np.arange(GRID)
_SHIFTS = 1 << np.arange(GRID, dtype=np.int64)


def _ahash_hex(px: np.ndarray) -> str:
    """The 8×8 average hash of one decoded (H, W, 3) raster, as 16 hex
    chars — the single home of the aHash math (payload-input and fused
    document-input passes must agree bit-for-bit)."""
    h, w, _ = px.shape
    grid = px[np.ix_((_IDX * h) // GRID, (_IDX * w) // GRID)].astype(np.int64)
    gray = grid.sum(axis=2) // 3  # (8, 8) integer grayscale
    total = int(gray.sum())
    bits = (gray * (GRID * GRID)) > total  # g*64 > sum — exact
    row_bytes = (bits * _SHIFTS).sum(axis=1)
    return "".join(f"{int(b):02x}" for b in row_bytes)


def image_ahash(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, phash): the 8×8 average hash of each decoded raster."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [_ahash_hex(bmp_decode(bytes(p))) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "phash": hashes}
            )

    return df.mapInPandas(fn, schema=_PHASH_SCHEMA)


def image_ahash_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, phash) straight from (doc_id, text) in ONE Arrow pass.

    r13 (guide §4.1/§2.3): the ~80 KB/doc BMP is built (bmp_encode) and
    re-parsed (bmp_decode) inside the same Python worker instead of
    crossing JVM↔Python twice between chained encode/ahash mapInPandas
    nodes — measured ×4-5 on the phash family with the run-to-run
    variance gone (the 385 MB/pass Arrow transfer was the noise source).
    Both real codec halves still run on every row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                _ahash_hex(bmp_decode(bmp_encode(_doc_pixels(t))))
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "phash": hashes}
            )

    return spread_for_codec(docs).mapInPandas(fn, schema=_PHASH_SCHEMA)


# The fixture rasters tile the digest per row (every row identical), so
# gray(y, x) is independent of y: the oracle computes the 8 column grays
# from digest bytes, thresholds against 8×their sum, and repeats the row
# byte 8 times — while the Spark side must reproduce it from REAL decoded
# pixels through the general 2-D gather.
_PHASH_ORACLE = f"""
WITH hexmap AS ({_HEXMAP}),
sh AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents),
bytes AS ({_DIGEST_BYTES}),
dims AS (
  SELECT doc_id,
         64 + (MAX(CASE WHEN j = 0 THEN v END) % 192) AS width
  FROM bytes GROUP BY doc_id
),
cols AS (
  SELECT d.doc_id, x.xi,
         (ba.v + bb.v + bc.v) // 3 AS g
  FROM dims d
  CROSS JOIN range({GRID}) x(xi)
  JOIN bytes ba ON ba.doc_id = d.doc_id
               AND ba.j = ((x.xi * d.width // {GRID}) * 3) % 32
  JOIN bytes bb ON bb.doc_id = d.doc_id
               AND bb.j = ((x.xi * d.width // {GRID}) * 3 + 1) % 32
  JOIN bytes bc ON bc.doc_id = d.doc_id
               AND bc.j = ((x.xi * d.width // {GRID}) * 3 + 2) % 32
),
sums AS (
  SELECT doc_id, SUM(g) AS sumg FROM cols GROUP BY doc_id
),
hashes AS (
  SELECT c.doc_id,
         repeat(printf('%02x',
           CAST(SUM(CASE WHEN c.g * {GRID} > s.sumg
                         THEN 1 << c.xi ELSE 0 END) AS INTEGER)), {GRID}) AS phash
  FROM cols c JOIN sums s USING (doc_id)
  GROUP BY c.doc_id
)
SELECT c.doc_id, c.phash,
       g.canonical_doc_id,
       g.dup_count,
       c.doc_id = g.canonical_doc_id AS is_canonical
FROM hashes c
JOIN (
  SELECT phash, min(doc_id) AS canonical_doc_id,
         CAST(count(*) AS BIGINT) AS dup_count
  FROM hashes GROUP BY phash
) g USING (phash)
"""


@register("image_phash_dedup", oracle=_PHASH_ORACLE)
def image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's decoded-raster aHash, its hash-group canonical,
    and the group multiplicity — exact dedup keyed on perceptual content.

    Plan note: the canonical/dup_count are WINDOW functions over a phash
    partition, not a groupBy+join — one scan of documents, one Arrow
    decode pass, one phash-keyed shuffle. The earlier agg+join shape
    consumed the unpersisted mapInPandas frame twice, re-running the
    whole BMP encode+decode per leg (BENCH_r05: 45.3 s vs the 2.1 s
    single-pass probe)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hashes = image_ahash_docs(docs)
    w = Window.partitionBy("phash")
    return hashes.select(
        "doc_id",
        "phash",
        F.min("doc_id").over(w).alias("canonical_doc_id"),
        F.count("*").over(w).alias("dup_count"),
    ).withColumn("is_canonical", F.col("doc_id") == F.col("canonical_doc_id"))


#: Hamming radius for near-duplicate pairs. With the hash split into
#: N_BANDS exact-match bands, the pigeonhole principle GUARANTEES any
#: pair within distance < N_BANDS shares at least one untouched band —
#: R = 3 < 4 makes the banded candidate generation exact, not heuristic
#: (multi-index hashing: Norouzi, Punjani, Fleet, CVPR 2012 — public
#: literature; no reference-repo counterpart, SURVEY §2.11 mandate).
HAM_R = 3
N_BANDS = 4  # 4 bands × 16 bits (4 hex chars) of the 64-bit aHash
#: fail-open bucket cap — the minhash.MAX_BUCKET contract applied to a
#: band value shared by a pathological fraction of the corpus
MAX_PHASH_BUCKET = 64

# 32-bit halves of the 16-hex phash — a full 64-bit unsigned value can
# overflow BIGINT, two 8-hex halves cannot; same split in both engines
_HAM_SPARK = (
    "cast(bit_count(cast(conv(substr({a}, 1, 8), 16, 10) as bigint) "
    "^ cast(conv(substr({b}, 1, 8), 16, 10) as bigint)) "
    "+ bit_count(cast(conv(substr({a}, 9, 8), 16, 10) as bigint) "
    "^ cast(conv(substr({b}, 9, 8), 16, 10) as bigint)) as bigint)"
)


def phash_near_pairs(hashes: DataFrame) -> DataFrame:
    """(doc_a, doc_b, hamming, is_exact) for every pair within HAM_R
    bits — sublinear Hamming search over a (doc_id, phash) frame.

    Bucket-pair idiom (dedup/minhash.py, text/winnow.py): each band
    value's members fold into ONE sorted array, capped, and pairs expand
    scan-locally — a band-keyed self-join would re-run the upstream
    Arrow decode pass per side, since the mapInPandas frame is never
    persisted. A pair sharing several bands dedups in the distinct."""
    bands = hashes.select(
        "doc_id",
        "phash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, substr(phash, b * 4 + 1, 4) AS bval))"
            )
        ).alias("bb"),
    ).select("doc_id", "phash", "bb.band", "bb.bval")
    buckets = (
        bands.groupBy("band", "bval")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "phash"))).alias("ms"))
        .filter((F.size("ms") >= 2) & (F.size("ms") <= MAX_PHASH_BUCKET))
    )
    pair_structs = F.expr(
        "flatten(transform(ms, (x, i) -> transform(slice(ms, i + 2, size(ms)), "
        "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, "
        "x.phash AS ph_a, y.phash AS ph_b))))"
    )
    pairs = (
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.ph_a", "p.ph_b")
        .distinct()
    )
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            F.expr(_HAM_SPARK.format(a="ph_a", b="ph_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= HAM_R)
        .withColumn("is_exact", F.col("hamming") == 0)
        .orderBy("doc_a", "doc_b")
    )


_NEAR_ORACLE = f"""
WITH hexmap AS ({_HEXMAP}),
sh AS (SELECT doc_id, lower(sha256(text)) AS h FROM documents),
bytes AS ({_DIGEST_BYTES}),
dims AS (
  SELECT doc_id,
         64 + (MAX(CASE WHEN j = 0 THEN v END) % 192) AS width
  FROM bytes GROUP BY doc_id
),
cols AS (
  SELECT d.doc_id, x.xi,
         (ba.v + bb.v + bc.v) // 3 AS g
  FROM dims d
  CROSS JOIN range({GRID}) x(xi)
  JOIN bytes ba ON ba.doc_id = d.doc_id
               AND ba.j = ((x.xi * d.width // {GRID}) * 3) % 32
  JOIN bytes bb ON bb.doc_id = d.doc_id
               AND bb.j = ((x.xi * d.width // {GRID}) * 3 + 1) % 32
  JOIN bytes bc ON bc.doc_id = d.doc_id
               AND bc.j = ((x.xi * d.width // {GRID}) * 3 + 2) % 32
),
sums AS (
  SELECT doc_id, SUM(g) AS sumg FROM cols GROUP BY doc_id
),
hashes AS (
  SELECT c.doc_id,
         repeat(printf('%02x',
           CAST(SUM(CASE WHEN c.g * {GRID} > s.sumg
                         THEN 1 << c.xi ELSE 0 END) AS INTEGER)), {GRID}) AS phash
  FROM cols c JOIN sums s USING (doc_id)
  GROUP BY c.doc_id
),
bands AS (
  SELECT doc_id, phash, b.b AS band, substr(phash, b.b * 4 + 1, 4) AS bval
  FROM hashes, range({N_BANDS}) b(b)
),
capped AS (
  SELECT doc_id, phash, band, bval FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bval) AS bsz FROM bands
  ) WHERE bsz <= {MAX_PHASH_BUCKET}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.phash AS ph_a, b.phash AS ph_b
  FROM capped a JOIN capped b
    ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
),
scored AS (
  SELECT doc_a, doc_b,
         CAST(bit_count(xor(CAST(('0x' || substr(ph_a, 1, 8)) AS BIGINT),
                            CAST(('0x' || substr(ph_b, 1, 8)) AS BIGINT)))
            + bit_count(xor(CAST(('0x' || substr(ph_a, 9, 8)) AS BIGINT),
                            CAST(('0x' || substr(ph_b, 9, 8)) AS BIGINT)))
           AS BIGINT) AS hamming
  FROM pairs
)
SELECT doc_a, doc_b, hamming, hamming = 0 AS is_exact
FROM scored
WHERE hamming <= {HAM_R}
ORDER BY doc_a, doc_b
"""


@register("image_phash_near_pairs", oracle=_NEAR_ORACLE)
def image_phash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image pairs within HAM_R=3 bits of perceptual-hash distance —
    the NEAR rung above image_phash_dedup's exact hash groups (a
    re-encode or mild edit moves a few aHash bits, never zero). The
    4×16-bit banding makes candidate volume sublinear while the
    pigeonhole bound keeps recall at radius 3 EXACT; the oracle
    replays the same banding + cap on its digest-predicted hashes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return phash_near_pairs(image_ahash_docs(docs))

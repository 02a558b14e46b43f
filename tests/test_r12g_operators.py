"""Round-12 seventh batch: numpy re-derivations for the JL distortion
report (hashlib signs, exact integer distances) and the semantic-cell
silhouette (stride reservoir, argmax-dot assignment, centroid-form
scores)."""

import hashlib
import math
from collections import defaultdict

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.similarity.jl import (
    DIMS,
    K_PROJ,
    N_BUCKETS,
    Q_SCALE,
    SIGNS,
    jl_projection_distortion,
)
from cdc_stream_batch_etl_spark.similarity.linalg import CENTROID_STRIDE
from cdc_stream_batch_etl_spark.similarity.silhouette import (
    semantic_silhouette,
)

registry.load_all()


def _round_half_away(v: float) -> int:
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def test_jl_matches_numpy_rederivation(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    q = {
        r.vec_id: [_round_half_away(float(v) * Q_SCALE) for v in r.embedding]
        for r in rows
    }
    # sign matrix sanity: +-1, balanced-ish, reproducible from hashlib
    assert len(SIGNS) == K_PROJ and all(len(s) == DIMS for s in SIGNS)
    h = int(hashlib.md5(b"0_0").hexdigest()[:15], 16)
    assert SIGNS[0][0] == 1 - 2 * (h % 2)

    proj = {
        vid: [sum(s * x for s, x in zip(SIGNS[j], qv)) for j in range(K_PROJ)]
        for vid, qv in q.items()
    }
    h60 = {
        vid: int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16)
        for vid in q
    }
    buckets = defaultdict(list)
    for vid in q:
        buckets[h60[vid] % N_BUCKETS].append(vid)
    ratios, within = [], 0
    n_pairs = 0
    for mem in buckets.values():
        mem.sort(key=lambda v: (h60[v], v))
        for a, b in zip(mem[0::2], mem[1::2]):
            dorig2 = sum((x - y) ** 2 for x, y in zip(q[a], q[b]))
            dproj2 = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            if dorig2 == 0:
                continue
            n_pairs += 1
            ratios.append(dproj2 / (K_PROJ * dorig2))
            if 4 * K_PROJ * dorig2 <= 5 * dproj2 <= 6 * K_PROJ * dorig2:
                within += 1
    r = jl_projection_distortion(spark, sf_dir).first()
    assert (r.n_pairs, r.k_proj, r.n_dims) == (n_pairs, K_PROJ, DIMS)
    assert abs(r.mean_ratio - sum(sorted(ratios)) / n_pairs) < 1e-12
    assert abs(r.min_ratio - min(ratios)) < 1e-12
    assert abs(r.max_ratio - max(ratios)) < 1e-12
    assert r.n_within_20pct == within
    assert abs(r.share_within_20pct - within / n_pairs) < 1e-15
    # JL sanity: the unbiased estimator should center near 1
    assert 0.5 < r.mean_ratio < 1.5


def test_silhouette_matches_numpy_rederivation(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").collect()
    emb = {r.vec_id: [float(v) for v in r.embedding] for r in rows}
    n = len(emb)
    stride = max(CENTROID_STRIDE, math.ceil(math.sqrt(n)))
    cents = {vid: v for vid, v in emb.items() if vid % stride == 0}
    assert len(cents) >= 2  # fixture must exercise the b-distance path

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    cells = defaultdict(list)
    for vid, v in emb.items():
        scored = sorted(
            (
                (dot(v, c), cid, dot(v, c) / (math.sqrt(dot(v, v)) * math.sqrt(dot(c, c))))
                for cid, c in cents.items()
            ),
            key=lambda t: (-t[0], -t[1]),
        )
        own_cid, cos_own = scored[0][1], scored[0][2]
        cos_other = max(t[2] for t in scored[1:])
        a, b = 1 - cos_own, 1 - cos_other
        s = (b - a) / max(a, b) if max(a, b) > 0 else 0.0
        cells[own_cid].append(s)

    out = {r.cell: r for r in semantic_silhouette(spark, sf_dir).collect()}
    assert set(out) == set(cells)
    for cid, ss in cells.items():
        r = out[cid]
        assert r.n_members == len(ss) and r.n_scored == len(ss)
        assert abs(r.mean_s - sum(sorted(ss)) / len(ss)) < 1e-9
        assert abs(r.min_s - min(ss)) < 1e-9
        assert abs(r.max_s - max(ss)) < 1e-9
        assert r.n_negative == sum(1 for s in ss if s < 0)

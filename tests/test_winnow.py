"""Winnowing contracts beyond the oracle hash-match (text/winnow.py):
the SIGMOD'03 coverage guarantee on planted data, the rightmost
tie-break, density, and the match query's ability to localize a shared
passage between otherwise-different documents."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdc_stream_batch_etl_spark.text.winnow import (
    MIN_SHARED,
    WINNOW_K,
    WINNOW_W,
    _fingerprints,
    winnow_match_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_coverage_guarantee_on_planted_shared_run(spark):
    """Paper theorem: any shared run of ≥ W+K-1 tokens produces at least
    one shared selected fingerprint. Plant a 40-token passage inside two
    otherwise-disjoint documents."""
    passage = " ".join(f"shared{i}" for i in range(40))
    a = "alpha beta gamma " * 10 + passage + " delta epsilon " * 10
    b = "one two three four " * 12 + passage + " five six seven " * 9
    fps = _fingerprints(_docs(spark, [(1, a), (2, b)])).collect()
    by_doc = {1: set(), 2: set()}
    for r in fps:
        by_doc[r.doc_id].add(r.fp_hash)
    shared = by_doc[1] & by_doc[2]
    assert shared, "shared 40-token run produced no shared fingerprint"


def test_disjoint_docs_share_nothing(spark):
    fps = _fingerprints(
        _docs(
            spark,
            [
                (1, " ".join(f"aa{i}" for i in range(60))),
                (2, " ".join(f"bb{i}" for i in range(60))),
            ],
        )
    ).collect()
    h1 = {r.fp_hash for r in fps if r.doc_id == 1}
    h2 = {r.fp_hash for r in fps if r.doc_id == 2}
    assert h1 and h2 and not (h1 & h2)


def test_density_and_position_validity(spark):
    """Selected fingerprints per doc ≈ 2/(W+1) of windows (paper §3);
    gate loosely. Positions must be valid shingle indices and the
    selected hash must be reproducible from its own shingle."""
    import hashlib

    text = " ".join(f"tok{i % 37}x{i % 11}" for i in range(300))
    rows = _fingerprints(_docs(spark, [(1, text)])).collect()
    toks = text.split(" ")
    n_sh = len(toks) - WINNOW_K + 1
    n_win = n_sh - WINNOW_W + 1
    assert 1 <= len(rows) <= n_win
    # every window must be covered by a selection at distance < W
    sel = sorted(r.fp_pos for r in rows)
    for i in range(n_win):
        assert any(i <= p < i + WINNOW_W for p in sel), f"window {i} uncovered"
    for r in rows:
        assert 0 <= r.fp_pos < n_sh
        shingle = " ".join(toks[r.fp_pos : r.fp_pos + WINNOW_K])
        h40 = int(hashlib.md5(shingle.encode()).hexdigest()[:10], 16)
        assert r.fp_hash == h40, "fp_hash does not hash its own shingle"


def test_rightmost_tiebreak(spark):
    """All-identical tokens → every shingle hashes equal; the paper's
    tie rule selects the RIGHTMOST minimum, so each full window selects
    its last position and the selection set is exactly those."""
    text = " ".join(["same"] * (WINNOW_K + WINNOW_W + 3))  # 12 tokens
    rows = _fingerprints(_docs(spark, [(1, text)])).collect()
    n_sh = (WINNOW_K + WINNOW_W + 3) - WINNOW_K + 1  # 9 shingles
    n_win = n_sh - WINNOW_W + 1  # 5 full windows
    # window starting at i selects position i+W-1 (rightmost of ties)
    want = {i + WINNOW_W - 1 for i in range(n_win)}
    assert {r.fp_pos for r in rows} == want


def _python_winnow(tokens):
    """Independent reference: the paper's algorithm verbatim — window
    min over the 40-bit shingle hashes, rightmost tie-break — with a
    monotonic deque, no packing, no segmentation."""
    import hashlib
    from collections import deque

    n_sh = len(tokens) - WINNOW_K + 1
    hashes = [
        int(
            hashlib.md5(" ".join(tokens[i : i + WINNOW_K]).encode()).hexdigest()[:10],
            16,
        )
        for i in range(n_sh)
    ]
    sel = set()
    dq = deque()  # positions, hashes increasing; ties keep the RIGHT one
    for i in range(n_sh):
        while dq and hashes[dq[-1]] >= hashes[i]:
            dq.pop()
        dq.append(i)
        start = i - WINNOW_W + 1
        if dq[0] < start:
            dq.popleft()
        if start >= 0:
            sel.add((dq[0], hashes[dq[0]]))
    return sel


def test_long_document_crosses_segment_boundary(spark):
    """The r9 latent defect: a document with more than 2^20 shingles
    used to underflow the packed 20-bit position complement, silently
    and identically in both engines. The segment-local layout must make
    winnowing exact for unbounded length — verified here against an
    independent pure-Python reference on a doc that spans the _SEG
    boundary (so both the replicated overlap rows and the global
    position decode are exercised)."""
    from cdc_stream_batch_etl_spark.text.winnow import _SEG

    n_tokens = _SEG + 2000 + WINNOW_K - 1  # n_shingles = _SEG + 2000 > 2^20 - W
    tokens = [f"t{i % 251}v{i % 97}" for i in range(n_tokens)]
    expected = _python_winnow(tokens)
    rows = _fingerprints(_docs(spark, [(1, " ".join(tokens))])).collect()
    got = {(r.fp_pos, r.fp_hash) for r in rows}
    # exact equality: selections on both sides of the segment boundary,
    # decoded to global positions, match the unsegmented reference
    assert got == expected
    assert max(p for p, _ in got) >= _SEG, "no selection beyond the boundary"


def test_match_pairs_finds_planted_passage(spark, sf_dir, tmp_path):
    """Plant two documents sharing a long passage into a copy of the
    real documents table: winnow_match_pairs must surface exactly that
    pair among the planted ids with ≥ MIN_SHARED shared fingerprints."""
    import os

    passage = " ".join(f"plagiarized{i}" for i in range(60))
    planted = [
        (9_000_001, "intro words here " * 8 + passage, "en", "plant", 1),
        (9_000_002, passage + " totally different tail " * 8, "en", "plant", 1),
        (9_000_003, " ".join(f"clean{i}" for i in range(80)), "en", "plant", 1),
    ]
    src = pq.read_table(f"{sf_dir}/documents.parquet")
    extra = pa.table(
        {
            "doc_id": pa.array([r[0] for r in planted], pa.int64()),
            "text": pa.array([r[1] for r in planted], pa.string()),
            "lang": pa.array([r[2] for r in planted], pa.string()),
            "source": pa.array([r[3] for r in planted], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in planted], pa.int64()),
        }
    )
    planted_dir = tmp_path / "planted"
    planted_dir.mkdir()
    pq.write_table(
        pa.concat_tables([src.select(extra.column_names), extra]),
        str(planted_dir / "documents.parquet"),
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", planted_dir / f"{t}.parquet")

    pairs = {
        (r.doc_a, r.doc_b): r.shared_fps
        for r in winnow_match_pairs(spark, str(planted_dir)).collect()
    }
    assert (9_000_001, 9_000_002) in pairs
    assert pairs[(9_000_001, 9_000_002)] >= MIN_SHARED
    assert not any(9_000_003 in p for p in pairs)

    # span localization: the reported bracket must cover (a slice of)
    # the planted passage at its ACTUAL token offsets in each document —
    # doc 1 carries it after a 24-token intro, doc 2 at position 0
    from cdc_stream_batch_etl_spark.text.winnow import winnow_match_spans

    spans = {
        (r.doc_a, r.doc_b): r
        for r in winnow_match_spans(spark, str(planted_dir)).collect()
    }
    s = spans[(9_000_001, 9_000_002)]
    a_intro = len(("intro words here " * 8).split())  # passage offset in doc a
    passage_len = 60
    assert a_intro <= s.a_start_tok <= s.a_end_tok < a_intro + passage_len
    assert 0 <= s.b_start_tok <= s.b_end_tok < passage_len
    # the bracket must cover most of the shared passage, not one point
    assert s.a_end_tok - s.a_start_tok >= passage_len // 2
    assert s.shared_fps == pairs[(9_000_001, 9_000_002)]


def test_random_corpus_matches_python_reference(spark):
    """Randomized parity sweep: 20 documents with adversarial lengths
    (below/at/above the full-window threshold) and a small alphabet
    (forces hash ties, exercising the rightmost tie-break) must match
    the paper-verbatim pure-Python reference exactly."""
    import random

    rng = random.Random(4099)
    lengths = [1, WINNOW_K - 1, WINNOW_K, WINNOW_K + WINNOW_W - 2,
               WINNOW_K + WINNOW_W - 1, WINNOW_K + WINNOW_W] + [
        rng.randint(1, 120) for _ in range(14)
    ]
    docs = [
        (i + 1, " ".join(rng.choice("abcd") for _ in range(n)))
        for i, n in enumerate(lengths)
    ]
    rows = _fingerprints(_docs(spark, docs)).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    for doc_id, text in docs:
        toks = text.split(" ")
        n_sh = len(toks) - WINNOW_K + 1
        want = _python_winnow(toks) if n_sh >= WINNOW_W else set()
        assert got.get(doc_id, set()) == want, f"doc {doc_id} (len {len(toks)})"

"""Content-defined chunking contracts (text/cdchunk.py): the
boundary-shift-resistance property that distinguishes it from
fixed-stride chunking, chunk-extent integrity, and the dedup report's
arithmetic."""

from pyspark.sql import functions as F

import hashlib

from cdc_stream_batch_etl_spark.text.cdchunk import (
    CDC_DIV,
    CDC_K,
    CDC_MAX,
    CDC_MIN,
    _chunked,
)


def _py_candidates(toks):
    """Candidate content cuts, independently of Spark/DuckDB."""
    out = []
    for i in range(2, len(toks) - CDC_K + 2):  # 1-based cut positions
        h = int(hashlib.md5(" ".join(toks[i - 1 : i - 1 + CDC_K]).encode()).hexdigest()[:10], 16)
        if h % CDC_DIV == 0:
            out.append(i)
    return out


def _py_chunks(toks):
    """Pure-Python reference of the full rule: candidates →
    MIN-suppression vs previous ORIGINAL candidate → MAX-split."""
    cand = _py_candidates(toks)
    kept = [c for j, c in enumerate(cand) if c - (1 if j == 0 else cand[j - 1]) >= CDC_MIN]
    cuts = [1] + kept + [len(toks) + 1]
    chunks = []
    for a, b in zip(cuts, cuts[1:]):
        s = a
        while s < b:
            n = min(CDC_MAX, b - s)
            chunks.append((len(chunks), s, n, " ".join(toks[s - 1 : s - 1 + n])))
            s += n
    return chunks


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _base_text(n=400):
    # varied tokens so boundary hashes are well distributed
    return " ".join(f"w{(i * 37) % 101}q{i % 13}" for i in range(n))


def test_extents_partition_the_document(spark):
    text = _base_text()
    n = len(text.split(" "))
    rows = sorted(
        _chunked(_docs(spark, [(1, text)])).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert rows[0].start_tok == 1
    covered = 0
    for i, r in enumerate(rows):
        assert r.chunk_idx == i
        assert r.start_tok == covered + 1
        assert r.n_tokens >= 1
        covered += r.n_tokens
    assert covered == n, "chunks must tile the document exactly"
    # expected chunk length ≈ CDC_DIV — loose 4x band
    assert n / (4 * CDC_DIV) <= len(rows) <= 4 * n / CDC_DIV


def test_edit_preserves_downstream_chunks(spark):
    """THE content-defined property: prepending tokens shifts every
    fixed-stride chunk, but content-defined boundaries realign — the
    edited copy must SHARE most chunk hashes with the original."""
    base = _base_text()
    edited = "inserted tokens up front " + base
    rows = _chunked(_docs(spark, [(1, base), (2, edited)])).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    shared = len(h1 & h2) / len(h1)
    assert shared >= 0.7, (
        f"only {shared:.0%} of chunks survived a front edit — "
        "boundaries are not content-defined"
    )
    # sanity: fixed-stride on the same pair shares ~nothing
    stride = CDC_DIV

    def stride_hashes(text):
        toks = text.split(" ")
        return {
            " ".join(toks[i : i + stride])
            for i in range(0, len(toks), stride)
        }

    fixed_shared = stride_hashes(base) & stride_hashes(edited)
    assert len(fixed_shared) <= 1, "fixture too tame to demonstrate the property"


def test_identical_docs_fully_dedup(spark):
    text = _base_text(200)
    rows = _chunked(_docs(spark, [(1, text), (2, text)])).collect()
    h1 = sorted((r.chunk_idx, r.chunk_hash) for r in rows if r.doc_id == 1)
    h2 = sorted((r.chunk_idx, r.chunk_hash) for r in rows if r.doc_id == 2)
    assert h1 == h2


def test_dedup_report_arithmetic(spark, sf_dir):
    from cdc_stream_batch_etl_spark.text.cdchunk import chunk_dedup_report

    rows = chunk_dedup_report(spark, sf_dir).collect()
    assert rows, "sf fixture has exact-dup docs; report must be non-vacuous"
    for r in rows:
        assert r.n_copies >= 2
        assert 1 <= r.n_docs <= r.n_copies
        assert r.dup_tokens == (r.n_copies - 1) * r.n_tokens


def test_boundary_free_document_is_max_split(spark):
    """The r10 planted worst case: a document whose content predicate
    never fires used to come back as ONE whole-doc chunk (no sub-doc
    dedup possible). The MAX-split must bound every chunk at CDC_MAX."""
    # a single repeated token has one distinct shingle; pick one whose
    # hash does NOT divide, so the doc is provably boundary-free
    tok = next(
        t
        for t in "abcdefghijklmnop"
        if int(hashlib.md5((" ".join([t] * CDC_K)).encode()).hexdigest()[:10], 16)
        % CDC_DIV
        != 0
    )
    n = 200
    rows = sorted(
        _chunked(_docs(spark, [(1, " ".join([tok] * n))])).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert len(rows) == -(-n // CDC_MAX)  # ceil(200/64) = 4
    assert all(r.n_tokens <= CDC_MAX for r in rows)
    assert [r.start_tok for r in rows] == list(range(1, n + 1, CDC_MAX))


def test_bounds_match_python_reference(spark):
    """Full-rule parity vs an independent reference on a document that
    exercises BOTH bounds: a varied head (content cuts, some < MIN
    apart), a long repeated run (boundary-free → forced MAX splits),
    and a varied tail."""
    rep = next(
        t
        for t in "abcdefghijklmnop"
        if int(hashlib.md5((" ".join([t] * CDC_K)).encode()).hexdigest()[:10], 16)
        % CDC_DIV
        != 0
    )
    toks = (
        [f"w{(i * 37) % 101}q{i % 13}" for i in range(500)]
        + [rep] * 150
        + [f"z{(i * 53) % 89}" for i in range(200)]
    )
    ref = _py_chunks(toks)
    # the fixture must actually exercise both rules
    cand = _py_candidates(toks)
    assert any(
        c - (1 if j == 0 else cand[j - 1]) < CDC_MIN for j, c in enumerate(cand)
    ), "fixture has no MIN-suppressed candidate — make the head longer"
    assert any(n == CDC_MAX for _, _, n, _ in ref), "fixture forces no MAX split"
    rows = sorted(
        _chunked(_docs(spark, [(1, " ".join(toks))])).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.chunk_idx, r.start_tok, r.n_tokens) for r in rows] == [
        (i, s, n) for i, s, n, _ in ref
    ]
    assert all(r.n_tokens <= CDC_MAX for r in rows)


def test_chunk_ledger_composes_with_report(spark, sf_dir, tmp_path):
    """The ledger's per-document reclaim must total the report's
    corpus-wide dup_tokens (same canonical-first convention), and a
    planted exact-dup document's reclaim must cover all its chunks."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdc_stream_batch_etl_spark.text.cdchunk import (
        chunk_dedup_ledger,
        chunk_dedup_report,
    )

    # plant one byte-identical copy of an existing document (the sf
    # fixtures have chunk-level dups but no whole-doc exact dups)
    src = pq.read_table(f"{sf_dir}/documents.parquet")
    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    first = {c: src.column(c)[0].as_py() for c in cols}
    extra = pa.table(
        {
            "doc_id": pa.array([9_000_001], pa.int64()),
            "text": pa.array([first["text"]], pa.string()),
            "lang": pa.array([first["lang"]], pa.string()),
            "source": pa.array([first["source"]], pa.string()),
            "n_chars": pa.array([first["n_chars"]], pa.int64()),
        }
    )
    planted_dir = tmp_path / "planted"
    planted_dir.mkdir()
    pq.write_table(
        pa.concat_tables([src.select(cols), extra]),
        str(planted_dir / "documents.parquet"),
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        os.symlink(f"{sf_dir}/{t}.parquet", planted_dir / f"{t}.parquet")

    ledger = chunk_dedup_ledger(spark, str(planted_dir)).collect()
    report = chunk_dedup_report(spark, str(planted_dir)).collect()
    assert sum(r.reclaim_tokens for r in ledger) == sum(
        r.dup_tokens for r in report
    )
    for r in ledger:
        assert 0 <= r.dup_chunks <= r.n_chunks
        assert 0 <= r.reclaim_tokens <= r.total_tokens
        assert abs(r.reclaim_ratio - r.reclaim_tokens / r.total_tokens) < 1e-12
    # the planted copy is an exact dup: every chunk already exists in
    # its lower-doc_id twin, so the whole document is reclaimable
    by_id = {r.doc_id: r for r in ledger}
    planted = by_id[9_000_001]
    assert planted.removed_exact
    assert planted.reclaim_tokens == planted.total_tokens
    assert planted.dup_chunks == planted.n_chunks


def test_short_documents_single_chunk(spark):
    # shorter than the shingle: no boundary candidates, one whole chunk
    rows = _chunked(_docs(spark, [(1, "a b"), (2, "solo")])).collect()
    per = {r.doc_id: r for r in rows}
    assert len(rows) == 2
    assert per[1].n_tokens == 2 and per[1].start_tok == 1
    assert per[2].n_tokens == 1


def test_random_corpus_matches_python_reference(spark):
    """Randomized parity sweep: 30 documents with adversarial lengths
    (empty-ish, sub-shingle, exact-boundary, long) from a small alphabet
    (forces dense candidate cuts and MIN-suppression runs) must match
    the pure-Python reference row-for-row."""
    import random

    rng = random.Random(1009)
    lengths = [1, 2, 3, CDC_K, CDC_K + 1, 2 * CDC_MAX, 200] + [
        rng.randint(1, 300) for _ in range(23)
    ]
    docs = [
        (i + 1, " ".join(rng.choice("abcdefgh") for _ in range(n)))
        for i, n in enumerate(lengths)
    ]
    rows = _chunked(_docs(spark, docs)).collect()
    got = sorted((r.doc_id, r.chunk_idx, r.start_tok, r.n_tokens) for r in rows)
    want = sorted(
        (doc_id, i, s, n)
        for doc_id, text in docs
        for i, s, n, _ in _py_chunks(text.split(" "))
    )
    assert got == want

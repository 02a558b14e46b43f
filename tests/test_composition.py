"""Semantic invariants for the corpus-composition and decontamination
operators (their oracle rows pin value-parity; these pin the semantics)."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.text import composition as comp_mod
from cdc_stream_batch_etl_spark.text import decontam as dec_mod
from cdc_stream_batch_etl_spark.text.composition import (
    BASE_KEEP_RATE,
    PACK_BUDGET,
    lang_temperature_sample,
    pack_sequences,
)
from cdc_stream_batch_etl_spark.text.decontam import (
    BOILER_MIN_DOCS,
    boilerplate_ratio,
    ngram_contamination,
)


def test_pack_sequences_bins_contiguous_and_filled(spark, sf_dir):
    rows = pack_sequences(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r.bin)
        # bin ids are dense from 0
        assert [b.bin for b in bins] == list(range(len(bins)))
        # doc ranges never interleave between consecutive bins
        for a, b in zip(bins, bins[1:]):
            assert a.last_doc_id < b.first_doc_id
        # every non-final bin fills its budget (a doc may straddle out,
        # so the bin that OWNS the straddling doc can exceed 1.0; it can
        # only undershoot by less than one doc)
        for b in bins[:-1]:
            assert b.fill_ratio >= 0.9, (source, b)
        assert all(b.bin_tokens == round(b.fill_ratio * PACK_BUDGET) for b in bins)


def test_temperature_sample_rates_and_determinism(spark, sf_dir):
    out = lang_temperature_sample(spark, sf_dir)
    rates = {
        r.lang: (r.n_lang_docs, r.keep_rate)
        for r in out.select("lang", "n_lang_docs", "keep_rate").distinct().collect()
    }
    n_max = max(n for n, _ in rates.values())
    for lang, (n, rate) in rates.items():
        if n == n_max:
            assert rate == BASE_KEEP_RATE
        else:
            assert BASE_KEEP_RATE < rate <= 1.0
    # content-addressed: the kept set is identical under repartitioning
    a = {r.doc_id for r in out.filter("kept").collect()}
    b = {r.doc_id for r in out.repartition(13, "lang").filter("kept").collect()}
    assert a == b


def test_ngram_contamination_flags_verbatim_leak(spark, sf_dir, monkeypatch):
    """A test-split doc that verbatim-copies a train-split doc must be
    contaminated; an unrelated doc must not be."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # md5 buckets: doc 1 -> train, docs 0 and 9 -> test
    docs = spark.createDataFrame(
        [
            (1, base, "en", "src0", len(base)),
            (0, base, "en", "src0", len(base)),
            (9, "one two three four five six seven eight nine ten", "en", "src0", 49),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(dec_mod, "load_table", lambda spark, sf, name: docs)
    out = {r.doc_id: r for r in ngram_contamination(spark, sf_dir).collect()}
    assert set(out) == {0, 9}  # doc 1 is train-side, not audited
    assert out[0].is_contaminated and out[0].overlap_ratio == 1.0
    assert not out[9].is_contaminated and out[9].n_overlap == 0


def test_boilerplate_ratio_detects_shared_template(spark, sf_dir, monkeypatch):
    """A 3-gram shared by >= BOILER_MIN_DOCS docs counts as boilerplate;
    unique content does not."""
    template = "all rights reserved"
    rows = [
        (i, f"{template} unique{i} content{i} words{i}", "en", "src0", 40)
        for i in range(BOILER_MIN_DOCS)
    ]
    rows.append((999, "totally unique document body here now", "en", "src0", 37))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    monkeypatch.setattr(dec_mod, "load_table", lambda spark, sf, name: docs)
    out = {r.doc_id: r for r in boilerplate_ratio(spark, sf_dir).collect()}
    assert out[0].n_boiler == 1  # exactly the template 3-gram
    assert out[0].boiler_ratio > 0
    assert out[999].n_boiler == 0


def test_contamination_real_corpus_has_signal(spark, sf_dir):
    out = ngram_contamination(spark, sf_dir)
    agg = out.agg(
        F.sum(F.when(F.col("is_contaminated"), 1).otherwise(0)).alias("bad"),
        F.count("*").alias("n"),
        F.max("overlap_ratio").alias("mx"),
        F.min("overlap_ratio").alias("mn"),
    ).first()
    assert agg.n > 0 and 0.0 <= agg.mn and agg.mx <= 1.0
    assert agg.bad > 0  # the corpus's planted dups cross the split


def test_packing_waste_curve_planted(spark):
    """Hand-computed curve on three docs of 100/200/50 tokens."""
    import cdc_stream_batch_etl_spark.text.composition as comp

    docs = spark.createDataFrame(
        [
            (1, "s", " ".join(["w"] * 100)),
            (2, "s", " ".join(["w"] * 200)),
            (3, "s", " ".join(["w"] * 50)),
        ],
        "doc_id bigint, source string, text string",
    )
    orig = comp.load_table
    try:
        comp.load_table = lambda s, d, t: docs  # noqa: ARG005
        out = {r.ctx_len: r for r in comp.packing_waste_curve(spark, "x").collect()}
    finally:
        comp.load_table = orig
    r = out[128]
    assert r.n_docs == 3 and r.total_tokens == 350
    # ceil(100/128)+ceil(200/128)+ceil(50/128) = 1+2+1
    assert r.padded_seqs == 4 and r.pad_waste == 4 * 128 - 350
    assert r.pad_waste_share == (4 * 128 - 350) / (4 * 128)
    assert r.trunc_docs == 1  # the 200-token doc
    assert r.trunc_loss_share == (200 - 128) / 350
    assert r.packed_seqs == 3  # ceil(350/128)
    # starts 0/100/300: only the 200-token doc crosses a 128 boundary
    assert r.straddled_docs == 1 and r.straddle_share == 1 / 3
    r2 = out[2048]
    assert r2.padded_seqs == 3 and r2.packed_seqs == 1
    assert r2.straddled_docs == 0 and r2.trunc_docs == 0

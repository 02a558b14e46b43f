#!/usr/bin/env python
"""Generate a REAL sf1.0 (10x sf0.1) benchmark dataset with FRESH
combinations — the r10 verdict's #4 ask: every scale claim so far
extrapolates from sf0.1×N replication, which provably distorts
dup/graph structure (a replicated corpus makes every doc an N-way
near-dup; replicated baskets multiply co-purchase support). This
generator instead RESAMPLES the sf0.1 marginal/joint distributions
with fresh keys, so duplicate clusters, co-purchase combinations, and
key fan-outs grow the way a real corpus grows.

Methodology per table (sf0.1 measured values in parentheses):
- dimension tables (customer, supplier, part): attribute TUPLES
  resampled with replacement (intra-row joints preserved), fresh
  sequential keys, names re-derived from the key.
- orders: (status, totalprice, priority) tuples resampled; custkey
  uniform over the 10x customer space; orderdate uniform over the
  measured [1995-01-01, 2001-08-01] window.
- lineitem: per-order basket size from the measured empirical
  distribution (~Poisson(4)-ish, 1..17); line attribute tuples
  (qty, price, discount, tax, flags, shipdate) resampled jointly;
  partkey/suppkey uniform over the 10x spaces (measured part
  popularity is binomial-uniform, not skewed).
- events: (event_type, value, props) tuples resampled; user_id
  uniform over 10x users; ts uniform over the measured 30-day window.
- documents: per-lang 31-word unigram model with measured word
  frequencies and lang x source joint; doc length resampled from the
  measured word-count distribution (10..100, mean 54). Duplicate
  structure planted at the measured per-capita rate: ~4.7% of docs
  are copies of an earlier same-lang doc (sf0.1: 461 of 5000 docs sit
  in shared-prefix groups), of which ~3% verbatim (sf0.1: 8 exact
  dups) and the rest word-perturbed after a preserved prefix.
- embeddings: per-label (10 labels) per-dim (64) Gaussian fit to the
  sf0.1 vectors, sampled fresh.

Output: $OUT (default /root/repo/benchdata/sf1), one parquet per
table; region/nation pass through unchanged (structural constants).
Deterministic: numpy default_rng(20260816).

Usage: python scripts/gen_sf1.py [scale] (default 10 = sf1.0)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/benchdata/sf1")

rng = np.random.default_rng(20260816)


def read(t: str) -> pd.DataFrame:
    return pq.read_table(f"{BASE}/{t}.parquet").to_pandas()


def write(t: str, df: pd.DataFrame, schema: pa.Schema | None = None) -> None:
    os.makedirs(OUT, exist_ok=True)
    # pandas datetimes default to ns; the driver's parquet carries
    # TIMESTAMP(MICROS) and several query paths cast through DATE —
    # normalize so the physical type matches the real fixtures
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, f"{OUT}/{t}.parquet")
    print(f"{t}: {len(df):,} rows")


def resample(df: pd.DataFrame, n: int, cols: list[str]) -> pd.DataFrame:
    idx = rng.integers(0, len(df), n)
    return df.iloc[idx][cols].reset_index(drop=True)


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    # structural constants: pass through
    for t in ("region", "nation"):
        write(t, read(t))

    # --- dimensions -------------------------------------------------
    cust = read("customer")
    n_cust = len(cust) * scale
    c = resample(cust, n_cust, ["c_nationkey", "c_acctbal", "c_mktsegment"])
    c.insert(0, "c_custkey", np.arange(n_cust, dtype=np.int64))
    c.insert(1, "c_name", [f"Customer#{i:09d}" for i in range(n_cust)])
    write("customer", c)

    supp = read("supplier")
    n_supp = len(supp) * scale
    s = resample(supp, n_supp, ["s_nationkey", "s_acctbal"])
    s.insert(0, "s_suppkey", np.arange(n_supp, dtype=np.int64))
    s.insert(1, "s_name", [f"Supplier#{i:09d}" for i in range(n_supp)])
    write("supplier", s)

    part = read("part")
    n_part = len(part) * scale
    p = resample(part, n_part, ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
    p.insert(0, "p_partkey", np.arange(n_part, dtype=np.int64))
    write("part", p)

    # --- orders + lineitem ------------------------------------------
    orders = read("orders")
    n_ord = len(orders) * scale
    o = resample(orders, n_ord, ["o_orderstatus", "o_totalprice", "o_orderpriority"])
    o.insert(0, "o_orderkey", np.arange(n_ord, dtype=np.int64))
    o.insert(1, "o_custkey", rng.integers(0, n_cust, n_ord))
    lo, hi = orders["o_orderdate"].min(), orders["o_orderdate"].max()
    span_s = int((hi - lo).total_seconds())
    o["o_orderdate"] = lo + pd.to_timedelta(rng.integers(0, span_s, n_ord), unit="s")
    o = o[["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]]
    write("orders", o)

    li = read("lineitem")
    basket = li.groupby("l_orderkey").size()
    sizes = rng.choice(basket.to_numpy(), n_ord)  # empirical basket dist
    n_li = int(sizes.sum())
    okeys = np.repeat(o["o_orderkey"].to_numpy(), sizes)
    linenos = np.concatenate([np.arange(1, k + 1) for k in sizes]).astype(np.int32)
    attrs = resample(
        li, n_li,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
         "l_returnflag", "l_linestatus", "l_shipdate"],
    )
    l = pd.DataFrame(
        {
            "l_orderkey": okeys,
            "l_partkey": rng.integers(0, n_part, n_li),
            "l_suppkey": rng.integers(0, n_supp, n_li),
            "l_linenumber": linenos,
        }
    )
    l = pd.concat([l, attrs], axis=1)[
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
         "l_linestatus", "l_shipdate"]
    ]
    write("lineitem", l)

    # --- events ------------------------------------------------------
    ev = read("events")
    n_ev = len(ev) * scale
    e = resample(ev, n_ev, ["event_type", "value", "props"])
    e.insert(0, "event_id", np.arange(n_ev, dtype=np.int64))
    lo, hi = ev["ts"].min(), ev["ts"].max()
    span_s = int((hi - lo).total_seconds())
    e.insert(1, "ts", lo + pd.to_timedelta(rng.integers(0, span_s * 1000, n_ev), unit="ms"))
    n_users = (int(ev["user_id"].max()) + 1) * scale
    e.insert(2, "user_id", rng.integers(0, n_users, n_ev))
    e = e[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    write("events", e)

    # --- documents ----------------------------------------------------
    docs = read("documents")
    n_doc = len(docs) * scale
    langsrc = docs[["lang", "source"]]
    # per-lang unigram model + word-count empirical
    vocab: dict[str, tuple[list[str], np.ndarray]] = {}
    wc: dict[str, np.ndarray] = {}
    for lang, grp in docs.groupby("lang"):
        words = pd.Series(" ".join(grp["text"]).split(" "))
        freq = words.value_counts()
        vocab[lang] = (freq.index.tolist(), (freq / freq.sum()).to_numpy())
        wc[lang] = grp["text"].str.split(" ").str.len().to_numpy()
    COPY_RATE = 461 / 5000 / 2  # docs that are copies of an earlier doc
    EXACT_SHARE = 8 / 233       # of which verbatim
    ls = resample(langsrc, n_doc, ["lang", "source"])
    texts: list[str] = []
    by_lang_idx: dict[str, list[int]] = {k: [] for k in vocab}
    copy_flags = rng.random(n_doc)
    for i in range(n_doc):
        lang = ls["lang"].iloc[i]
        words_, probs = vocab[lang]
        prior = by_lang_idx[lang]
        if prior and copy_flags[i] < COPY_RATE:
            src_text = texts[prior[rng.integers(0, len(prior))]]
            if rng.random() < EXACT_SHARE:
                texts.append(src_text)
            else:
                toks = src_text.split(" ")
                # perturb after a preserved prefix — the measured
                # shared-prefix near-dup shape
                for j in range(12, len(toks)):
                    if rng.random() < 0.1:
                        toks[j] = words_[rng.choice(len(words_), p=probs)]
                texts.append(" ".join(toks))
        else:
            n_w = int(rng.choice(wc[lang]))
            texts.append(" ".join(np.asarray(words_)[rng.choice(len(words_), n_w, p=probs)]))
        by_lang_idx[lang].append(i)
    d = pd.DataFrame(
        {
            "doc_id": np.arange(n_doc, dtype=np.int64),
            "text": texts,
            "lang": ls["lang"].to_numpy(),
            "source": ls["source"].to_numpy(),
        }
    )
    d["n_chars"] = d["text"].str.len().astype(np.int64)
    write("documents", d)

    # --- embeddings ---------------------------------------------------
    emb = read("embeddings")
    dim = len(emb["embedding"].iloc[0])
    n_emb = len(emb) * scale
    labels = rng.choice(emb["label"].to_numpy(), n_emb)
    mats = {
        lab: np.stack(grp["embedding"].to_numpy())
        for lab, grp in emb.groupby("label")
    }
    stats = {lab: (m.mean(axis=0), m.std(axis=0)) for lab, m in mats.items()}
    vecs = np.empty((n_emb, dim), dtype=np.float32)
    for lab, (mu, sd) in stats.items():
        mask = labels == lab
        vecs[mask] = rng.normal(mu, sd, (int(mask.sum()), dim)).astype(np.float32)
    et = pa.table(
        {
            "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(labels.astype(np.int32)),
        }
    )
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(et, f"{OUT}/embeddings.parquet")
    print(f"embeddings: {n_emb:,} rows")

    with open(f"{OUT}/MANIFEST.json", "w") as f:
        json.dump({"scale_vs_sf01": scale, "seed": 20260816, "base": BASE}, f)
    print("done:", OUT)


if __name__ == "__main__":
    main()

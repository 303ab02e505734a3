"""Curation tranche 3: compression signal pinned bit-exact against
direct zlib; DSIR resampling pinned against a pure-Python replica."""

from __future__ import annotations

import hashlib
import zlib

import pyarrow.parquet as pq

from etl_lens_spark.queries import all_queries

SF = "/root/testdata/sf0.001"


def _docs():
    t = pq.read_table(f"{SF}/documents.parquet")
    return t.to_pandas()


def test_compression_signals_exact_vs_zlib(spark):
    out = {
        r.source: r
        for r in all_queries()["text_compression_signals"](
            spark, SF
        ).collect()
    }
    pdf = _docs()
    for source, grp in pdf.groupby("source"):
        raw = [t.encode("utf-8") for t in grp["text"]]
        comp = [len(zlib.compress(b, 6)) for b in raw]
        r = out[source]
        assert r.n_docs == len(raw)
        assert r.raw_bytes == sum(len(b) for b in raw)
        assert r.comp_bytes == sum(comp)
        assert r.n_repetitive == sum(
            1 for b, c in zip(raw, comp) if c * 10000 / len(b) < 3000
        )
        assert r.n_incompressible == sum(
            1 for b, c in zip(raw, comp) if c * 10000 / len(b) > 9000
        )


def _bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:6], 16) % 256


def test_dsir_resample_matches_python_replica(spark):
    rows = all_queries()["curate_dsir_resample"](spark, SF).collect()
    pdf = _docs()
    t_counts: dict[int, int] = {}
    r_counts: dict[int, int] = {}
    doc_toks = {}
    for _, row in pdf.iterrows():
        toks = [t for t in row["text"].split(" ") if t]
        doc_toks[row["doc_id"]] = (row["source"], toks)
        for t in toks:
            b = _bucket(t)
            r_counts[b] = r_counts.get(b, 0) + 1
            if row["source"] == "src0":
                t_counts[b] = t_counts.get(b, 0) + 1
    scored = []
    for doc_id, (source, toks) in doc_toks.items():
        s = sum(
            (t_counts.get(_bucket(t), 0) + 1)
            * 1_000_000
            // (r_counts[_bucket(t)] + 1)
            for t in toks
        )
        scored.append((doc_id, source, len(toks), s))
    scored.sort(key=lambda x: (-x[3], x[0]))
    expect = scored[:200]
    got = [(r.doc_id, r.source, r.n_tokens, r.score) for r in rows]
    assert got == expect


def test_dsir_enriches_target_source(spark):
    rows = all_queries()["curate_dsir_resample"](spark, SF).collect()
    pdf = _docs()
    corpus_frac = (pdf["source"] == "src0").mean()
    kept_frac = sum(1 for r in rows if r.source == "src0") / len(rows)
    assert kept_frac >= corpus_frac

"""End-to-end curation pipeline (operators/curate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.curate import curate_corpus


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_full_pipeline_on_crafted_corpus(spark):
    run_ = "a b c d e f g h"  # 8 tokens, shared by docs 1 and 2
    filler = " ".join(f"w{i}" for i in range(12))
    docs = _mk(
        spark,
        [
            (0, filler + " " + run_),                 # clean, first span owner
            (1, run_ + " " + " ".join(f"x{i}" for i in range(12))),  # span dup
            (2, filler + " " + run_),                 # exact dup of 0
            (3, "contact me mail@example.com now "
                + " ".join(f"y{i}" for i in range(12))),              # pii
            (4, "t1 t2 t3"),                          # too short after floor
        ],
    )
    res = curate_corpus(docs, span=8, min_tokens=10, chunk_tokens=8, chunk_overlap=2)
    audit = res.audit()
    assert audit["input"] == 5
    assert audit["pii_scrubbed"] == 5  # scrub redacts, doesn't drop by default
    assert audit["exact_deduped"] == 4  # doc 2 dropped (dup of 0)
    assert audit["span_deduped"] == 3  # doc 4 below the floor
    # doc 3's email was redacted
    t3 = {r["doc_id"]: r["text"] for r in res.deduped.collect()}[3]
    assert "<EMAIL>" in t3 and "mail@example.com" not in t3
    # doc 1 lost its copied run but kept its own tail
    assert not t3 or "a b c" not in {r["doc_id"]: r["text"] for r in res.deduped.collect()}[1]
    # packing invariants: chunk ids unique, shard ids contiguous from 0
    packed = res.packed.collect()
    assert len({r["chunk_id"] for r in packed}) == len(packed)
    shard_ids = {r["shard_id"] for r in packed}
    assert min(shard_ids) == 0
    # conservation: every surviving token lands in exactly one chunk set
    total_chunk_tokens = sum(r["n_tokens"] for r in res.chunks.collect())
    assert total_chunk_tokens >= sum(
        len(r["text"].split()) for r in res.deduped.collect()
    )  # >= because overlap duplicates context tokens


def test_pii_hit_cap_drops_documents(spark):
    docs = _mk(
        spark,
        [
            (0, "a@b.co c@d.co e@f.co " + " ".join(f"w{i}" for i in range(10))),
            (1, " ".join(f"v{i}" for i in range(12))),
        ],
    )
    res = curate_corpus(docs, max_pii_hits=2, min_tokens=5, chunk_tokens=8, chunk_overlap=2)
    assert res.audit()["pii_scrubbed"] == 1


def test_classifier_floor_requires_scorer(spark):
    docs = _mk(spark, [(0, " ".join(f"w{i}" for i in range(12)))])
    with pytest.raises(ValueError):
        curate_corpus(docs, classifier_floor=0.5)


def test_classifier_floor_filters(spark):
    from jobcan_data_integrator_spark.operators.classifier import score_logreg

    docs = _mk(
        spark,
        [
            (0, " ".join(f"w{i}" for i in range(30))),
            (1, " ".join(f"v{i}" for i in range(11))),
        ],
    )
    base = curate_corpus(docs, min_tokens=5, chunk_tokens=8, chunk_overlap=2)
    assert base.audit()["quality_kept"] == 2

    def scorer(df):
        # features built on the POST-dedup text, then the fitted model
        # (hand weights here: bias 0, strongly positive on tokens/100)
        feat = df.withColumn("x0", F.lit(1.0)).withColumn(
            "x1", F.size(F.split("text", " ")).cast("double") / 100
        )
        return score_logreg(feat, ["x0", "x1"], [-2.0, 10.0])

    res = curate_corpus(
        docs,
        min_tokens=5,
        chunk_tokens=8,
        chunk_overlap=2,
        quality_scorer=scorer,
        classifier_floor=0.5,
    )
    # z = -2 + 10*tokens/100: doc 0 (30 tok) -> +1 -> 0.75; doc 1
    # (11 tok) -> -0.9 -> 0.26 — only doc 0 clears the 0.5 floor
    assert res.audit()["quality_kept"] == 1


def test_near_dup_stage_keeps_cluster_minimum(spark):
    from jobcan_data_integrator_spark.operators.minhash import (
        hashed_shingle_rows,
    )
    from jobcan_data_integrator_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    toks = [f"w{i}" for i in range(20)]
    near = list(toks)
    near[6], near[13] = "x6", "x13"  # longest shared run 6 < span=8
    docs = _mk(
        spark,
        [
            (0, " ".join(toks)),                        # canonical
            (1, " ".join(near)),                        # near-dup of 0
            (2, " ".join(f"z{i}" for i in range(15))),  # unrelated
        ],
    )

    def pairs(deduped):
        return ngram_jaccard_pairs(
            hashed_shingle_rows(deduped), min_common=8
        ).select("doc_a", "doc_b")

    res = curate_corpus(
        docs, min_tokens=5, chunk_tokens=8, chunk_overlap=2, near_dup_pairs=pairs
    )
    audit = res.audit()
    assert audit["span_deduped"] == 3
    assert audit["near_deduped"] == 2  # doc 1 collapsed into doc 0
    assert {r.doc_id for r in res.deduped.collect()} == {0, 2}


def test_line_clean_stage(spark):
    """line_clean=True runs the C4 line stage FIRST: block-substring
    lines and corpus-frequent boilerplate vanish before PII/dedup, and
    the stage is absent (and audit unchanged) by default."""
    banner = "Identical cookie-free banner on every single doc."
    body = " ".join(f"w{i}" for i in range(12))
    docs = _mk(
        spark,
        [
            (0, f"{banner}\n{body} zero"),
            (1, f"{banner}\n{body} one"),
            (2, f"{banner}\n{body} two"),
            (3, f"{{ json blob }}\n{body} three"),
        ],
    )
    res = curate_corpus(
        docs,
        min_tokens=5,
        line_clean=True,
        line_max_doc_freq=2,
        chunk_tokens=8,
        chunk_overlap=2,
    )
    audit = res.audit()
    assert audit["line_cleaned"] == 4
    lc = dict(res.stages)["line_cleaned"]
    texts = {r.doc_id: r.text for r in lc.select("doc_id", "text").collect()}
    assert all(banner not in t for t in texts.values())  # df 3 > 2
    assert "json blob" not in texts[3]  # brace line dropped in-row
    assert texts[0].endswith("zero")
    # default: no line stage in the audit
    assert "line_cleaned" not in curate_corpus(docs, min_tokens=5).audit()


def test_normalize_stage_collapses_render_variants(spark):
    """normalize=True runs before every hash: two byte-different
    renderings of one document exact-dedup to a single survivor."""
    body = " ".join(f"w{i}" for i in range(12))
    docs = _mk(
        spark,
        [
            (0, f"Ｃａｆé   ﬁne {body}"),
            (1, f"Café ﬁne {body}"),
            (2, f"a different document {body}"),
        ],
    )
    res = curate_corpus(
        docs, min_tokens=5, normalize=True, normalize_nfkc=True,
        chunk_tokens=8, chunk_overlap=2,
    )
    audit = res.audit()
    assert audit["normalized"] == 3
    assert audit["exact_deduped"] == 2  # doc 1 collapsed into doc 0
    # without normalization they stay distinct
    assert curate_corpus(docs, min_tokens=5).audit()["exact_deduped"] == 3

"""Token-budget shard packing: the prefix-sum semantics (oracle-gated in
tx_shard_packing) plus the deterministic shuffled-order mode training
pipelines actually use."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.packing import pack_shards

BUDGET = 100


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37 + 11, F.lit(45)) + 5).alias("n_tokens"),
    )


def _check_packing(rows, budget):
    """Validity of ANY packing: cum_before is the running sum in the
    emitted order, shard = cum_before div budget."""
    rows = sorted(rows, key=lambda r: r.cum_before)
    acc = 0
    for r in rows:
        assert r.cum_before == acc
        assert r.shard_id == acc // budget
        acc += r.n_tokens
    return acc


def test_id_order_packing_matches_definition(spark):
    rows = pack_shards(_docs(spark), budget=BUDGET).collect()
    total = _check_packing(rows, BUDGET)
    assert total == sum(r.n_tokens for r in rows)
    # id order: cum_before is monotone in doc_id
    by_id = sorted(rows, key=lambda r: r.doc_id)
    assert [r.cum_before for r in by_id] == sorted(r.cum_before for r in rows)


def test_shuffled_packing_is_valid_deterministic_permutation(spark):
    a = pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="epoch0").collect()
    b = pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="epoch0").collect()
    c = pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="epoch1").collect()
    ident = pack_shards(_docs(spark), budget=BUDGET).collect()

    # same doc set + token counts, valid prefix sum in the shuffled order
    _check_packing(a, BUDGET)
    assert {(r.doc_id, r.n_tokens) for r in a} == {(r.doc_id, r.n_tokens) for r in ident}
    # deterministic: same salt -> identical packing (no RNG state)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # a different salt and the id order both give a DIFFERENT permutation
    order = lambda rows: [r.doc_id for r in sorted(rows, key=lambda r: r.cum_before)]
    assert order(a) != order(ident)
    assert order(a) != order(c)


def test_shuffled_packing_has_no_global_window(spark):
    plan = (
        pack_shards(_docs(spark), budget=BUDGET, shuffle_salt="s")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_pathological_bucket_size_is_rejected(spark):
    # an explicit tiny bucket_size would collect one offset row per bucket
    # (range/bucket_size rows) — the guard fails loudly BEFORE the collect
    docs = _docs(spark, n=500_000)
    with pytest.raises(ValueError, match="bucket_size"):
        pack_shards(docs, budget=BUDGET, bucket_size=1)


def test_sane_explicit_bucket_size_still_packs(spark):
    rows = pack_shards(_docs(spark, n=200), budget=BUDGET, bucket_size=50).collect()
    _check_packing(rows, BUDGET)


# ---------------------------------------------------------------------------
# Sliding-window document chunking
# ---------------------------------------------------------------------------


def _chunk_py(text, max_tokens, overlap):
    toks = text.split(" ")
    stride = max_tokens - overlap
    out = []
    for s in range(0, len(toks), stride):
        out.append(
            (" ".join(toks[s : s + max_tokens]), len(toks[s : s + max_tokens]))
        )
        if s + max_tokens >= len(toks):
            break  # a further window would be contained in this chunk
    return out


def test_chunking_matches_python_replica(spark):
    from jobcan_data_integrator_spark.operators.packing import chunk_documents

    rows = [
        (1, "a b c d e f g h i j"),
        (2, "one two three"),
        (3, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for max_tokens, overlap in [(4, 0), (4, 2), (8, 3), (3, 1)]:
        got = {
            (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
            for r in chunk_documents(df, max_tokens, overlap).collect()
        }
        want = {
            (doc_id, i): chunk
            for doc_id, text in rows
            for i, chunk in enumerate(_chunk_py(text, max_tokens, overlap))
        }
        assert got == want, f"max={max_tokens} overlap={overlap}"


def test_chunking_covers_every_token_and_respects_overlap(spark, sf_dir):
    from pyspark.sql import functions as F

    from jobcan_data_integrator_spark.operators.packing import chunk_documents
    from jobcan_data_integrator_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_documents(docs, max_tokens=16, overlap=4).cache()
    # every chunk bounded; total tokens >= corpus tokens (overlap re-counts)
    assert out.filter(F.col("n_tokens") > 16).count() == 0
    corpus_toks = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("s")
    ).collect()[0].s
    chunk_toks = out.agg(F.sum("n_tokens")).collect()[0][0]
    assert chunk_toks >= corpus_toks
    # narrow plan: chunking itself introduces no shuffle
    plan = chunk_documents(docs, max_tokens=16, overlap=4)
    assert "Exchange" not in plan._jdf.queryExecution().executedPlan().toString()


def test_chunking_never_emits_contained_chunks(spark):
    """Regression: with overlap > 0, a window starting after the previous
    chunk already reached the document end is pure duplicate text."""
    from jobcan_data_integrator_spark.operators.packing import chunk_documents

    cases = [
        ("a b c d e f g h i j", 4, 2),  # 10 toks: starts 0,2,4,6 only (not 8)
        ("a b c d e", 4, 3),            # 5 toks: starts 0,1 only (not 2,3,4)
        ("a b c", 8, 4),                # shorter than one window: start 0 only
    ]
    for text, mx, ov in cases:
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        got = sorted(
            (r.chunk_idx, r.chunk_text)
            for r in chunk_documents(df, mx, ov).collect()
        )
        want = sorted(enumerate(c for c, _ in _chunk_py(text, mx, ov)))
        assert got == want, (text, mx, ov)
        # no chunk's token span is a subset of another's
        spans = []
        stride = mx - ov
        for i, _ in got:
            s = i * stride
            spans.append((s, min(s + mx, len(text.split(" ")))))
        for x in spans:
            for y in spans:
                assert x == y or not (y[0] <= x[0] and x[1] <= y[1]), spans


def test_chunking_rejects_non_advancing_window(spark):
    import pytest

    from jobcan_data_integrator_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, max_tokens=4, overlap=4)


# ---------------------------------------------------------------------------
# Source-weighted corpus mixing
# ---------------------------------------------------------------------------


def _mix_bucket(salt, source, doc_id):
    import hashlib

    h = hashlib.md5(f"{salt}|{source}|{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 10000


def test_mix_matches_python_replica(spark):
    from jobcan_data_integrator_spark.operators.packing import mix_corpora

    a = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    b = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    c = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    out = mix_corpora([(a, 1.0), (b, 2.5), (c, 0.25)], salt="s")
    got = {(r.source_id, r.doc_id, r.copy) for r in out.collect()}

    want = set()
    for i, w in [(0, 1.0), (1, 2.5), (2, 0.25)]:
        full = int(w)
        frac_bp = round((w - full) * 10000)
        for d in range(100):
            n = full + (1 if _mix_bucket("s", i, d) < frac_bp else 0)
            for cp in range(n):
                want.add((i, d, cp))
    assert got == want
    # sanity on the mixture shape: source 1 contributes 2-3 copies per
    # doc, source 2 roughly a quarter of its docs
    n1 = sum(1 for s, _, _ in got if s == 1)
    n2 = sum(1 for s, _, _ in got if s == 2)
    assert 200 <= n1 <= 300 and 10 <= n2 <= 45


def test_mix_composes_with_shuffled_packing(spark):
    from jobcan_data_integrator_spark.operators.packing import (
        mix_corpora,
        pack_shards,
    )

    src = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 3).alias("n_tokens")
    )
    mixed = mix_corpora([(src, 2.0)], salt="epoch0")
    # composite integer id so copies pack as distinct rows
    packed = pack_shards(
        mixed.select(
            (F.col("doc_id") * 10 + F.col("copy")).alias("doc_id"), "n_tokens"
        ),
        budget=40,
        shuffle_salt="epoch0",
    )
    rows = packed.collect()
    assert len(rows) == 100  # every copy packed exactly once
    _check_packing(rows, 40)


def test_mix_rejects_bad_weights(spark):
    from jobcan_data_integrator_spark.operators.packing import mix_corpora

    src = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        mix_corpora([(src, 0.0)])
    with pytest.raises(ValueError):
        mix_corpora([])


def test_chunking_randomized_against_replica(spark):
    """200 random-length docs x 4 window geometries, one Spark call per
    geometry — the deterministic replica must agree everywhere."""
    import random

    from jobcan_data_integrator_spark.operators.packing import chunk_documents

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randrange(5)}" for _ in range(rng.randrange(1, 40))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for max_tokens, overlap in [(5, 0), (5, 2), (16, 7), (2, 1)]:
        got = {
            (r.doc_id, r.chunk_idx): (r.chunk_text, r.n_tokens)
            for r in chunk_documents(df, max_tokens, overlap).collect()
        }
        want = {
            (doc_id, i): chunk
            for doc_id, text in rows
            for i, chunk in enumerate(_chunk_py(text, max_tokens, overlap))
        }
        assert got == want, f"max={max_tokens} overlap={overlap}"


def test_temperature_weights_rebalance_toward_uniform():
    from jobcan_data_integrator_spark.operators.packing import temperature_weights

    sizes = {"big": 9_000, "mid": 900, "small": 100}
    w = temperature_weights(sizes, alpha=0.5)
    # expected document counts preserve the corpus total
    total = sum(sizes[k] * w[k] for k in sizes)
    assert abs(total - 10_000) < 1e-6
    # small sources upsample, big sources downsample
    assert w["small"] > 1.0 > w["big"]
    # alpha=1 is the natural distribution (identity weights)
    w1 = temperature_weights(sizes, alpha=1.0)
    assert all(abs(v - 1.0) < 1e-12 for v in w1.values())
    # lower alpha pushes harder toward uniform
    w_flat = temperature_weights(sizes, alpha=0.1)
    assert w_flat["small"] > w["small"]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_weights(sizes, alpha=0.0)
    with _pytest.raises(ValueError):
        temperature_weights({"a": 0}, alpha=0.5)


def test_write_shards(spark, tmp_path):
    from jobcan_data_integrator_spark.operators.packing import (
        pack_shards,
        write_shards,
    )

    docs = spark.createDataFrame(
        [(i, 10) for i in range(20)], "doc_id bigint, n_tokens bigint"
    )
    packed = pack_shards(docs, budget=50)
    out = str(tmp_path / "shards")
    manifest = write_shards(packed, out).collect()
    # manifest totals match the input
    assert sum(r.n_docs for r in manifest) == 20
    assert sum(r.n_tokens for r in manifest) == 200
    # one data file per shard directory, contents read back exactly
    import glob
    import os

    for r in manifest:
        files = [
            f
            for f in glob.glob(os.path.join(out, f"shard_id={r.shard_id}", "*"))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, files
    back = spark.read.parquet(out)
    assert back.count() == 20
    assert sorted(
        (row.doc_id, row.shard_id) for row in back.collect()
    ) == sorted((row.doc_id, row.shard_id) for row in packed.collect())

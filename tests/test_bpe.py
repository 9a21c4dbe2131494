"""Distributed BPE training/encoding (operators/bpe.py).

The oracle is a pure-Python replica of Sennrich-style BPE with the
same tiebreak (count desc, then lexicographic pair) and the same
left-to-right greedy merge application — the learned merge list and
the encoded token streams are compared exactly, so the determinism
contract ("pure function of the corpus") is pinned, not assumed.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from jobcan_data_integrator_spark.operators.bpe import (
    EOW,
    encode_bpe,
    train_bpe,
    word_frequency_table,
)

CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newest newest"),
    (2, "newest newest newest newest"),
    (3, "widest widest widest"),
    (4, "low lower newest widest"),
]


def _replica_word_freq(corpus: list[tuple[int, str]]) -> dict[str, int]:
    c: Counter = Counter()
    for _, text in corpus:
        c.update(w for w in text.split(" ") if w)
    return dict(c)


def _replica_train(
    corpus: list[tuple[int, str]], n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    words = {
        w: (list(w) + [EOW], n) for w, n in _replica_word_freq(corpus).items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, n in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[a, b] += n
        live = {p: c for p, c in pairs.items() if c >= min_count}
        if not live:
            break
        best = min(live.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, (syms, n) in words.items():
            words[w] = (_replica_merge(syms, *best), n)
    return merges


def _replica_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _replica_encode(
    text: str, merges: list[tuple[str, str]]
) -> list[str]:
    toks: list[str] = []
    for w in text.split(" "):
        if not w:
            continue
        syms = list(w) + [EOW]
        for a, b in merges:
            syms = _replica_merge(syms, a, b)
        toks.extend(syms)
    return toks


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_word_frequency_table(spark, docs):
    got = {
        r.word: (r.n, r.syms)
        for r in word_frequency_table(docs).collect()
    }
    want = _replica_word_freq(CORPUS)
    assert set(got) == set(want)
    for w, n in want.items():
        assert got[w] == (n, list(w) + [EOW])


def test_train_matches_replica_exactly(spark, docs):
    merges = train_bpe(docs, n_merges=12)
    assert merges == _replica_train(CORPUS, 12)
    # the classic example learns 'est</w>' and 'low' early
    joined = ["".join(p) for p in merges]
    assert "es" in joined or "st" in joined


def test_train_early_stop_on_min_count(spark):
    tiny = spark.createDataFrame(
        [(0, "ab cd")], "doc_id bigint, text string"
    )
    # every pair occurs once -> below min_count=2 -> no merges at all
    assert train_bpe(tiny, n_merges=5, min_count=2) == []


def test_train_deterministic_across_partitionings(spark, docs):
    m1 = train_bpe(docs, n_merges=8)
    m2 = train_bpe(docs.repartition(7), n_merges=8)
    assert m1 == m2


def test_encode_matches_replica(spark, docs):
    merges = train_bpe(docs, n_merges=10)
    got = {
        r.doc_id: r.bpe_tokens
        for r in encode_bpe(docs, merges).collect()
    }
    for doc_id, text in CORPUS:
        assert got[doc_id] == _replica_encode(text, merges), doc_id


def test_encode_greedy_left_to_right(spark):
    # 'aaa' under merge (a,a): greedy L2R gives ['aa','a</w>'] shape —
    # i.e. the FIRST adjacent pair merges, the leftover 'a' stays
    df = spark.createDataFrame([(0, "aaa")], "doc_id bigint, text string")
    out = encode_bpe(df, [("a", "a")]).collect()[0].bpe_tokens
    assert out == ["aa", "a", EOW]


def test_encode_roundtrip_identity(spark, docs):
    """Concatenating tokens and stripping EOW reconstructs the text."""
    merges = train_bpe(docs, n_merges=10)
    out = encode_bpe(docs, merges).withColumn(
        "rt",
        F.array_join(
            F.transform(
                F.col("bpe_tokens"),
                lambda t: F.regexp_replace(t, "</w>$", " "),
            ),
            "",
        ),
    )
    for r in out.collect():
        assert r.rt.rstrip(" ").replace("  ", " ") == dict(CORPUS)[r.doc_id]


def test_encode_plan_is_narrow_and_jvm_side(spark, docs):
    merges = train_bpe(docs, n_merges=10)
    plan = encode_bpe(docs, merges)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, plan


def test_encode_on_documents_table(spark, sf_dir):
    """Smoke over the real documents table: train on a sample, encode
    the full table, tokens reconstruct every document."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id"), F.col("text"))
        .limit(50)
    )
    merges = train_bpe(docs, n_merges=6)
    assert merges  # real text has repeated pairs
    n = encode_bpe(docs, merges).filter(F.size("bpe_tokens") > 0).count()
    assert n == docs.count()


def test_save_load_roundtrip(spark, docs, tmp_path):
    from jobcan_data_integrator_spark.operators.bpe import load_bpe, save_bpe
    from jobcan_data_integrator_spark.storage import TableStore

    store = TableStore(spark, tmp_path, write_partitions=1)
    merges = train_bpe(docs, n_merges=10)
    save_bpe(store, merges)
    assert load_bpe(store) == merges  # rank order IS the tokenizer


def test_token_counts_feed_pack_shards(spark, docs):
    """The tokenizer-accurate packing composition: train -> count ->
    pack; every shard except possibly the last respects the budget."""
    from jobcan_data_integrator_spark.operators.bpe import bpe_token_counts
    from jobcan_data_integrator_spark.operators.packing import pack_shards

    merges = train_bpe(docs, n_merges=10)
    counted = bpe_token_counts(docs, merges)
    got = {r.doc_id: r.n_bpe_tokens for r in counted.collect()}
    for doc_id, text in CORPUS:
        assert got[doc_id] == len(_replica_encode(text, merges)), doc_id
    packed = pack_shards(counted, budget=20, tokens_col="n_bpe_tokens")
    shard_rows = packed.collect()
    assert len({r.shard_id for r in shard_rows}) >= 2
    # the packer's contract: shard = starting token offset / budget
    assert all(r.shard_id == r.cum_before // 20 for r in shard_rows)
    # exact invariant: cum_before is a true prefix sum over the pack order
    rows = sorted(packed.collect(), key=lambda r: r.cum_before)
    run = 0
    for r in rows:
        assert r.cum_before == run
        run += r.n_bpe_tokens


def test_bpe_stats(spark, docs):
    from jobcan_data_integrator_spark.operators.bpe import bpe_stats

    merges = train_bpe(docs, n_merges=10)
    row = bpe_stats(docs, merges).collect()[0]
    # replica
    all_toks = []
    total_chars = 0
    for _, text in CORPUS:
        all_toks.append(_replica_encode(text, merges))
        total_chars += len(text)
    total_tokens = sum(len(t) for t in all_toks)
    assert row.n_docs == len(CORPUS)
    assert row.total_tokens == total_tokens
    assert row.total_chars == total_chars
    assert row.chars_per_token == round(total_chars / total_tokens, 4)
    assert row.vocab_size == len({t for ts in all_toks for t in ts})


def test_bpe_stats_approx_vocab(spark, docs):
    """The HLL scale path: same totals, vocab within the sketch's
    error band of the exact count (tiny vocab -> near-exact)."""
    from jobcan_data_integrator_spark.operators.bpe import bpe_stats

    merges = train_bpe(docs, n_merges=10)
    exact = bpe_stats(docs, merges).collect()[0]
    approx = bpe_stats(docs, merges, approx_vocab=True).collect()[0]
    assert approx.total_tokens == exact.total_tokens
    assert abs(approx.vocab_size - exact.vocab_size) <= max(
        2, exact.vocab_size * 0.1
    )


def _replica_train_batched(
    corpus: list[tuple[int, str]],
    n_merges: int,
    batch: int,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """The batched variant: same ranked snapshot, compatible_merges
    prefix applied per round (shares the engine's selection function —
    the replica pins the COUNTING and APPLICATION, the selection rule
    is one pure list function)."""
    from jobcan_data_integrator_spark.operators.bpe import compatible_merges

    words = {
        w: (list(w) + [EOW], n) for w, n in _replica_word_freq(corpus).items()
    }
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        pairs: Counter = Counter()
        for syms, n in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[a, b] += n
        ranked = sorted(
            ((p, c) for p, c in pairs.items() if c >= min_count),
            key=lambda kv: (-kv[1], kv[0]),
        )
        if not ranked:
            break
        taken = compatible_merges(
            [p for p, _ in ranked], min(batch, n_merges - len(merges))
        )
        merges.extend(taken)
        for a, b in taken:
            for w, (syms, n) in words.items():
                words[w] = (_replica_merge(syms, a, b), n)
    return merges


def test_batched_training_matches_replica(spark, docs, monkeypatch):
    """batch > 1 learns the replica's exact batched merge list in
    ~n_merges/batch count rounds (one pair-count job per round, the
    scheduler-overhead fix for 32k-merge vocabularies)."""
    import jobcan_data_integrator_spark.operators.bpe as bpe

    rounds = {"n": 0}
    real = bpe._pair_counts

    def counting(words):
        rounds["n"] += 1
        return real(words)

    monkeypatch.setattr(bpe, "_pair_counts", counting)
    merges = train_bpe(docs, n_merges=12, batch=4)
    assert merges == _replica_train_batched(CORPUS, 12, batch=4)
    # every merge present and ordered; round count ~ merges/batch
    assert len(merges) > 0
    import math

    assert rounds["n"] <= math.ceil(12 / 4) + 2, rounds


def test_batched_batch1_is_classic_bpe(spark, docs):
    assert train_bpe(docs, n_merges=8, batch=1) == _replica_train(CORPUS, 8)


def test_compatible_merges_rejects_interacting_pairs():
    from jobcan_data_integrator_spark.operators.bpe import compatible_merges

    ranked = [
        ("a", "b"),   # taken
        ("b", "c"),   # shares 'b' -> skipped
        ("ab", "c"),  # consumes the symbol ('a','b') creates -> skipped
        ("x", "y"),   # disjoint -> taken
        ("w", "xy"),  # consumes ('x','y')'s product -> skipped
        ("p", "q"),   # disjoint -> taken
    ]
    assert compatible_merges(ranked, 10) == [("a", "b"), ("x", "y"), ("p", "q")]

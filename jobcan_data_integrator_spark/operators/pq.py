"""Product quantization (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") — the memory side of 100 TB ANN: each
embedding compresses to ``m`` small codes (64 floats -> 8 bytes at
m=8, k<=256), and asymmetric-distance (ADC) search scores candidates
from a per-query lookup table without ever touching the original
vectors.  Composes with the IVF coarse quantizer
(operators/similarity.py) exactly as FAISS's IVFPQ does.

Spark-first, and exact-integer like the rest of the similarity stack:

- TRAINING runs all ``m`` subspace k-means SIMULTANEOUSLY — vectors
  explode once to (vec_id, sub, subvector) rows, assignment is an
  in-row argmax against the broadcast (sub -> centroids) codebook
  (zero shuffle, no per-centroid row blow-up), and each Lloyd update
  is ONE groupBy keyed (sub, cell, dim) with map-side partials —
  m*k*d_sub groups (8*16*8 = 1024) regardless of corpus size.  Not a
  Python loop over subspaces: ``iters`` passes total, not m*iters.
- ENCODING is a pure map: the full codebook (m*k centroids) folds to
  one broadcast row; each vector computes its m argmax codes in-row.
  The corpus is never shuffled.
- ADC SEARCH decomposes the integer dot product EXACTLY:
  dot(query, reconstruction(x)) = sum_sub dot(q_sub, centroid[x's
  code in sub]) — so the per-query LUT (m*k integer dots, built by a
  tiny codebook-x-queries join and folded into one broadcast row)
  makes each candidate's score an in-row array lookup + sum.  Top-k
  is the same per-query window the other ANN variants use.

All arithmetic is the stack's floor(x*1000) integer quantization with
argmax ties to the lowest cell, so training, codes, and ADC scores
are bit-stable under any partitioning and replay identically in the
NumPy replica (tests/test_pq.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jobcan_data_integrator_spark.operators.similarity import quantized_expr

#: in-row integer dot product of two bigint arrays
_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (s, v) -> s + v)"


def _subvectors(vq: DataFrame, m: int, d_sub: int) -> DataFrame:
    """(vec_id, sub, qs): the m slices of each quantized vector."""
    subs = F.explode(
        F.expr(
            f"transform(sequence(0, {m - 1}),"
            f" s -> struct(s as sub, slice(q, s * {d_sub} + 1, {d_sub}) as qs))"
        )
    )
    return vq.select("vec_id", subs.alias("x")).select(
        "vec_id", F.col("x.sub").alias("sub"), F.col("x.qs").alias("qs")
    )


def _codebook_row(codebooks: DataFrame) -> DataFrame:
    """Fold (sub, cell_id, cq) into ONE broadcast row: an array indexed
    by sub, each element the cell-sorted centroid list."""
    return (
        codebooks.groupBy("sub")
        .agg(F.array_sort(F.collect_list(F.struct("cell_id", "cq"))).alias("cents"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(sub, cents))),"
                " x -> x.cents)"
            ).alias("cb")
        )
    )


def train_pq(
    emb: DataFrame, m: int = 8, k: int = 16, iters: int = 2
) -> DataFrame:
    """Train the PQ codebook: (sub, cell_id, cq array<bigint>) with
    ``m * k`` rows.  Seeds are the first ``k`` vectors' subslices (the
    IVF trainer's convention); assignment is max integer dot, ties to
    the lowest cell; updates are floor(sum/count) per dimension."""
    dim = len(emb.select("embedding").first()["embedding"])
    if dim % m != 0:
        raise ValueError(f"m={m} must divide the embedding dim {dim}")
    d_sub = dim // m
    sv = _subvectors(
        emb.select("vec_id", quantized_expr().alias("q")), m, d_sub
    ).localCheckpoint(eager=True)
    codebooks = (
        sv.filter(F.col("vec_id") < k)
        .select("sub", F.col("vec_id").alias("cell_id"), F.col("qs").alias("cq"))
    )
    argmax = (
        "aggregate(transform(cents, c -> struct("
        + _DOT.format(a="qs", b="c.cq")
        + " as dot, c.cell_id as cell)),"
        " struct(cast(-9223372036854775807 as bigint) as dot,"
        " cast(-1 as bigint) as cell),"
        " (b, s) -> if(s.dot > b.dot, s, b)).cell"
    )
    for _ in range(iters):
        per_sub = codebooks.groupBy("sub").agg(
            F.array_sort(F.collect_list(F.struct("cell_id", "cq"))).alias("cents")
        )
        assigned = sv.join(F.broadcast(per_sub), "sub").select(
            "sub", "qs", F.expr(argmax).alias("cell_id")
        )
        sums = (
            assigned.select("sub", "cell_id", F.posexplode("qs").alias("d", "v"))
            .groupBy("sub", "cell_id", "d")
            .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
        )
        codebooks = (
            sums.withColumn("c", F.floor(F.col("s") / F.col("n")).cast("bigint"))
            .groupBy("sub", "cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("d", "c"))).alias("dc"))
            .select(
                "sub",
                "cell_id",
                F.expr("transform(dc, x -> x.c)").alias("cq"),
            )
        )
    return codebooks


def pq_encode(emb: DataFrame, codebooks: DataFrame, m: int = 8) -> DataFrame:
    """(vec_id, codes array<bigint> length m): each vector's per-sub
    argmax code — a pure map against the broadcast folded codebook;
    the corpus is never shuffled (plan-pinned)."""
    dim = len(emb.select("embedding").first()["embedding"])
    d_sub = dim // m
    codes = (
        f"transform(sequence(0, {m - 1}), s -> "
        "aggregate(transform(cb[s], c -> struct("
        + _DOT.format(a=f"slice(q, s * {d_sub} + 1, {d_sub})", b="c.cq")
        + " as dot, c.cell_id as cell)),"
        " struct(cast(-9223372036854775807 as bigint) as dot,"
        " cast(-1 as bigint) as cell),"
        " (b, x) -> if(x.dot > b.dot, x, b)).cell)"
    )
    return (
        emb.select("vec_id", quantized_expr().alias("q"))
        .crossJoin(F.broadcast(_codebook_row(codebooks)))
        .select("vec_id", F.expr(codes).alias("codes"))
    )


def pq_search(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int = 5,
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, adc_score, rank) — the ``k``
    highest approximate dot products per query, scored from codes
    alone.  The LUT join is (m*k codebook rows) x (queries) — both
    tiny — folded into one broadcast row; scoring each candidate is an
    in-row sum of m array lookups; ranking is the per-query window
    every ANN variant here uses.  Deterministic ties: score desc,
    vec_id asc."""
    scored = (
        codes.crossJoin(F.broadcast(_query_luts(queries, codebooks)))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", _adc_score().alias("adc_score"))
    )
    return _topk(scored, k)


def _adc_score():
    """Per-candidate ADC score: sum over subs of LUT[sub*1000 + code]."""
    return F.expr(
        "aggregate(transform(sequence(0, size(codes) - 1),"
        " i -> element_at(lut, i * 1000 + codes[i])),"
        " 0L, (s, v) -> s + v)"
    )


def _query_luts(queries: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(query_id, lut): the ADC lookup table per query — keyed
    sub*1000+cell as a MAP, not a positional array (cells that lose
    all members during training leave index gaps a positional lookup
    would mis-align on).  Built by a (queries x m*k codebook rows)
    join — both tiny."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), quantized_expr().alias("qq")
    )
    return (
        q.crossJoin(codebooks)
        .select(
            "query_id",
            (F.col("sub") * 1000 + F.col("cell_id")).alias("sc"),
            F.expr(
                _DOT.format(
                    a="slice(qq, sub * size(cq) + 1, size(cq))", b="cq"
                )
            ).alias("dot"),
        )
        .groupBy("query_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("sc", "dot")))
            ).alias("lut")
        )
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ann_topk_ivfpq(
    codes: DataFrame,
    assignments: DataFrame,
    codebooks: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """The FAISS-IVFPQ serving composition: coarse-probe ``n_probe``
    IVF cells (operators/similarity.probe_cells, in-row against the
    broadcast coarse codebook), then ADC-score ONLY the candidates in
    those cells from their PQ codes — the original embeddings are
    never read at search time.

    At 100 TB: the codes table is ~8 bytes/vector (vs 256+ for raw
    floats), clustered by ``cell_id`` so each probe scans
    n_probe/n_cells of it, and every per-candidate operation is an
    in-row map against broadcast state.  Exactly the probe-prune
    stance of the IVF-flat path, with PQ removing the embedding I/O.

    ``assignments`` is (vec_id, cell_id) from the coarse quantizer
    (train_ivf_centroids / assign_cells); results carry the same
    deterministic (score desc, vec_id asc) ranking as pq_search."""
    from jobcan_data_integrator_spark.operators.similarity import probe_cells

    probe = probe_cells(
        queries.select("vec_id", quantized_expr().alias("q")),
        centroids,
        n_probe,
    ).withColumnRenamed("vec_id", "query_id")
    scored = (
        F.broadcast(probe)
        .join(assignments, "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(codes, "vec_id")
        .join(F.broadcast(_query_luts(queries, codebooks)), "query_id")
        .select("query_id", "vec_id", _adc_score().alias("adc_score"))
    )
    return _topk(scored, k)

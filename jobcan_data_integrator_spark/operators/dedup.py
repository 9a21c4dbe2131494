"""Near-dup pair detection + dedup graph clustering.

``ngram_jaccard_pairs`` is the exhaustive shingle-join pair detector
(guarded against hot-shingle blow-up); ``connected_components`` /
``dup_clusters`` are the pipeline tail (shingle -> MinHash -> LSH
candidates -> exact-Jaccard verify -> PAIRS -> clusters): turning the
pair graph into cluster ids so each duplicate group keeps one canonical
document.

Algorithm: min-label propagation — every node starts labeled with its
own id; each round every node takes the minimum label among itself and
its neighbors; converged when no label changes.  Rounds needed = graph
diameter, and near-dup components are overwhelmingly tiny (pairs/stars),
so 2-3 rounds converge in practice; ``max_iter`` caps pathological
chains.  Per round: one shuffle join (edges x labels) + one min-groupBy
with map-side partial aggregation — both keyed by node id, so the same
partitioning is reusable round to round.  At extreme scale the
large-star/small-star variant (alternating conditional propagation)
reduces round count on high-diameter graphs; the round body below is
the same join+min shape, so it drops in without changing callers.

The result is engine-independent (min over a set), so a DuckDB
recursive CTE replays it exactly — the gate uses that as its oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ngram_jaccard_pairs(
    shingles: DataFrame,
    min_common: int = 5,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Exhaustive n-gram Jaccard near-dup pairs over (doc_id, shingle) rows.

    Output: (doc_a, doc_b, n_common, jaccard) for every pair sharing at
    least ``min_common`` distinct shingles, with Jaccard computed over the
    same (capped) shingle universe.

    GUARDED against the hot-shingle blow-up: the raw shingle self-join is
    quadratic in document frequency — a boilerplate shingle shared by k
    documents alone contributes k*(k-1)/2 join rows, and real corpora have
    headers/footers with k in the millions.  ``max_doc_freq`` drops any
    shingle appearing in more than that many documents BEFORE the
    self-join, bounding per-shingle fan-out to max_doc_freq² and making
    the join cost linear in corpus size for fixed cap.  Ubiquitous
    shingles carry no similarity signal (their presence is corpus-wide,
    not pair-specific), so excluding them from both the intersection and
    the union is the standard formulation.  Pass ``None`` to disable (the
    uncapped small-corpus ground-truth variant; never run that at scale —
    use the LSH-verified composition in gate/llm.py instead).

    Plan shape: one map-side-partial count per shingle, the hot set
    (df > cap) is tiny by construction and BROADCAST into a left-anti
    join, then the usual sizes aggregate + shingle equi-join.
    """
    sh = shingles.select("doc_id", "shingle").distinct()
    pre_filter = None
    if max_doc_freq is not None:
        # cache BEFORE deriving the hot set: the distinct feeds both the
        # frequency aggregate and the anti-join input, and shingle
        # construction upstream (explode + window) is the expensive part
        # — without the cache it would run twice
        pre_filter = sh.cache()
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    # Feeds the self-join twice plus the size aggregate: materialize once.
    sh = sh.cache()
    if pre_filter is not None:
        # Materialize the post-anti-join cache off the pre-filter cache
        # NOW, then drop the pre-filter cache — it is never read again,
        # and leaving it persisted would accumulate cached partitions
        # across repeated calls in a long-lived session.
        sh.count()
        pre_filter.unpersist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("sa.n") + F.col("sb.n") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(doc_id, cluster_id) for every node in ``edges`` (src, dst).

    ``cluster_id`` is the minimum node id of the component.  Nodes not
    appearing in any edge are by definition singleton clusters and are
    not emitted — callers union them back if they need full coverage.

    EAGER: constructing the result runs Spark jobs immediately (the edge
    cache is materialized up front — see the inline comment — and each
    propagation round runs one action), so building the DataFrame is not
    free even if the caller never executes it.  One action per round: the
    per-round job materializes the localCheckpoint AND counts changed
    labels (a ``chg`` flag computed in the same select), instead of a
    separate edges-x-labels convergence join on top of the label job.
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    sym = sym.distinct().cache()
    # Materialize the edge cache BEFORE deriving labels: round 1's first
    # job would otherwise evaluate `sym` on both sides of the join (sym
    # itself + labels-derived-from-sym) with the cache still cold, paying
    # the whole upstream pair pipeline several times in one job
    # (measured: 38 s -> 6 s cold at sf0.1 for the LSH-verified input).
    sym.count()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .cache()
    )
    try:
        changed = -1
        for _ in range(max_iter):
            neigh = (
                sym.join(labels, sym["src"] == labels["doc_id"])
                .groupBy(F.col("dst").alias("doc_id"))
                .agg(F.min("cluster_id").alias("neigh_min"))
            )
            # localCheckpoint (not cache): truncates the lineage so the
            # compiled plan stays ONE round deep instead of accumulating
            # every previous round's joins (plan bloat grows Catalyst
            # planning time per iteration and makes eviction
            # catastrophic).  On a real cluster with executor loss, use
            # a reliable checkpoint dir instead.  The ``chg`` flag rides
            # along so convergence is read off the SAME materialization
            # (the count below triggers the lazy checkpoint) — no second
            # edges-x-labels join per round.
            new_min = F.least(
                F.col("cluster_id"), F.coalesce("neigh_min", "cluster_id")
            )
            new_labels = (
                labels.join(neigh, "doc_id", "left")
                .select(
                    "doc_id",
                    new_min.alias("cluster_id"),
                    (new_min != F.col("cluster_id")).alias("chg"),
                )
                .localCheckpoint(eager=False)
            )
            changed = new_labels.filter(F.col("chg")).count()
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                break
        if changed != 0:
            # returning part-propagated labels would silently split real
            # components (several keep=true rows inside one dup cluster)
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "rounds — raise max_iter (graph diameter exceeds it)"
            )
        return labels.select("doc_id", "cluster_id")
    finally:
        sym.unpersist()


def _canonical(edges: DataFrame) -> DataFrame:
    """Undirected edge set as canonical (a > b) rows, self-loops dropped."""
    return (
        edges.select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star phase: every node's strictly-LARGER neighbors are
    re-pointed at the minimum of its closed neighborhood min(Γ(u)∪{u})."""
    sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star phase: every node with smaller neighbors points
    them AND itself at the smallest of them (which is min(Γ(u)∪{u}),
    since any smaller neighbor beats both u and u's larger neighbors)."""
    smaller = e.select(F.col("a").alias("u"), F.col("b").alias("v"))
    m = smaller.groupBy("u").agg(F.min("v").alias("m"))
    re_pointed = (
        smaller.join(m, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    self_edges = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
    return re_pointed.unionByName(self_edges).distinct()


def connected_components_twophase(
    edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """(doc_id, cluster_id) via the alternating large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the HIGH-DIAMETER scale path.

    Same contract as ``connected_components`` (cluster_id = component
    minimum; nodes outside any edge not emitted), but convergence is
    O(log n) rounds on ANY graph instead of O(diameter): each phase is
    still one shuffle join + one min-groupBy, so a million-hop chain
    costs ~20 rounds, not a million.  Near-dup graphs are almost always
    tiny stars where plain label propagation's 2-3 rounds win on
    constant factors — use THIS variant when the pair graph may chain
    (transitive near-dups over a sliding threshold, link graphs).

    EAGER like its sibling: each round materializes via localCheckpoint
    and runs a fixed-point check (edge set unchanged under both phases).
    """
    e = _canonical(edges).localCheckpoint(eager=True)
    nodes = e.select(F.col("a").alias("doc_id")).unionByName(
        e.select(F.col("b").alias("doc_id"))
    ).distinct().localCheckpoint(eager=True)
    n_e = e.count()
    converged = False
    for _ in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        # fixed point of the canonical edge set == both phases stable.
        # Both sides are distinct row sets, so |nxt| == |e| plus
        # nxt∖e == ∅ proves equality — one count (carried to the next
        # round) and one early-exiting anti-join instead of two full
        # exceptAll passes.  Superseded checkpoint RDDs are released by
        # GC once `e` is rebound (localCheckpoints have no unpersist).
        n_nxt = nxt.count()
        if (
            n_nxt == n_e
            and nxt.join(e, ["a", "b"], "left_anti").limit(1).count() == 0
        ):
            e = nxt
            converged = True
            break
        e, n_e = nxt, n_nxt
    if not converged:
        raise RuntimeError(
            f"connected_components_twophase did not converge in {max_iter} "
            "rounds — raise max_iter"
        )
    # converged edges are stars (a -> component min); roots map to
    # themselves (a left join keeps nodes whose component has size 1
    # impossible here — every node came from an edge — but keeps ROOTS)
    labels = e.select(F.col("a").alias("doc_id"), F.col("b").alias("cluster_id"))
    roots = nodes.join(labels, "doc_id", "left_anti").select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    )
    return labels.unionByName(roots)


def dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """(doc_id, cluster_id, keep) from a near-dup pair frame
    (doc_a, doc_b): ``keep`` marks the canonical (minimum-id) member of
    each cluster — the row to retain when deduplicating the corpus."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    cc = connected_components(edges, max_iter=max_iter)
    return cc.select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("keep")
    )


# ---------------------------------------------------------------------------
# Span-level exact-substring dedup (Lee et al. 2021, "Deduplicating
# Training Data Makes Language Models Better" — the ExactSubstr pass).
# The paper builds a corpus-wide suffix array; the Spark-first shape is
# fixed-length token-span hashing: every length-``span`` token window is
# hashed (narrow in-row slices, NO shuffle), windows whose hash occurs
# more than once corpus-wide are duplicates, and every occurrence except
# the global first (minimum (doc_id, pos)) is marked for removal.
# Overlapping/adjacent marked windows merge into maximal intervals per
# document (gaps-and-islands), so removal never double-counts a token.
#
# Scale shape: one groupBy on the span hash (map-side partial agg), one
# hash-keyed join back (the aggregated side is distinct-by-hash so the
# join never fans out — a span shared by millions of documents is ONE
# row on the build side), and doc_id-keyed windows for the interval
# merge.  Linear in corpus token count at any scale; no all-pairs
# anywhere.
# ---------------------------------------------------------------------------

#: position packing for the global-first-occurrence key: supports
#: documents up to 2^20 (~1M) tokens.  Beyond that the composite key
#: would collide across documents — raise the shift with the corpus.
_SPAN_POS_BITS = 20


def _span_occurrences(
    docs: DataFrame, span: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, pos, h): the 60-bit hash of every length-``span`` token
    window — in-row slices over the split text, zero shuffle."""
    from jobcan_data_integrator_spark.operators.minhash import H60

    slices = (
        f"transform(sequence(0, size(split({text_col}, ' ')) - {span}),"
        f" s -> array_join(slice(split({text_col}, ' '), s + 1, {span}), ' '))"
    )
    return (
        docs.filter(F.expr(f"size(split({text_col}, ' ')) >= {span}"))
        .select(
            F.col(id_col),
            F.posexplode(F.expr(slices)).alias("pos", "_spantext"),
        )
        .select(
            id_col,
            "pos",
            F.expr(H60.format(x="_spantext")).alias("h"),
        )
    )


def _merge_islands(flagged: DataFrame, span: int, id_col: str) -> DataFrame:
    """(id, start_tok, end_tok): gaps-and-islands merge of flagged span
    starts into maximal token intervals (overlap-or-adjacent coalesce).
    ``flagged`` is (id, pos) with distinct rows."""
    from pyspark.sql.window import Window

    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    brk = (
        F.when(
            F.col("pos")
            <= F.coalesce(F.max(F.col("pos") + span - 1).over(w_prev), F.lit(-2)) + 1,
            0,
        )
        .otherwise(1)
    )
    return (
        flagged.withColumn("_brk", brk)
        .withColumn("_island", F.sum("_brk").over(w_run))
        .groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + span - 1).alias("end_tok"),
        )
        .select(id_col, "start_tok", "end_tok")
    )


def duplicate_span_intervals(
    docs: DataFrame,
    span: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, start_tok, end_tok): maximal merged token intervals covered
    by duplicated spans, EXCLUDING each span's global first occurrence
    (minimum (doc_id, pos)) — the set of token ranges the ExactSubstr
    pass removes.  ``start_tok``/``end_tok`` are 0-based inclusive."""
    occ = _span_occurrences(docs, span, id_col, text_col)
    key = (F.col(id_col).cast("bigint") * (1 << _SPAN_POS_BITS)) + F.col("pos")
    occ = occ.withColumn("_key", key)
    per_hash = occ.groupBy("h").agg(
        F.count("*").alias("n_occ"), F.min("_key").alias("min_key")
    )
    flagged = (
        occ.join(per_hash, "h")
        .filter((F.col("n_occ") > 1) & (F.col("_key") != F.col("min_key")))
        .select(id_col, "pos")
        # the same position can host several duplicated hashes only if
        # span hashes collide (60-bit — negligible), but two DIFFERENT
        # duplicated spans can start at the same pos after upstream
        # edits; distinct keeps the island scan clean either way
        .distinct()
        # tiny (flagged occurrences only) — the checkpoint stops the
        # island windows and every downstream join-back from replaying
        # the corpus-wide explode + hash aggregation (same pattern as
        # span_dedup_summary's shared flagged frame)
        .localCheckpoint(eager=False)
    )
    return _merge_islands(flagged, span, id_col)


def span_dedup_summary(
    docs: DataFrame,
    span: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document dedup summary combining DOC-level exact dedup with
    SPAN-level exact-substring dedup: (id, text_md5, keep_doc_id,
    dup_count, n_dup_spans, n_removed_tokens, n_kept_tokens).

    ``keep_doc_id``/``dup_count`` are the exact-dedup facts (minimum id
    of the identical-text group / group size); ``n_dup_spans`` counts
    this document's non-first duplicated span occurrences;
    ``n_removed_tokens`` is the MERGED interval coverage (overlaps never
    double-count); ``n_kept_tokens`` is what survives removal."""
    from pyspark.sql.window import Window

    w_md5 = Window.partitionBy("_md5")
    base = docs.select(
        id_col,
        F.md5(F.col(text_col).cast("binary")).alias("_md5"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("_n_toks"),
    ).select(
        id_col,
        F.col("_md5").alias("text_md5"),
        F.min(id_col).over(w_md5).alias("keep_doc_id"),
        F.count("*").over(w_md5).alias("dup_count"),
        "_n_toks",
    )
    # the span explode + per-hash stats feed BOTH the occurrence counts
    # and the interval merge — share one flagged frame instead of
    # re-exploding the corpus per consumer (localCheckpoint: 3 longs per
    # flagged occurrence, GC-reclaimed)
    occ = _span_occurrences(docs, span, id_col, text_col)
    key = (F.col(id_col).cast("bigint") * (1 << _SPAN_POS_BITS)) + F.col("pos")
    occ = occ.withColumn("_key", key)
    per_hash = occ.groupBy("h").agg(
        F.count("*").alias("n_occ"), F.min("_key").alias("min_key")
    )
    flagged = (
        occ.join(per_hash, "h")
        .filter((F.col("n_occ") > 1) & (F.col("_key") != F.col("min_key")))
        .select(id_col, "pos")
        .localCheckpoint(eager=False)
    )
    flagged_counts = flagged.groupBy(id_col).agg(F.count("*").alias("n_dup_spans"))
    removed = (
        _merge_islands(flagged.distinct(), span, id_col)
        .groupBy(id_col)
        .agg(
            F.sum(F.col("end_tok") - F.col("start_tok") + 1).alias("n_removed_tokens")
        )
    )
    return (
        base.join(flagged_counts, id_col, "left")
        .join(removed, id_col, "left")
        .select(
            id_col,
            "text_md5",
            "keep_doc_id",
            "dup_count",
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.coalesce("n_removed_tokens", F.lit(0))
            .cast("bigint")
            .alias("n_removed_tokens"),
            (F.col("_n_toks") - F.coalesce("n_removed_tokens", F.lit(0)))
            .cast("bigint")
            .alias("n_kept_tokens"),
        )
    )


def remove_duplicate_spans(
    docs: DataFrame,
    span: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` with ``deduped_text``: the text with every duplicated
    span occurrence (except each span's global first) removed — the
    materialized form of ``duplicate_span_intervals``.  Documents with
    no duplicated spans pass through unchanged.

    The interval list per document is tiny (merged islands), so it
    gathers via collect_list and filters tokens in-row — one doc-keyed
    shuffle, then narrow."""
    return _apply_span_intervals(
        docs, duplicate_span_intervals(docs, span, id_col, text_col),
        id_col, text_col,
    )


def remove_flagged_spans(
    docs: DataFrame,
    flagged: DataFrame,
    span: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``docs`` with ``deduped_text`` given a PRECOMPUTED flagged
    occurrence set (id, pos) — the apply half of the ExactSubstr pass,
    for callers that derive flags elsewhere (the incremental span index's
    ``span_increment``; operators/ingest.py applies a batch's flags
    without re-hashing the corpus).  Flags for ids absent from ``docs``
    are ignored; docs with no flags pass through unchanged.  Equivalent
    to :func:`remove_duplicate_spans` when ``flagged`` is the full-corpus
    flag set (pinned in tests/test_ingest.py)."""
    ivs = _merge_islands(
        flagged.select(F.col(id_col), F.col("pos")).distinct(), span, id_col
    )
    return _apply_span_intervals(docs, ivs, id_col, text_col)


def _apply_span_intervals(
    docs: DataFrame, intervals: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Drop each doc's tokens covered by its (start_tok, end_tok)
    intervals — in-row once the per-doc interval list is gathered."""
    ivs = intervals.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("start_tok", "end_tok"))
        ).alias("_ivs")
    )
    kept = (
        "array_join(filter(transform(split({text}, ' '),"
        " (t, i) -> if(exists(_ivs, iv -> i >= iv.start_tok and i <= iv.end_tok),"
        " null, t)), t -> t is not null), ' ')"
    ).format(text=text_col)
    return (
        # ivs holds only documents that HAVE duplicated spans (one short
        # interval list each) — usually broadcastable, but NOT forced: a
        # pathological corpus has one ivs row per document, so the choice
        # belongs to AQE, which sees the checkpointed flagged frame's
        # real size at runtime and picks broadcast when it is small
        docs.join(ivs, id_col, "left")
        .withColumn(
            "deduped_text",
            F.when(F.col("_ivs").isNull(), F.col(text_col)).otherwise(F.expr(kept)),
        )
        .drop("_ivs")
    )


def keep_best_per_cluster(
    labeled: DataFrame,
    cluster_col: str = "cluster",
    score_col: str = "score",
    id_col: str = "doc_id",
) -> DataFrame:
    """One survivor per duplicate cluster, chosen by HIGHEST score
    (ties -> lowest id): the RefinedWeb/Dolma canonicalization policy —
    when near-duplicates differ, keep the best-quality rendering, not
    the accidental minimum id.

    Adds ``is_kept`` to every row (callers usually want the drop list
    too — it IS the dedup output).  Algebraic ``min(struct(-score,
    id))`` aggregation + a broadcast-size-free self-join on the
    cluster key: struct ordering is lexicographic field-by-field, so
    the minimum is the highest score and, among ties, the LOWEST id —
    and because the id is never negated it may be any orderable type
    (string doc_ids included; negating a string yields null and a
    silent all-false ``is_kept``).  Same one-shuffle shape as the
    fan-out collapse gate (gate/analytic.py a5) — no window over the
    full corpus, so a giant cluster costs a groupBy partial, not a
    per-row sort.  Any numeric score works: classifier probability,
    perplexity negation, length — compose with
    quality_score/score_logreg upstream."""
    winners = labeled.groupBy(cluster_col).agg(
        F.min(
            F.struct(
                (-F.col(score_col)).alias("negs"),
                F.col(id_col).alias("i"),
            )
        ).alias("w")
    ).select(cluster_col, F.col("w.i").alias("_keep_id"))
    return (
        labeled.join(winners, cluster_col)
        .withColumn("is_kept", F.col(id_col) == F.col("_keep_id"))
        .drop("_keep_id")
    )

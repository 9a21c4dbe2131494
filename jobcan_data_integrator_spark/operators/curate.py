"""End-to-end corpus curation: the composed pipeline a training team
runs between raw documents and packed training shards.

One call chains the engine's curation operators in the order real
pipelines run them (C4/Gopher/Dolma-style):

    PII scrub -> doc-level exact dedup -> span-level ExactSubstr removal
    -> optional near-dup canonicalization (any pair family -> connected
    components -> min-id keeper) -> quality gate (heuristics +
    optionally the learned classifier) -> sliding-window chunking ->
    source-weighted mixing -> token-budget shard packing (deterministic shuffled order)

Everything is built from the already-tested operators (pii, dedup,
classifier, packing), stays deterministic end-to-end (md5 buckets, no
RNG), and is shuffle-minimal: the only wide stages are the exact-dedup
hash window, the span-hash groupBy/join, and the packing prefix sum —
each keyed, each linear in the corpus.  ``audit`` returns per-stage
surviving-document counts so drops are attributable (the same
auditable-flags stance as the tx_corpus_filter gate).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass
class CurationResult:
    """Frames from each stage — all lazy except where operators
    checkpoint internally; collect the ``audit()`` dict for counts."""

    scrubbed: DataFrame
    deduped: DataFrame
    kept: DataFrame
    chunks: DataFrame
    packed: DataFrame
    stages: list[tuple[str, DataFrame]] = field(default_factory=list)

    def audit(self) -> dict[str, int]:
        """Per-stage surviving-row counts (one job per stage)."""
        return {name: df.count() for name, df in self.stages}


def curate_corpus(
    docs: DataFrame,
    span: int = 8,
    min_tokens: int = 10,
    normalize: bool = False,
    normalize_nfkc: bool = False,
    line_clean: bool = False,
    line_max_doc_freq: int | None = None,
    max_pii_hits: int | None = None,
    near_dup_pairs=None,
    quality_scorer=None,
    classifier_floor: float | None = None,
    chunk_tokens: int = 32,
    chunk_overlap: int = 8,
    budget: int = 4096,
    shuffle_salt: str = "curate",
) -> CurationResult:
    """Run the full curation pipeline over (doc_id, text) documents.

    Stages (each optional knob defaults to the permissive choice):

    1. ``scrub_pii`` — text becomes the redacted text; documents with
       more than ``max_pii_hits`` detections drop (None = keep all).
    2. exact dedup — only the minimum doc_id of each identical-text
       group survives (one window shuffle on the content hash).
    3. ``remove_duplicate_spans`` — ExactSubstr removal of non-first
       duplicated token spans; documents falling below ``min_tokens``
       after removal drop.
    3.5. optional near-dup canonicalization — ``near_dup_pairs`` is a
       callback receiving the span-deduped (doc_id, text) frame and
       returning a (doc_a, doc_b) pair frame from ANY near-dup family
       (LSH-verified Jaccard, SimHash Hamming, SemDeDup cosine — pick
       the family and threshold per corpus); pairs feed connected
       components and only each cluster's minimum-id member survives.
       A callback for the same reason as ``quality_scorer``: the pair
       generation must see the post-removal text, and the right family
       is corpus-specific.
    4. quality gate — optional learned-classifier floor:
       ``quality_scorer`` is a callback receiving the deduped
       (doc_id, text) frame and returning it with a
       ``classifier_score`` column (typically: build feature columns,
       then ``score_logreg(df, features, fitted_weights)``); documents
       scoring below ``classifier_floor`` drop.  A callback because
       features are corpus-specific AND must be computed on the
       post-dedup redacted text, not the raw input.
    5. ``chunk_documents`` at ``chunk_tokens``/``chunk_overlap`` over
       the deduped text.
    6. ``pack_shards`` at ``budget`` tokens in deterministic shuffled
       order (``shuffle_salt``).

    Returns every stage's frame so callers can persist intermediates
    (bronze/silver/gold) or audit drops.
    """
    from jobcan_data_integrator_spark.operators.dedup import remove_duplicate_spans
    from jobcan_data_integrator_spark.operators.packing import (
        chunk_documents,
        pack_shards,
    )
    from jobcan_data_integrator_spark.operators.pii import scrub_pii

    stages: list[tuple[str, DataFrame]] = [("input", docs)]

    # -1. optional normalization (operators/normalize.py) FIRST — the
    # CCNet ordering: byte-different renderings must collide in every
    # downstream hash (exact dedup, span hashes, line stats)
    if normalize:
        from jobcan_data_integrator_spark.operators.normalize import (
            normalize_text,
        )

        docs = normalize_text(docs, nfkc=normalize_nfkc)
        stages.append(("normalized", docs))

    # 0. optional line-level cleaning (operators/lines.py), the stage
    # web pipelines run FIRST: C4 line heuristics + within-doc line
    # dedup, then cross-corpus boilerplate removal when a doc-frequency
    # cap is given.  Off by default — API-sourced corpora (the
    # reference's domain) have no nav-bar boilerplate to strip.
    if line_clean:
        from jobcan_data_integrator_spark.operators.lines import (
            clean_lines,
            dedup_lines_within_doc,
            remove_boilerplate_lines,
        )

        docs = dedup_lines_within_doc(
            clean_lines(docs, min_words=1)
        )
        if line_max_doc_freq is not None:
            docs = remove_boilerplate_lines(
                docs, max_doc_freq=line_max_doc_freq
            ).drop("n_boilerplate_dropped")
        docs = docs.drop("n_lines_dropped")
        stages.append(("line_cleaned", docs))

    # 1. PII scrub — downstream stages operate on the redacted text
    scrubbed = scrub_pii(docs)
    if max_pii_hits is not None:
        scrubbed = scrubbed.filter(
            (F.col("n_email") + F.col("n_ip") + F.col("n_phone")) <= max_pii_hits
        )
    scrubbed = scrubbed.select(
        "doc_id", F.col("redacted_text").alias("text")
    )
    stages.append(("pii_scrubbed", scrubbed))

    # 2. doc-level exact dedup (min-id survivor).  localCheckpoint: the
    # span stage consumes this frame TWICE (interval derivation + the
    # interval join-back) and the packing prefix sum is two jobs — the
    # checkpoint stops each downstream action from replaying the scrub +
    # dedup window from the scan (checkpoint RDDs are GC-released with
    # the result frames, unlike forgotten cache entries).
    w = Window.partitionBy(F.md5(F.col("text").cast("binary")))
    deduped_docs = (
        scrubbed.withColumn("_keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("_keep"))
        .drop("_keep")
        .localCheckpoint(eager=False)
    )
    stages.append(("exact_deduped", deduped_docs))

    # 3. span-level ExactSubstr removal + post-removal length floor
    despanned = remove_duplicate_spans(deduped_docs, span=span).select(
        "doc_id", F.col("deduped_text").alias("text")
    )
    deduped = despanned.filter(
        F.size(F.split(F.col("text"), " ")) >= min_tokens
    )
    stages.append(("span_deduped", deduped))

    # 3.5 optional near-dup canonicalization (cluster -> min-id keeper)
    if near_dup_pairs is not None:
        from jobcan_data_integrator_spark.operators.dedup import dup_clusters

        drop = (
            dup_clusters(near_dup_pairs(deduped))
            .filter(~F.col("keep"))
            .select("doc_id")
        )
        # docs in no pair never enter the cluster frame and pass through
        deduped = deduped.join(drop, "doc_id", "left_anti")
    stages.append(("near_deduped", deduped))

    # 4. optional learned-quality floor
    kept = deduped
    if classifier_floor is not None:
        if quality_scorer is None:
            raise ValueError(
                "classifier_floor needs a quality_scorer callback "
                "(build features on the frame, then score_logreg with "
                "weights fitted by train_logreg)"
            )
        kept = (
            quality_scorer(kept)
            .filter(F.col("classifier_score") >= classifier_floor)
            .select("doc_id", "text")
        )
    stages.append(("quality_kept", kept))

    # 5-6. chunk, then pack in shuffled order (chunks checkpointed: the
    # prefix sum's offset pass and the final shard pass both consume it)
    chunks = (
        chunk_documents(kept, max_tokens=chunk_tokens, overlap=chunk_overlap)
        .withColumn(
            "chunk_id",
            (F.col("doc_id") * 1_048_576 + F.col("chunk_idx")).cast("bigint"),
        )
        .localCheckpoint(eager=False)
    )
    stages.append(("chunks", chunks))
    packed = pack_shards(
        chunks.select("chunk_id", "n_tokens"),
        budget=budget,
        id_col="chunk_id",
        shuffle_salt=shuffle_salt,
    )
    stages.append(("packed", packed))

    return CurationResult(
        scrubbed=scrubbed,
        deduped=deduped,
        kept=kept,
        chunks=chunks,
        packed=packed,
        stages=stages,
    )

"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the
vocabulary-learning step a training-data pipeline runs before token
counting and shard packing.

Spark-first shape: training never touches the corpus row-by-row.  The
working set is the DISTINCT-WORD frequency table — ``(word, n, syms)``,
vocabulary-sized, orders of magnitude smaller than the corpus (one
map-side-combined groupBy builds it).  Each merge round is then:

1. pair counts: one in-row ``zip_with`` building adjacent symbol pairs
   + one explode + one map-side-combined groupBy weighted by word
   frequency (output rows bounded by the live pair vocabulary);
2. argmax: ``orderBy(count desc, pair asc).limit(1)`` — Spark's
   TakeOrdered, a per-partition partial top-1, no global sort shuffle;
3. merge application: an in-row left-to-right greedy fold
   (``F.aggregate`` over the symbol array — a Catalyst higher-order
   function, JVM-side, no Python) rewriting only the word table.

The driver holds exactly one (a, b) pair per round plus the learned
merge list — no corpus data.  Lineage is truncated with
``localCheckpoint`` every few rounds (the connected-components
pattern, operators/dedup.py) so K rounds cost K bounded jobs, not an
exponentially deepening plan.

Determinism: counts are exact integers and the argmax tiebreak is
lexicographic on the pair, so the learned merge list is a pure
function of the corpus — same on every engine, partitioning, and rerun
(tests/test_bpe.py pins it against a pure-Python replica).

``encode_bpe`` applies a learned merge list to documents with the same
fold, batching a few merges per projection (expression-tree depth
stays bounded) — narrow, zero-shuffle, increment-shaped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(word: Column) -> Column:
    """Split a word into single characters (Spark's split keeps the
    trailing empty match of the ``(?!^)`` lookahead; drop it)."""
    return F.filter(F.split(word, "(?!^)"), lambda s: s != F.lit(""))

#: end-of-word marker symbol (kept out of the corpus alphabet by ' '
#: tokenization — documents cannot contain a space-delimited '</w>').
EOW = "</w>"

#: merges applied per projection when encoding (bounds codegen depth)
_ENCODE_BATCH = 8

#: rounds between localCheckpoint lineage truncations while training
_CHECKPOINT_EVERY = 4


def word_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n, syms): the distinct-word working set of BPE training.

    ``syms`` is the word split into single characters with the EOW
    marker appended — the classic initial symbol sequence."""
    words = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "word",
            "n",
            F.concat(
                _chars(F.col("word")), F.array(F.lit(EOW))
            ).alias("syms"),
        )
    )


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Left-to-right greedy merge of adjacent (a, b) into a+b — the
    standard BPE application order ('aaa' under (a,a) -> ['aa','a']).
    Pure Catalyst higher-order aggregate; literals ride F.lit (no SQL
    string splicing, so symbols may contain any character)."""
    def step(acc: Column, x: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(a + b)),
            ),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair counts weighted by word frequency."""
    pairs = F.expr(
        "filter(zip_with(syms, slice(syms, 2, size(syms)),"
        " (x, y) -> struct(x as a, y as b)), p -> p.b is not null)"
    )
    return (
        words.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def compatible_merges(
    ranked: list[tuple[str, str]], limit: int
) -> list[tuple[str, str]]:
    """Greedy prefix of a ranked pair list whose merges can be learned
    from ONE count snapshot: a candidate is taken only if none of its
    symbols — nor its merged symbol — collides with any symbol or
    merged symbol already taken.  Symbol-disjoint merges touch disjoint
    adjacencies, so their applications commute and no taken merge can
    change another's snapshot count or feed it new instances; the
    merged-symbol check additionally rejects a pair that would consume
    (or produce) a symbol another taken merge creates (e.g. ('ab','c')
    after ('a','b') — those do NOT commute).  Deterministic: a pure
    function of the ranked list, shared verbatim with the pure-Python
    replica in tests/test_bpe.py."""
    taken: list[tuple[str, str]] = []
    seen: set[str] = set()
    for a, b in ranked:
        if len(taken) >= limit:
            break
        if a in seen or b in seen or (a + b) in seen:
            continue
        taken.append((a, b))
        seen.update((a, b, a + b))
    return taken


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    batch: int = 1,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merge rules from a corpus.

    Stops early when no adjacent pair reaches ``min_count``.  Returns
    the ordered merge list — the whole trained artifact (the driver
    never holds word or corpus data).

    ``batch`` > 1 learns up to ``batch`` COMPATIBLE merges per count
    round (see :func:`compatible_merges`): a production 32k–64k-merge
    vocabulary then costs ~n_merges/batch Spark rounds instead of one
    sequential job per merge — the difference between hours of
    scheduler overhead and minutes, at any cluster size.  ``batch=1``
    is classic Sennrich BPE; ``batch>1`` is the standard batched
    variant (identical within a round's compatible set, and the exact
    batched rule is replica-pinned in tests/test_bpe.py).

    ``stats``, if given, is filled with ``{"rounds": <count-round
    jobs run>}`` — the measurable half of the ~n_merges/batch claim
    (scale_smoke.py asserts it at a production-ish merge count)."""
    if batch < 1:
        raise ValueError(f"batch must be >= 1: {batch}")
    words = word_frequency_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    rounds = 0
    while len(merges) < n_merges:
        want = min(batch, n_merges - len(merges))
        # over-fetch ranked rows so skipped incompatible pairs do not
        # starve the batch — the pinned replica (tests/test_bpe.py)
        # ranks the FULL live pair list, so a deeper cap only converges
        # toward it; 32x a 32-batch is ~1k tiny (a, b, cnt) rows, noise
        # next to the count job itself, and a still-starved batch just
        # means one extra (cheap) round
        top = (
            _pair_counts(words)
            .filter(F.col("cnt") >= min_count)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(max(want * 32, 256))
            .collect()
        )
        if not top:
            break
        taken = compatible_merges([(r.a, r.b) for r in top], want)
        merges.extend(taken)
        col = F.col("syms")
        for a, b in taken:
            col = _merge_fold(col, a, b)
        words = words.select("word", "n", col.alias("syms"))
        rounds += 1
        # truncate lineage so round k's plan doesn't embed rounds 1..k-1
        if rounds % _CHECKPOINT_EVERY == 0:
            words = words.localCheckpoint(eager=True)
    if stats is not None:
        stats["rounds"] = rounds
    return merges


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list: adds ``out_col`` =
    array<string> of BPE tokens (EOW markers folded into the final
    token of each word, matching the training representation).

    Narrow and zero-shuffle: each word is encoded in-row via the same
    greedy fold, ``_ENCODE_BATCH`` merges per projection to bound the
    expression tree.  Works identically on a full corpus or an
    increment — encoding is stateless given the merge list."""
    words = F.expr(
        f"filter(split({text_col}, ' '), w -> w != '')"
    )
    encoded = docs.withColumn(
        "_wsyms",
        F.transform(
            words,
            lambda w: F.concat(_chars(w), F.array(F.lit(EOW))),
        ),
    )
    def batch_applier(batch: list[tuple[str, str]]):
        # single-arg closure: F.transform inspects arity, and a second
        # (defaulted) parameter would be bound to the index column
        def apply_batch(syms: Column) -> Column:
            for a, b in batch:
                syms = _merge_fold(syms, a, b)
            return syms

        return apply_batch

    for i in range(0, len(merges), _ENCODE_BATCH):
        encoded = encoded.withColumn(
            "_wsyms",
            F.transform(
                F.col("_wsyms"), batch_applier(merges[i : i + _ENCODE_BATCH])
            ),
        )
    return encoded.withColumn(
        out_col, F.flatten(F.col("_wsyms"))
    ).drop("_wsyms")


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-document token count under a learned merge list — the
    tokenizer-accurate input for pack_shards/chunk_documents (whitespace
    counts undercount budget pressure from rare words).  Narrow and
    zero-shuffle like encode_bpe."""
    enc = encode_bpe(docs, merges, text_col, "_bpe_toks")
    return enc.withColumn(out_col, F.size("_bpe_toks")).drop("_bpe_toks")


def save_bpe(store, merges: list[tuple[str, str]]) -> None:
    """Persist a learned merge list as the (rank, a, b) ``bpe_merges``
    table — the whole trained artifact is vocabulary-sized (a few
    thousand rows), so the table IS the tokenizer: every engine reading
    the store tokenizes identically forever after."""
    spark = store.spark
    store.overwrite(
        "bpe_merges",
        spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(merges)],
            "rank int, a string, b string",
        ),
    )


def load_bpe(store) -> list[tuple[str, str]]:
    """Load a merge list saved by :func:`save_bpe`, in rank order (the
    order IS the tokenizer — merges do not commute)."""
    return [
        (r.a, r.b)
        for r in store.read("bpe_merges").orderBy("rank").collect()
    ]


def bpe_stats(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    approx_vocab: bool = False,
) -> DataFrame:
    """One-row tokenizer health report for a corpus under a merge list:
    document/token/char counts, chars-per-token (the compression a
    longer merge list buys), and the REALIZED vocabulary (distinct
    tokens actually emitted — the working vocab size, which a too-small
    merge list leaves near the alphabet and a converged one pushes
    toward |merges| + alphabet).

    One encode pass (narrow) + one global aggregate.  The exact
    distinct-token count shuffles token strings; ``approx_vocab=True``
    swaps it for the HyperLogLog sketch (operators/sketch.py) — fixed
    register memory at any corpus size, the 100 TB path."""
    enc = encode_bpe(docs, merges, text_col, "_toks").localCheckpoint(
        eager=False
    )
    totals = enc.select(
        F.size("_toks").alias("n_toks"),
        F.length(F.col(text_col)).alias("n_chars"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.sum("n_chars") / F.sum("n_toks"), 4
        ).alias("chars_per_token"),
    )
    toks = enc.select(F.explode(F.array_distinct("_toks")).alias("t"))
    if approx_vocab:
        from jobcan_data_integrator_spark.operators.sketch import (
            hll_count_distinct,
        )

        est = int(round(hll_count_distinct(toks, "t")))
        vocab = docs.sparkSession.createDataFrame(
            [(est,)], "vocab_size bigint"
        )
    else:
        vocab = toks.agg(F.count_distinct("t").alias("vocab_size"))
    return totals.crossJoin(vocab)

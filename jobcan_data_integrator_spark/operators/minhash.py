"""MinHash / LSH building blocks shared by the full-corpus gates
(gate/llm.py) and the incremental new-vs-corpus dedup
(operators/incremental.py) — ONE implementation of the signature, the
banding, the candidate join, and the exact-Jaccard verify, so the
"full ≡ index ∪ increment" equivalence holds by construction.

Hashing is the portable md5-derived scheme: a base 60-bit hash per
shingle reduced mod P = 2^31-1, then an affine universal-hash family
h_i(x) = (A[i]*x + B[i]) mod P — ONE md5 per shingle instead of k (the
md5 was ~8x of the minhash cost), and plain bigint math that replays
identically in any engine (every product stays under 2^63).

Scale shape: signatures/bands are narrow per-doc projections with a
map-side-partial min aggregate; candidates are an equi-join on
(band_idx, band_key); the verify joins ONLY the candidate set — linear
in candidates, never quadratic in corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: universal-hash family modulus/coefficients (see module docstring)
MH_P = 2_147_483_647
MH_A = [1103515245, 1103517221, 2654435761, 805306457, 668265263, 374761393, 969581051, 1540483477]
MH_B = [12345, 362437, 521288629, 88675123, 5783321, 6543989, 14665, 9999971]

#: portable 60-bit hash of a string expression — identical in DuckDB via
#: ('0x' || substr(md5(x),1,15))::BIGINT (gate/_common aliases this).
H60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"


def shingle_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle string): 3-gram word shingles built in-row —
    array-transform over a pre-projected token array, then explode.
    ZERO shuffle: no window, no sort, no corpus-token exchange.

    Through round 10 this was explode + window lead, because on the
    Spark versions measured then the transform + explode formulation
    triggered InferFiltersFromGenerate: an implicit ``size(arr) > 0``
    filter containing the WHOLE shingle expression was pushed below the
    exchange and the construction ran twice on the map side.  Re-measured
    on Spark 4.1 (r11): the inferred filter is no longer planned for this
    shape — the physical plan is Scan → Generate with the expression
    evaluated exactly once, the row multiset is identical
    (``exceptAll`` both ways = 0 at sf0.1), and the window shape's
    corpus-token Exchange + Sort are gone.  At 100 TB that removed
    exchange is the dominant cost of every shingle consumer.

    The token array is projected in a SEPARATE select below the Generate
    so ``split`` runs once per document, not once per element_at.
    """
    toks = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_toks")
    )
    sh = (
        "CASE WHEN size(_toks) >= 3 THEN "
        "transform(sequence(0, size(_toks) - 3), "
        "i -> concat(element_at(_toks, i + 1), ' ', "
        "element_at(_toks, i + 2), ' ', element_at(_toks, i + 3))) "
        "ELSE array() END"
    )
    return toks.select("doc_id", F.explode(F.expr(sh)).alias("shingle"))


def hashed_shingle_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle bigint): shingles carried as 60-bit hashes — the
    input every index/signature function here expects."""
    return shingle_rows(docs, text_col).select(
        "doc_id", F.expr(H60.format(x="shingle")).alias("shingle")
    )


def signature_rows(hashed_shingles: DataFrame, n_hashes: int = 8) -> DataFrame:
    """(doc_id, h_idx int, minhash bigint) — one row per doc per hash fn.

    ``hashed_shingles``: (doc_id, shingle bigint) rows carrying the
    60-bit base hash.  Duplicate (doc, shingle) rows are fine: min() is
    insensitive.
    """
    a = "array(" + ", ".join(f"{v}L" for v in MH_A[:n_hashes]) + ")"
    b = "array(" + ", ".join(f"{v}L" for v in MH_B[:n_hashes]) + ")"
    hashed = hashed_shingles.select(
        "doc_id", F.expr(f"pmod(shingle, {MH_P})").alias("hs")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_hashes - 1}), i -> struct(i,"
                f" pmod(element_at({a}, i + 1) * hs + element_at({b}, i + 1),"
                f" {MH_P}) as h))"
            )
        ).alias("x"),
    )
    return hashed.groupBy("doc_id", F.col("x.i").alias("h_idx")).agg(
        F.min("x.h").alias("minhash")
    )


def band_rows(
    hashed_shingles: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(doc_id, band_idx, band_key) — LSH banding of the minhash
    signature; ``band_key`` is an md5 over the band's ordered slots."""
    sig = signature_rows(hashed_shingles, n_hashes)
    return (
        sig.groupBy("doc_id", F.expr(f"h_idx div {band_size}").alias("band_idx"))
        .agg(F.array_sort(F.collect_list(F.struct("h_idx", "minhash"))).alias("mins"))
        .select(
            "doc_id",
            "band_idx",
            F.md5(
                F.concat_ws(
                    "_", F.transform(F.col("mins"), lambda x: x["minhash"].cast("string"))
                ).cast("binary")
            ).alias("band_key"),
        )
    )


def candidate_pairs(
    bands: DataFrame, other_bands: DataFrame | None = None
) -> DataFrame:
    """Distinct (doc_a, doc_b) LSH candidates: pairs sharing at least one
    (band_idx, band_key).

    One frame: within-set pairs, ordered ``doc_a < doc_b``.  Two frames:
    cross pairs (one doc from each side), normalized to the same
    ``(least, greatest)`` ordering — so within- and cross-candidates from
    a split corpus union to exactly the full corpus's candidate set.
    """
    a = bands.alias("a")
    if other_bands is None:
        b = bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )
    b = other_bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )


def verify_candidate_pairs(
    cands: DataFrame, shingles: DataFrame, sizes: DataFrame
) -> DataFrame:
    """Exact-Jaccard verification over the candidate set ONLY.

    (doc_a, doc_b, n_common, jaccard) with the candidate set as the
    output row set (left join: zero-overlap candidates surface with
    n_common = 0).  ``shingles`` = distinct (doc_id, shingle) covering
    every candidate doc; ``sizes`` = (doc_id, n) distinct-shingle counts.
    The candidate set is broadcast (it is tiny — that is the point of
    LSH), so the shingle join prunes to |cands|·|shingles-per-doc| rows.
    """
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        F.broadcast(cands)
        .join(a, F.col("doc_a") == F.col("a.doc_id"))
        .join(
            b,
            (F.col("doc_b") == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    n_common = F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint")
    return (
        cands.join(inter, ["doc_a", "doc_b"], "left")
        .join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            n_common.alias("n_common"),
            F.round(
                n_common.cast("double")
                / (F.col("sa.n") + F.col("sb.n") - n_common),
                6,
            ).alias("jaccard"),
        )
    )


def shingle_sizes(distinct_shingles: DataFrame) -> DataFrame:
    """(doc_id, n): distinct-shingle count per doc (the Jaccard union
    denominators)."""
    return distinct_shingles.groupBy("doc_id").agg(F.count("*").alias("n"))

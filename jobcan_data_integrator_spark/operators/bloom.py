"""Bloom-filter decontamination: membership-test a 100 TB corpus
against a benchmark shingle set WITHOUT broadcasting the raw set or
shuffling the corpus.

The tx_contamination gate broadcasts the benchmark's hashed shingles
into an equi-join — right for thousands of shingles.  When the
held-out suite grows to tens of millions of shingles the broadcast
table stops being free; the standard fix is a Bloom filter: k bit
positions per element in an m-bit array, membership = all k bits set,
false-positive rate ~ (1 - e^(-kn/m))^k with NO false negatives.

Shape chosen for Spark:

- the BENCHMARK side (always the small side in decontamination) is
  collected to the driver once and folded into the bit array there —
  one pass over n elements, no cluster round-trip per element;
- the bit array ships to executors as a BROADCAST VARIABLE read by the
  membership expression, ~m/8 bytes total (a 10M-element set at 1% FPR
  is ~12 MB — vs hundreds of MB for the equi-join hash relation);
- the corpus side is a NARROW in-row test (k bit probes per shingle,
  whole-stage codegen arithmetic, zero shuffle, zero join) producing a
  small candidate set that the exact verify join then confirms —
  false positives die there, so end-to-end results are EXACT while the
  corpus-side cost drops to a scan.

Hashing is the repo's portable md5-60-bit scheme (operators/minhash.H60
preimages ``f"{i}|{value}"`` per probe i), so the same positions are
derivable in any engine and the filter is deterministic — no RNG, no
JVM-specific hashing.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def optimal_params(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target false-positive rate — the
    textbook m = -n ln p / (ln 2)^2, k = (m/n) ln 2, both rounded up to
    at least 1.  m is additionally rounded up to a multiple of 64 so the
    bit array packs into longs exactly."""
    if n_items <= 0:
        raise ValueError(f"n_items must be positive, got {n_items}")
    if not (0.0 < fpr < 1.0):
        raise ValueError(f"fpr must be in (0, 1), got {fpr}")
    m = max(64, math.ceil(-n_items * math.log(fpr) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round((m / n_items) * math.log(2)))
    return m, k


def _positions(value: int, m_bits: int, k_hashes: int) -> list[int]:
    """Driver-side replica of the executor-side probe positions: the
    md5-60-bit hash of ``f"{i}|{value}"`` mod m, per probe i."""
    out = []
    for i in range(k_hashes):
        h = int(hashlib.md5(f"{i}|{value}".encode()).hexdigest()[:15], 16)
        out.append(h % m_bits)
    return out


def build_bloom(values: list[int], m_bits: int, k_hashes: int) -> list[int]:
    """Fold integer elements into the packed bit array (little-endian
    longs, m_bits/64 entries) — driver-side, one pass.

    Words are returned as SIGNED two's-complement int64 (bit 63 set ⇒
    negative) because they ship as a Spark ``bigint`` array; the probe's
    ``(word >> pos) & 1`` reads bit ``pos`` identically either way (the
    arithmetic shift's sign-extension only touches bits above ``pos``).
    """
    words = [0] * (m_bits // 64)
    for v in values:
        for pos in _positions(v, m_bits, k_hashes):
            words[pos // 64] |= 1 << (pos % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def _member_expr(col: str, words_col: str, m_bits: int, k_hashes: int) -> Column:
    """All-k-bits-set test against a packed long array column — pure
    in-row arithmetic (md5 + shifts), whole-stage codegen."""
    tests = []
    for i in range(k_hashes):
        pos = (
            f"pmod(cast(conv(substr(md5(concat('{i}', '|',"
            f" cast({col} as string))), 1, 15), 16, 10) as bigint), {m_bits})"
        )
        tests.append(
            f"(shiftright(element_at({words_col}, cast(({pos}) div 64 as int) + 1),"
            f" cast(pmod({pos}, 64) as int)) & 1L) = 1L"
        )
    return F.expr(" AND ".join(tests))


def bloom_candidates(
    corpus: DataFrame,
    bench_values: list[int],
    value_col: str = "shingle",
    fpr: float = 0.01,
) -> DataFrame:
    """Rows of ``corpus`` whose ``value_col`` (bigint) MIGHT be in the
    benchmark set: no false negatives, ~``fpr`` false positives.  The
    bit array rides a one-row broadcast (constant-folded per batch); the
    corpus side is a narrow scan — follow with an exact join on the
    candidate set (now tiny) to make results exact, as
    ``bloom_contamination`` does."""
    m_bits, k_hashes = optimal_params(max(1, len(bench_values)), fpr)
    words = build_bloom(bench_values, m_bits, k_hashes)
    spark = corpus.sparkSession
    filt = spark.createDataFrame([(words,)], "_bloom array<bigint>")
    return (
        corpus.crossJoin(F.broadcast(filt))
        .filter(_member_expr(value_col, "_bloom", m_bits, k_hashes))
        .drop("_bloom")
    )


def bloom_contamination(
    corpus_shingles: DataFrame,
    bench_shingles: DataFrame,
    min_hits: int = 3,
    fpr: float = 0.01,
) -> DataFrame:
    """(doc_id, bench_id, n_hits): the tx_contamination sweep with the
    corpus-side join replaced by Bloom prefilter + exact verify — same
    EXACT results (the verify join kills false positives), corpus cost
    one narrow scan plus a join over only the surviving candidates.

    ``corpus_shingles``/``bench_shingles`` are (doc_id, shingle bigint)
    frames; the benchmark frame is collected driver-side (it is the
    small side by definition — that is the same assumption the
    broadcast-join path already makes)."""
    bench_rows = (
        bench_shingles.select("doc_id", "shingle").distinct().collect()
    )
    bench_set = list({r["shingle"] for r in bench_rows})
    cand = bloom_candidates(corpus_shingles, bench_set, "shingle", fpr)
    bench = (
        bench_shingles.sparkSession.createDataFrame(
            [(r["doc_id"], r["shingle"]) for r in bench_rows],
            "bench_id long, shingle long",
        )
    )
    return (
        cand.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.countDistinct("shingle").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )

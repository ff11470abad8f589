"""Engine-portable Bloom filter for cross-corpus membership dedup.

The scale story: "have we crawled/trained on this document before?"
against a reference corpus of billions of keys cannot be a join of two
100 TB tables. A Bloom filter compresses the reference key set to m bits
(here represented as the relation of SET bit positions — at most m rows
regardless of corpus size, broadcastable), built with one distinct
aggregate, probed with one broadcast equi-join. False positives are
possible (classic Bloom guarantee), false negatives are not — probe
results carry the exact verdict alongside so the FP rate is observable.

Portability: bit positions come from the repo's sha256-prefix hash
(``functions/textstats.word_hash``) — the identical filter, bit for bit,
is computable in DuckDB (the oracle does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.textstats import word_hash

BLOOM_M = 1 << 16  # bits
BLOOM_K = 4  # hash functions


def bloom_positions(key, k: int = BLOOM_K, m: int = BLOOM_M) -> F.Column:
    """The k (possibly colliding) bit positions of ``key`` — portable
    hash of 'r|key' mod m for r in 0..k-1."""
    return F.array(
        *[
            F.pmod(word_hash(F.concat(F.lit(f"{r}|"), key)), F.lit(m))
            for r in range(k)
        ]
    )


def bloom_build(
    df: DataFrame, key, k: int = BLOOM_K, m: int = BLOOM_M
) -> DataFrame:
    """Set-bit relation (pos) of the filter over ``key`` — ≤ m rows.
    One explode + one distinct (map-side combinable)."""
    return (
        df.select(F.explode(bloom_positions(key, k, m)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    bits: DataFrame,
    df: DataFrame,
    id_col: str,
    key,
    k: int = BLOOM_K,
    m: int = BLOOM_M,
) -> DataFrame:
    """(id, bloom_hit): hit ⇔ every DISTINCT probe position is set.

    The per-key positions may collide with each other, so the hit test
    compares matched-distinct-positions against the key's own distinct
    position count, not against k. ``bits`` is broadcast — it is ≤ m rows
    by construction."""
    probes = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(bloom_positions(key, k, m))).alias("pos"),
    )
    need = probes.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_need"))
    got = (
        probes.join(F.broadcast(bits), "pos")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_got"))
    )
    return need.join(got, id_col, "left").select(
        id_col,
        (F.coalesce("n_got", F.lit(0)) == F.col("n_need")).alias("bloom_hit"),
    )

"""Training-sample preparation: sliding token windows and sequence
packing.

An LLM training pipeline does not feed raw documents — it feeds
fixed-length token sequences. Two standard shapes:

* ``token_windows`` — split each document into size-``size`` windows
  with stride overlap (the long-document strategy: every token appears
  in ≥1 window, boundaries get context from the overlap). Pure
  array/HOF expressions — zero shuffle, a document never leaves its row.
* ``pack_samples`` — assign short samples to fixed-capacity bins by
  running token count (contiguous greedy packing, the standard
  approximation of bin packing for sequence packing). One window
  function per partition key; integer arithmetic only, so the
  assignment is reproducible across engines and reruns.

Scale note for ``pack_samples``: the window orders within a partition
key (default ``lang``) — packing is per-shard by design. A single
global ordering would serialize into one task at 10^12 rows; sharded
packing is also what training wants (homogeneous shards). All
arithmetic is exact integers (bigint ``div``), so bin ids are
bit-identical under any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ktpm___ocr_spark.functions.textstats import words_array


def token_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 50,
    stride: int = 25,
) -> DataFrame:
    """(id, win_idx, window_text, n_tokens) — whitespace-token windows of
    ``size`` tokens advancing by ``stride``. Zero-token documents emit no
    windows; the final window may be short (≥1 token). Window count =
    max(ceil((n−size)/stride), 0) + 1, computed as exact integer
    arithmetic ((n−size+stride−1) div stride) so both engines agree."""
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    if stride > size:
        raise ValueError(
            "stride must not exceed size — tokens between windows would "
            "be silently skipped, violating the every-token-covered "
            "contract"
        )
    base = (
        df.select(F.col(id_col), words_array(F.col(text_col)).alias("_ws"))
        .withColumn("_n", F.size("_ws").cast("long"))
        .filter(F.col("_n") > 0)
        .withColumn(
            "_last",
            F.greatest(
                F.expr(f"(_n - {size} + {stride} - 1) div {stride}"),
                F.lit(0).cast("long"),
            ),
        )
    )
    wins = base.select(
        id_col,
        "_ws",
        "_n",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("_last"))
        ).alias("win_idx"),
    )
    return wins.select(
        id_col,
        "win_idx",
        F.array_join(
            F.slice(
                F.col("_ws"),
                (F.col("win_idx") * stride + 1).cast("int"),
                size,
            ),
            " ",
        ).alias("window_text"),
        F.least(
            F.lit(size).cast("long"), F.col("_n") - F.col("win_idx") * stride
        ).alias("n_tokens"),
    )


def pack_samples(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    part_col: str = "lang",
    capacity: int = 2048,
) -> DataFrame:
    """(part, id, n_tokens, bin_id) — contiguous greedy packing: walk the
    samples of each shard in ``id_col`` order, assign bin_id =
    exclusive-running-token-count div capacity. Samples never split; a
    bin may exceed capacity by at most one sample's tokens (the standard
    greedy bound). Deterministic: the order key is unique, the cumsum is
    an exact bigint, and div is portable integer division."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            F.col(part_col),
            F.col(id_col),
            F.col(tokens_col).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "_cum", F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
        )
        .select(
            part_col,
            id_col,
            "n_tokens",
            F.expr(f"_cum div {capacity}").alias("bin_id"),
        )
    )

"""Sequence packing — fixed-length training rows from variable-length docs.

The table this engine maintains holds pre-tokenized training sequences
(``tokens array<int>``); the consumer of that table is a training loader
that wants FIXED-length rows. This operator implements the standard
concat-and-chunk packing (GPT-style: concatenate documents in a
deterministic order, slice into ``seq_len``-token windows; documents cross
window boundaries, nothing is padded or dropped except the final partial
window per group).

Physical shape — fully declarative, no Python in the path:

1. a window cumulative sum of ``size(tokens)`` per ``group_col`` (ordered
   by ``order_col``) gives each doc its global token OFFSET within the
   group — one shuffle on the group key;
2. ``posexplode`` assigns every token its global position; ``chunk =
   floor(pos / seq_len)`` names its output row;
3. groupBy (group, chunk) + ``array_sort(collect_list(struct(pos, tok)))``
   reassembles each fixed-length row.

Scale note: packing is embarrassingly parallel ACROSS groups and the
window only sorts WITHIN a group, so ``group_col`` should be something
with enough cardinality to spread (language, source shard, bucket id —
at 100 TB you pack per storage shard, never globally; a global order
would serialize the whole corpus through one partition). The token
explode triples the row count transiently but is map-side until the
single (group, chunk) aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    tokens_col: str = "tokens",
    group_col: str = "lang",
    order_col: str = "doc_id",
    seq_len: int = 2048,
    drop_last: bool = True,
) -> DataFrame:
    """Pack ``tokens_col`` arrays into ``seq_len``-token rows per group.
    Returns (group, chunk_id, n_tokens, tokens); the trailing partial
    window of each group is dropped when ``drop_last`` (training loaders
    want uniform rows; keep it for eval).

    ``order_col`` must be UNIQUE within each group: ties would leave the
    running-sum window free to assign tied rows' offsets in arbitrary
    partition order, making chunk contents nondeterministic run-to-run.
    Key columns (doc_id) satisfy this by construction."""
    n = F.size(F.col(tokens_col))
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = df.select(
        F.col(group_col).alias("grp"),
        F.col(tokens_col).alias("_t"),
        (F.sum(n).over(w) - n).alias("_off"),
    )
    ex = offs.select(
        "grp",
        F.col("_off"),
        F.posexplode("_t").alias("_i", "tok"),
    ).select(
        "grp",
        (F.col("_off") + F.col("_i")).alias("pos"),
        "tok",
    )
    rows = (
        ex.groupBy("grp", (F.col("pos") / seq_len).cast("long").alias("chunk_id"))
        .agg(
            F.count("*").alias("n_tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ).alias(tokens_col),
        )
        .withColumnRenamed("grp", group_col)
    )
    if drop_last:
        rows = rows.where(F.col("n_tokens") == seq_len)
    return rows


def ntile_shards(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    n_shards: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Deterministic balanced shard assignment per group: rows are ordered
    by (md5(id), id) — the repo's engine-portable hash order, stable
    across engines, cluster sizes and retries — and dealt into
    ``n_shards`` equal-count shards with ``ntile``. The output-writing
    step of a curation pipeline: N equal files per source/language, with
    hash order guaranteeing each shard is an unbiased sample (a doc_id
    range split would correlate with crawl time).

    Returns the per-shard audit (group, shard, n_docs[, sum_weight]) a
    writer validates before committing a shard layout.

    Scale shape: one window shuffle keyed by group (the same bound as
    ``pack_sequences`` — shard within storage groups, never globally) +
    a map-side-combined count. ntile balances counts exactly (sizes
    differ by at most 1); for token-balanced shards feed ``weight_col``
    and read the audit — equal-count hash shards are already
    token-balanced to O(1/sqrt(n)) by the CLT, which is why writers use
    this instead of bin-packing."""
    order_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(order_key, F.col(id_col))
    aggs = [F.count("*").alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("sum_weight"))
    return (
        df.select(
            group_col,
            id_col,
            *( [weight_col] if weight_col else [] ),
            F.ntile(n_shards).over(w).alias("shard"),
        )
        .groupBy(group_col, "shard")
        .agg(*aggs)
    )


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Per-document overlapping token windows — the RAG / long-context
    chunking complement to ``pack_sequences`` (which concatenates ACROSS
    docs; this never crosses a document boundary). Window ``j`` covers
    tokens ``[j*stride, j*stride + size)``; the last window is the final
    partial remainder (nothing dropped), and a doc shorter than ``size``
    yields exactly one whole-doc chunk. ``stride < size`` gives the
    standard ``size - stride`` token overlap between neighbors.

    Returns (id, chunk_idx, chunk: array, n_tokens). Pure map-only
    projection — ``sequence`` + ``transform``/``slice`` build every
    window inside codegen, no shuffle, no explode of individual tokens,
    embarrassingly parallel at any corpus size. NULL token arrays (rows
    from before the column evolved in) yield no chunks.

    ``n_chunks = 1 + ceil(max(0, len - size) / stride)`` — the count
    that makes the final window start at the last stride position that
    still adds unseen tokens."""
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    toks = F.col(tokens_col)
    n = F.size(toks)
    n_chunks = F.lit(1) + F.greatest(
        F.lit(0), F.ceil((n - F.lit(size)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.struct(
            j.alias("chunk_idx"),
            F.slice(toks, j * stride + 1, size).alias("chunk"),
        ),
    )
    ex = df.where(toks.isNotNull()).select(
        F.col(id_col), F.explode(chunks).alias("w")
    )
    return ex.select(
        F.col(id_col),
        F.col("w.chunk_idx").alias("chunk_idx"),
        F.col("w.chunk").alias("chunk"),
        F.size("w.chunk").alias("n_tokens"),
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    span_len: int = 3,
    gap: int = 5,
    salt: str = "t5",
) -> DataFrame:
    """T5-style span-corruption pairs (Raffel et al. 2020, the C4
    denoising objective): mask random-ish token spans, return
    ``(id, inputs, targets)`` where each masked run collapses to one
    sentinel in ``inputs`` and ``targets`` lists every run as
    (sentinel, original tokens...). Sentinels are NEGATIVE ids (-1, -2,
    ... per doc, in run order) so the real vocabulary is untouched and
    no vocab-size parameter is needed.

    The "randomness" is the repo's engine-portable md5 rule: position
    ``i`` STARTS a span iff ``md5(salt|id|i)``'s first 4 hex digits mod
    ``gap`` == 0 (expected corruption rate ≈ span_len/gap before run
    merging); a position is masked iff any start lies within the
    preceding ``span_len`` window — overlapping spans merge into one
    run, exactly like T5's span sampling. Deterministic everywhere: the
    DuckDB oracle replays token-for-token.

    Shape: posexplode + ONE doc-keyed window chain (masked = windowed
    max over starts, run ids = windowed cumsum of run starts) + one
    groupBy reassembling both arrays with ``array_sort`` — a single
    shuffle, parallel across docs, nothing global. O(n) per doc (the
    windowed-max formulation, not an O(n·span) per-position rescan).
    Docs with EMPTY token arrays drop out (nothing to corrupt — the
    posexplode shape; filter empties upstream if they must survive).

    Reconstruction law (tested): splicing targets' run k in place of
    sentinel -k in ``inputs`` reproduces the original token array."""
    pos_tok = df.select(
        F.col(id_col),
        F.posexplode(F.col(tokens_col)).alias("_pos", "_tok"),
    )
    start = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(salt), F.col(id_col), F.col("_pos")
                    )
                ),
                1, 4,
            ),
            16, 10,
        ).cast("int") % gap
        == 0
    )
    w_span = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(-(span_len - 1), 0)
    )
    w_seq = (
        Window.partitionBy(id_col)
        .orderBy("_pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rows = (
        pos_tok.withColumn("_start", start.cast("int"))
        .withColumn("_masked", F.max("_start").over(w_span) == 1)
        .withColumn(
            "_runstart",
            F.col("_masked")
            & ~F.coalesce(
                F.lag("_masked", 1).over(
                    Window.partitionBy(id_col).orderBy("_pos")
                ),
                F.lit(False),
            ),
        )
        .withColumn(
            "_runid", F.sum(F.col("_runstart").cast("int")).over(w_seq)
        )
    )
    sentinel = (-F.col("_runid")).cast("int")
    inputs_val = F.when(F.col("_runstart"), sentinel).otherwise(
        F.col("_tok").cast("int")
    )
    in_rows = rows.where(~F.col("_masked") | F.col("_runstart")).select(
        F.col(id_col), F.struct("_pos", inputs_val.alias("v")).alias("_s")
    )
    tgt_vals = F.when(
        F.col("_runstart"),
        F.array(sentinel, F.col("_tok").cast("int")),
    ).otherwise(F.array(F.col("_tok").cast("int")))
    tgt_rows = rows.where(F.col("_masked")).select(
        F.col(id_col), F.struct("_pos", tgt_vals.alias("v")).alias("_s")
    )
    inputs = in_rows.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list("_s")), lambda s: s["v"]
        ).alias("inputs")
    )
    targets = tgt_rows.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list("_s")), lambda s: s["v"]
            )
        ).alias("targets")
    )
    # left join: a doc with no masked span has empty targets, never drops
    return inputs.join(targets, id_col, "left").select(
        F.col(id_col),
        "inputs",
        F.coalesce(
            F.col("targets"), F.array().cast("array<int>")
        ).alias("targets"),
    )


def fim_transform(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle transformation (Bavarian et al. 2022, "FIM"):
    split each token sequence at two seeded cut points into
    (prefix, middle, suffix) and emit the PSM reordering

        fim = [-1] + prefix + [-2] + suffix + [-3] + middle

    with negative sentinel markers (<PRE>/<SUF>/<MID>) so the vocabulary
    is untouched — the data transform that teaches causal models to
    infill. Cut points are the repo's engine-portable md5 rule
    (``md5(salt|id|k) % (n+1)`` for k=1,2, lo/hi ordered), so the same
    doc always splits the same way on any engine; empty segments are
    legal (cuts may coincide).

    A PURE PROJECTION: size/slice/concat in whole-stage codegen — no
    explode, no shuffle, no Python. At 100 TB this is a free map over
    the corpus. Returns (id, prefix, middle, suffix, fim)."""
    n = F.size(F.col(tokens_col))

    def cut(k: int):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit(salt), F.col(id_col), F.lit(k)
                        )
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long") % (n + 1)
        ).cast("int")

    c1, c2 = cut(1), cut(2)
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    toks = F.col(tokens_col).cast("array<int>")
    prefix = F.slice(toks, 1, lo)
    middle = F.slice(toks, lo + 1, hi - lo)
    suffix = F.slice(toks, hi + 1, n - hi)
    sent = lambda v: F.array(F.lit(v).cast("int"))  # noqa: E731
    return df.select(
        F.col(id_col),
        prefix.alias("prefix"),
        middle.alias("middle"),
        suffix.alias("suffix"),
        F.concat(
            sent(-1), prefix, sent(-2), suffix, sent(-3), middle
        ).alias("fim"),
    )

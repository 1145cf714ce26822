"""Corpus curation: deterministic sampling, mixture weighting, quality
filtering — the dataset-assembly surface of a training-data pipeline.

Physical rules:
  * Sampling is a pure filter on a multiplicative hash of the id — no RNG
    state, no shuffle, reproducible on any cluster layout, and expressible
    in plain SQL (oracle-checkable), unlike rand(seed) whose stream depends
    on partitioning.
  * Mixture weighting composes per-source sampled filters with union —
    at 100 TB each source is pruned at its own scan; nothing materializes.
  * Quality filtering reuses llm.textqual metrics — one projection, no
    shuffle; the filter pushes into the scan where metrics allow.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textqual import language_id, quality_score

# a large odd multiplier gives good avalanche for sequential ids
# (Knuth multiplicative hashing); modulus 1e6 gives ppm-resolution rates
_MULT = 2654435761
_MOD = 1_000_000


def hash_bucket(id_col: Column, seed: int = 42) -> Column:
    """Deterministic bucket in [0, 1e6): ((id mod 1e6 + seed) * M) mod 1e6.
    The inner mod keeps the product within int64 for any id (ANSI mode
    raises on overflow; silent wrapping would also differ across engines)."""
    reduced = F.pmod(id_col.cast("long"), F.lit(_MOD)) + F.lit(seed)
    return F.pmod(reduced * F.lit(_MULT), F.lit(_MOD))


def deterministic_sample(df: DataFrame, id_col: str, rate: float,
                         seed: int = 42) -> DataFrame:
    """Keep ~rate of rows, chosen by id hash — same rows on every run and
    every cluster layout."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.where(hash_bucket(F.col(id_col), seed) < int(rate * _MOD))


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    seed: int = 42) -> DataFrame:
    """Keep each row independently with probability equal to its weight
    in [0, 1] — quality-weighted corpus downsampling (DataComp-style
    mixtures where a learned quality score IS the sampling rate). Same
    machinery as deterministic_sample, but the threshold is per-row:
    keep iff hash_bucket(id) < weight * 1e6. Weights are clamped to
    [0, 1]; NULL weights drop the row. Deterministic and
    layout-independent like every sampler here; a pure filter, so it
    pushes toward the scan."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    return df.where(hash_bucket(F.col(id_col), seed)
                    < (w * F.lit(float(_MOD))).cast("long"))


def mix_corpora(df: DataFrame, id_col: str, group_col: str,
                rates: dict[str, float], seed: int = 42,
                keep_ungrouped: bool = False) -> DataFrame:
    """Mixture weighting: per-group deterministic sampling rates (e.g.
    {'en': 1.0, 'fr': 0.5, 'de': 0.25}). Groups not listed are dropped
    unless ``keep_ungrouped``."""
    bucket = hash_bucket(F.col(id_col), seed)
    keep = F.lit(keep_ungrouped)
    for g, r in sorted(rates.items()):
        keep = F.when(F.col(group_col) == g, bucket < int(r * _MOD)).otherwise(keep)
    return df.where(keep)


def filter_documents(df: DataFrame, text_col: str = "text",
                     min_quality: float = 0.6,
                     languages: list[str] | None = None,
                     min_chars: int = 1, max_chars: int = 10_000_000) -> DataFrame:
    """Quality gate: composite quality score threshold, optional language
    allowlist, length bounds — one fused filter over the scan."""
    c = F.col(text_col)
    cond = (quality_score(c) >= min_quality) & \
        (F.coalesce(F.length(c), F.lit(0)).between(min_chars, max_chars))
    if languages:
        cond = cond & language_id(c).isin(languages)
    return df.where(cond)


def token_budget_sample(df: DataFrame, id_col: str, token_col: str,
                        budget_tokens: int | None = None,
                        group_col: str | None = None,
                        budgets: dict[str, int] | None = None,
                        seed: int = 42) -> DataFrame:
    """Sample documents up to a TOKEN budget (overall, or per group): rank
    rows by the deterministic id hash and keep the prefix whose cumulative
    token count stays within budget (the first row crossing the budget is
    kept, so the budget is met, not undershot).

    This is the mixture primitive when targets are token counts rather than
    rates (how pre-training mixtures are actually specified). Deterministic:
    the hash order is layout-independent, so the same ids are chosen on any
    cluster. Physical plan: grouped form = ONE window (cumulative sum
    ordered by hash, partitioned by group) — a single shuffle on the group
    key; ungrouped form (r6) = util.running_total — range-partitioned
    PARALLEL windows + driver-side per-partition offsets, so no task ever
    sees the whole stream (the previous global Window.orderBy did).
    """
    from pyspark.sql import Window

    grouped = group_col is not None
    if grouped != (budgets is not None) or grouped == (budget_tokens is not None):
        raise ValueError("pass either budget_tokens with no group_col, or "
                         "group_col with budgets")
    b = hash_bucket(F.col(id_col), seed)
    tagged = df.withColumn("__h", b)
    if group_col is None:
        # r6: the ungrouped stream uses util.running_total (range-
        # partitioned parallel windows + driver offsets) instead of a
        # global Window.orderBy, which funnels every row through one task
        from ..util import running_total
        cum = running_total(tagged, ["__h", id_col], token_col,
                            out_col="__cum")
        out = cum.where((F.col("__cum") - F.col(token_col))
                        < F.lit(budget_tokens))
    else:
        w = Window.partitionBy(group_col) \
            .orderBy(F.col("__h").asc(), F.col(id_col).asc()) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cum = tagged.withColumn("__cum", F.sum(F.col(token_col)).over(w))
        limit = F.coalesce(*([F.when(F.col(group_col) == g, F.lit(n))
                              for g, n in sorted(budgets.items())]
                             + [F.lit(0)]))
        out = cum.where((F.col("__cum") - F.col(token_col)) < limit)
    return out.drop("__h", "__cum")


def pack_sequences(df: DataFrame, id_col: str, token_col: str,
                   seq_len: int, group_col: str | None = None,
                   seed: int = 42) -> DataFrame:
    """Deterministic concat-then-chunk SEQUENCE PACKING — the step that
    turns a curated document set into fixed-length training sequences
    (GPT-style packing: documents laid end-to-end in a token stream,
    which is then cut every ``seq_len`` tokens; documents may straddle a
    cut). Returns the original rows plus:

      stream_offset  token offset of the document in its stream
      first_seq      index of the sequence its first token lands in
      last_seq       index of the sequence its last token lands in

    Order is the deterministic id hash (ties by id) — layout-independent
    and SQL-replicable, like every sampler here. With ``group_col`` each
    group is its own stream (one parallel window shuffle on the group
    key); the ungrouped form (r6) routes through util.running_total
    (range-partitioned parallel windows + driver offsets), so no task
    ever sees the whole stream.

    Sequence indexes are computed with exact integer arithmetic
    (subtract-pmod, then a decimal division of an exactly divisible
    value) — double division of large offsets would round past 2^53."""
    from pyspark.sql import Window

    if group_col:
        w = Window.partitionBy(group_col) \
            .orderBy(hash_bucket(F.col(id_col), seed).asc(),
                     F.col(id_col).asc()) \
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        work = df.withColumn(
            "__cum", F.sum(F.col(token_col).cast("long")).over(w))
    else:
        from ..util import running_total
        work = running_total(
            df.withColumn("__h", hash_bucket(F.col(id_col), seed)),
            ["__h", id_col], token_col, out_col="__cum").drop("__h")
    cum = F.col("__cum")
    offset = (cum - F.col(token_col)).cast("long")

    def seq_of(pos):
        exact = pos - F.pmod(pos, F.lit(seq_len))
        return (exact.cast("decimal(38,0)") / F.lit(seq_len)).cast("long")

    # zero-token docs: last token position would be offset-1 (one before
    # the doc) — clamp so first_seq == last_seq
    return (work.withColumn("stream_offset", offset)
            .withColumn("first_seq", seq_of(F.col("stream_offset")))
            .withColumn("last_seq",
                        seq_of(F.greatest(cum - 1, F.col("stream_offset"))))
            .drop("__cum"))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 512, overlap: int = 64) -> DataFrame:
    """Explode documents into fixed-size OVERLAPPING token chunks — the
    preprocessing step in front of embedding models and context-window-
    bounded training. Chunk k starts at token k*(chunk_tokens-overlap)
    and carries up to ``chunk_tokens`` tokens; a trailing start whose
    chunk would be fully inside the previous chunk's coverage is dropped
    (kept iff s == 0 or the previous chunk did not already reach the
    document end). Empty/null documents emit no chunks.

    Pure expressions — tokens computed once per doc, starts via
    sequence(), chunks via slice inside one transform (the TWO-parameter
    lambda is the intentional (element, index) form: the index IS the
    chunk id) — then one explode. No shuffle; the op rides the scan.
    Output: input columns + (chunk_id, chunk_text, n_chunk_tokens)."""
    from ..functions.text import tokenize

    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got "
                         f"overlap={overlap} chunk_tokens={chunk_tokens}")
    from ..util import bind_once

    stride = chunk_tokens - overlap

    # the token array is bound once per document (util.bind_once): the
    # start filter referenced its size per candidate start and the chunk
    # transform sliced it twice per chunk — each reference re-ran the
    # regex tokenizer in interpreted HOF mode (O(tokens x chunks) work)
    def per(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))) \
            .otherwise(F.array().cast("array<int>"))
        starts = F.filter(
            starts,
            lambda s: (s == 0) | (s - F.lit(stride) + F.lit(chunk_tokens) < n))
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.array_join(F.slice(toks, s + 1, chunk_tokens), " ")
                .alias("chunk_text"),
                F.size(F.slice(toks, s + 1, chunk_tokens))
                .alias("n_chunk_tokens")))

    chunks = bind_once(tokenize(F.col(text_col)), per)
    return (df.withColumn("__c", F.explode(chunks))
            .select("*", "__c.chunk_id", "__c.chunk_text",
                    "__c.n_chunk_tokens")
            .drop("__c"))


def diversity_sample(df: DataFrame, id_col: str, vec_col: str,
                     n_clusters: int = 16, per_cluster: int = 100,
                     seed: int = 42, fit_sample: float | None = None,
                     keep_cluster_col: bool = False,
                     centroids: list[list[float]] | None = None) -> DataFrame:
    """Cluster-balanced (diversity) sampling over an embedding column:
    KMeans the corpus into ``n_clusters`` semantic cells (the IVF coarse
    quantizer from llm.similarity — fit on ``fit_sample`` at scale, assign
    in one pass), then keep up to ``per_cluster`` documents per cell,
    chosen by id-hash order so the draw is deterministic and
    layout-independent.

    Uniform hash sampling mirrors the corpus distribution — dominated
    modes (boilerplate clusters, one hot language) stay dominant;
    cluster-balancing caps every mode at the same quota, the standard
    diversity-selection step in training-data pipelines. Undersized
    clusters contribute all their documents (count law:
    sum(min(cluster_size, per_cluster))).

    ``centroids`` (r7) injects explicit cell centroids and skips the
    KMeans fit — assignment becomes the pure nearest-centroid expression
    (squared euclidean, ties to the lower cell; the semantic_dedup /
    pq_encode injection contract), making the whole draw SQL-replicable.
    """
    from pyspark.sql.window import Window

    from .similarity import explicit_assignments, ivf_assignments

    if centroids is not None:
        assigned = explicit_assignments(df, id_col, vec_col, centroids)
    else:
        assigned, _ = ivf_assignments(df, id_col, vec_col,
                                      n_lists=n_clusters, seed=seed,
                                      fit_sample=fit_sample)
    cells = assigned.select(F.col("neighbor_id").alias(id_col), "_cell")
    w = (Window.partitionBy("_cell")
         .orderBy(hash_bucket(F.col(id_col), seed).asc(),
                  F.col(id_col).asc()))
    picked = (df.join(cells, id_col)
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= per_cluster)
              .drop("__rn"))
    return picked if keep_cluster_col else picked.drop("_cell")


def stratified_fixed_sample(df: DataFrame, group_col: str, id_col: str,
                            n_per_group: int, seed: int = 42) -> DataFrame:
    """Exactly min(n, group size) rows per group, drawn deterministically in
    id-hash order — fixed-size quotas where deterministic_sample gives
    fixed RATES (eval-set construction, per-class caps). One window
    shuffle; layout-independent like every sampler here."""
    from pyspark.sql.window import Window

    w = (Window.partitionBy(group_col)
         .orderBy(hash_bucket(F.col(id_col), seed).asc(),
                  F.col(id_col).asc()))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_group).drop("__rn"))


def expand_epochs(df: DataFrame, id_col: str, repeat_col: Column | str,
                  seed: int = 42, max_repeat: int = 100) -> DataFrame:
    """Replicate each row by a (possibly fractional) per-row repeat factor:
    ``floor(r)`` guaranteed copies plus one more with probability
    ``frac(r)``, decided by the same deterministic id-hash the samplers
    use — NOT rand(), so the expansion is identical on every run and
    cluster layout (and SQL-replicable). Adds ``epoch`` (1-based),
    ``n_epochs`` and keeps ``repeat_factor``.

    This is the epochs-per-domain primitive of mixture-weighted training
    sets (The Pile's per-set epochs, DoReMi-reweighted corpora — public
    recipes): upsample scarce high-value domains by r > 1, downsample
    bulk domains by r < 1 (r in [0,1) degenerates to weighted_sample).
    ``max_repeat`` caps r so a typo'd weight cannot explode the corpus
    (an r=1000 domain is a 1000x write amplification at 100 TB scale).

    Scale shape: a pure projection + explode — no shuffle, no RNG state;
    output size is sum(r_i) in expectation and exactly
    ``sum(floor(r_i)) + #{i: bucket_i < frac_i}`` deterministically."""
    r = F.least(F.greatest(
        (F.col(repeat_col) if isinstance(repeat_col, str) else repeat_col)
        .cast("double"), F.lit(0.0)), F.lit(float(max_repeat)))
    n_int = F.floor(r).cast("long")
    thr = F.floor((r - F.floor(r)) * F.lit(float(_MOD))).cast("long")
    n = (n_int + (hash_bucket(F.col(id_col), seed) < thr).cast("long"))
    epochs = F.when(n >= 1, F.sequence(F.lit(1).cast("long"), n)) \
              .otherwise(F.array().cast("array<long>"))
    return (df.withColumn("repeat_factor", r)
              .withColumn("n_epochs", n)
              .withColumn("epoch", F.explode(epochs)))


def domain_reweight(df: DataFrame, id_col: str, group_col: str,
                    target_shares: dict[str, float], scale: float = 1.0,
                    seed: int = 42, max_repeat: int = 100) -> DataFrame:
    """Reshape a corpus toward TARGET mixture proportions by per-domain
    repeat factors: domain d with observed count n_d and normalized target
    share p_d gets ``r_d = scale * p_d * N / n_d`` (N = total rows over
    kept domains), then rows expand through :func:`expand_epochs`. With
    scale=1 the output size stays ~N while the mixture moves to the
    target shares; scale is the corpus-size multiplier. Domains missing
    from ``target_shares`` are dropped (share 0).

    The share normalization happens driver-side over the CONFIG dict
    (data-independent); the per-domain counts are one aggregation job
    collected driver-side — BOUNDED by the number of target domains
    (config-sized, the same bounded-fit-collect class as sketch
    manifests), never by data volume. The factors then fold into the
    plan as literals, so the expansion is a pure scan -> filter ->
    explode with NO join and no shuffle."""
    if not target_shares:
        raise ValueError("target_shares must be non-empty")
    sum_w = float(sum(target_shares.values()))
    if sum_w <= 0:
        raise ValueError("target_shares must sum to a positive value")
    kept = df.filter(F.col(group_col).isin(*target_shares.keys()))
    counts = {r[0]: r[1] for r in
              kept.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
                  .collect()}
    n_total = sum(counts.values())
    # r_d = (scale * normalized_share * N) / n_d, IEEE order fixed as
    # (coef * N) / n so an SQL oracle can reproduce the exact double
    r_expr = F.lit(None).cast("double")
    for g in sorted(counts):
        coef = scale * (float(target_shares[g]) / sum_w)
        r_expr = F.when(F.col(group_col) == g,
                        F.lit((coef * n_total) / counts[g])).otherwise(r_expr)
    out = expand_epochs(kept.withColumn("_r", r_expr), id_col, "_r",
                        seed=seed, max_repeat=max_repeat)
    return out.drop("_r")


def temperature_shares(df: DataFrame, group_col: str,
                       temperature: float = 1.0) -> dict[str, float]:
    """Temperature-scaled mixture shares from OBSERVED domain counts:
    ``p_d ∝ (n_d / N) ** (1/T)`` — the multilingual sampling rule (mBERT /
    mT5 exponent-smoothed sampling; T=1 keeps natural proportions, larger
    T flattens toward uniform, boosting scarce domains). One bounded
    aggregation collect (#domains rows); feed the result to
    :func:`domain_reweight`."""
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    counts = {r[0]: r[1] for r in
              df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
                .collect()}
    n = sum(counts.values())
    if not n:
        return {}
    raw = {g: (c / n) ** (1.0 / temperature) for g, c in counts.items()}
    z = sum(raw.values())
    return {g: v / z for g, v in sorted(raw.items())}


def temperature_reweight(df: DataFrame, id_col: str, group_col: str,
                         temperature: float = 1.0, scale: float = 1.0,
                         seed: int = 42, max_repeat: int = 100) -> DataFrame:
    """Reshape a corpus to its temperature-scaled mixture
    (:func:`temperature_shares` -> :func:`domain_reweight`): at T=1 every
    repeat factor is exactly ``scale`` (the identity mixture — law-tested);
    as T grows, scarce domains repeat more and bulk domains sample down,
    approaching uniform shares. Same plan shape as domain_reweight: pure
    scan -> explode, factors are literals, no join."""
    shares = temperature_shares(df, group_col, temperature)
    return domain_reweight(df, id_col, group_col, shares, scale=scale,
                           seed=seed, max_repeat=max_repeat)

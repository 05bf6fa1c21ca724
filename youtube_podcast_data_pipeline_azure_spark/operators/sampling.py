"""Reproducible sampling, data mixing, and sequence-prep operators.

The training-data-pipeline counterpart to dedup/similarity: once a corpus
is cleaned and deduplicated, a pretraining run needs (a) reproducible
subsampling, (b) per-source mixture weighting, (c) long-document
chunking, and (d) sequence packing into fixed token budgets.  None of
these exist in the reference (batch ETL only, SURVEY.md §2.B); all are
expressed as deterministic built-in-expression plans so identical inputs
give identical samples on any cluster size — `df.sample()` is
seed-stable only per partitioning, which re-shuffles at 100 TB, so
content-hash gating is the reproducible form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constant (2^32 / phi); the bucket arithmetic
# stays below 2^63 for any bigint id after the mod, so it is ANSI-safe.
_KNUTH = 2654435761
_MOD = 4_294_967_296  # 2^32


def hash_bucket(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic pseudo-uniform bucket in [0, 2^32) from a numeric
    id — pure integer arithmetic, reproducible on any engine (the DuckDB
    oracle computes the identical expression; xxhash64 would be
    Spark-only).  For string keys, pre-hash to a number first."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c + F.lit(seed)) * F.lit(_KNUTH)) % F.lit(_MOD)


def hash_sample(
    df: DataFrame, id_col: str, rate: float, seed: int = 0
) -> DataFrame:
    """Keep a reproducible ``rate`` fraction of rows, gated on the row's
    content-id hash — membership is a pure function of (id, seed), so
    re-runs, retries, and different partitionings all select the same
    rows, and the filter pushes down to the scan."""
    return df.where(hash_bucket(id_col, seed) < int(rate * _MOD))


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Stratified mixture sampling: per-stratum keep rates (the data-
    mixing step of a pretraining pipeline — e.g. upweight wiki, downweight
    crawl).  One scan, no shuffle: the per-stratum threshold is a CASE
    expression over the same hash gate as :func:`hash_sample`."""
    thresh = F.lit(int(default_rate * _MOD))
    for value, rate in sorted(rates.items()):
        thresh = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * _MOD)))
            .otherwise(thresh)
        )
    return df.where(hash_bucket(id_col, seed) < thresh)


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: Column | str, seed: int = 0
) -> DataFrame:
    """Per-row weighted sampling: keep each row with probability equal
    to its (clamped to [0, 1]) weight expression — e.g. quality scores
    or length-proportional upweighting in a pretraining mix.  Same
    reproducibility contract as :func:`hash_sample`: membership is a
    pure function of (id, seed, weight), a scan-pushable filter with
    zero shuffles."""
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    clamped = F.least(F.greatest(wc.cast("double"), F.lit(0.0)), F.lit(1.0))
    thresh = F.floor(clamped * F.lit(float(_MOD))).cast("long")
    return df.where(hash_bucket(id_col, seed) < thresh)


def chunk_documents(
    df: DataFrame,
    tokens_col: Column | str,
    id_col: str = "doc_id",
    chunk_size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Split token arrays into overlapping fixed-size chunks (RAG /
    pretraining window prep): chunk i covers tokens
    [1 + i*stride, 1 + i*stride + chunk_size).  Narrow explode — no
    shuffle; output is (id, chunk_idx, chunk_text, n_tokens)."""
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(stride)
    )
    chunks = F.transform(starts, lambda s: F.slice(toks, s, chunk_size))
    exploded = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_toks")
    )
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.concat_ws(" ", "chunk_toks").alias("chunk_text"),
        F.size("chunk_toks").cast("long").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)


def pack_sequences(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    budget: int = 2048,
) -> DataFrame:
    """Assign documents to fixed-token-budget packing bins (sequence
    packing for pretraining batches): documents are laid out in
    deterministic id order and cut into bins of ~``budget`` tokens via a
    running-sum window — bin = floor(cumulative_tokens_before / budget).

    This is the shuffle-once approximation of greedy first-fit packing
    (which is inherently sequential): one window over ``group_col``
    keeps per-group state bounded; at 100 TB you pack within natural
    groups (shard/source) so no global ordering is needed.
    """
    parts = [group_col] if group_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    cols = [F.col(group_col)] if group_col else []
    return df.select(
        *cols,
        F.col(id_col),
        F.col(token_count_col).alias("n_tokens"),
        F.floor(before / F.lit(budget)).cast("long").alias("pack_id"),
    )


def dataset_split(
    df: DataFrame,
    id_col: str,
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 0,
) -> DataFrame:
    """Reproducible train/val/test assignment: each row's split is a
    pure function of (id, seed) via the same content-hash gate as
    :func:`hash_sample`, so the partition is stable under re-runs,
    retries, repartitioning, and incremental appends (a new batch's
    rows land in the same splits they would have in a full rebuild —
    the property random `randomSplit` lacks).

    Zero shuffles: the assignment is a CASE over cumulative hash
    thresholds, evaluated at the scan.  Adds a ``split`` column.
    """
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    b = hash_bucket(id_col, seed)
    acc = 0.0
    expr = None
    for name, w in zip(names[:-1], weights[:-1]):
        acc += w
        cond = b < int(acc * _MOD)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", split)


def reservoir_per_key(
    df: DataFrame, key_col: str, id_col: str, k: int, seed: int = 0
) -> DataFrame:
    """Deterministic uniform k-without-replacement per key: rank rows
    inside each key by their content hash and keep the k smallest —
    the content-hash formulation of per-stratum reservoir sampling.

    Unlike a true streaming reservoir (random, order-dependent), the
    hash rank is a pure function of (id, seed): re-runs, retries, and
    any partitioning draw the SAME sample, which is what a reproducible
    training-data pipeline needs, and what makes the operator
    oracle-checkable.  Uniformity comes from the hash's
    pseudo-uniformity over ids.  One shuffle (the per-key rank window);
    for keys with astronomically many rows, put a coarse
    ``hash_bucket < t`` pre-filter in front to bound the window input.
    """
    w = Window.partitionBy(key_col).orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rsv_rank", F.row_number().over(w))
        .where(F.col("_rsv_rank") <= k)
        .drop("_rsv_rank")
    )


def upsample_mixture(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """Mixture building with rates ABOVE 1.0: temperature-style
    upsampling of low-resource strata (the UniMax / T5 temperature-
    mixing step), the replication complement of :func:`mixture_sample`'s
    keep-rate downsampling.

    A stratum at rate r emits floor(r) full copies of every row plus
    one more gated at probability frac(r) through the shared
    :func:`hash_bucket` gate (gate key varies per copy index, so copy
    decisions are independent) — E[copies] = r up to the milli-rate
    quantization, and the output is a pure function of
    (id, seed, rates): stable under repartitioning, retries, and
    incremental appends, like every sampling surface here.

    Scale shape: one narrow explode of at most ceil(r) copy indexes per
    row — no shuffle, no driver state.  Replicated rows get a
    ``copy_id`` so downstream shuffles (e.g. pack_sequences grouping)
    can keep replicas distinct.  Rates below 1.0 degenerate to
    mixture_sample semantics (0 full copies, one gated copy).
    """
    import math

    max_copies = max(int(math.ceil(r)) for r in rates.values()) if rates else 1
    rate_milli = F.lit(0)
    for value, rate in sorted(rates.items()):
        rate_milli = F.when(
            F.col(strata_col) == value, F.lit(int(rate * 1000))
        ).otherwise(rate_milli)
    with_rate = df.withColumn("_rm", rate_milli)
    copies = F.filter(
        F.sequence(F.lit(0), F.lit(max(max_copies - 1, 0))),
        # copy i survives iff i < floor(r) (always) or i == floor(r)
        # and the per-copy hash gate clears the fractional remainder
        lambda i: (i < F.col("_rm") / 1000)
        & (
            ((i + 1) * 1000 <= F.col("_rm"))
            | (
                hash_bucket(
                    F.col(id_col) * F.lit(1000003) + i, seed
                )
                < (F.col("_rm") % 1000) * F.lit(_MOD // 1000)
            )
        ),
    )
    out = with_rate.select(
        "*", F.explode(copies).alias("copy_id")
    ).drop("_rm")
    return out


def training_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Deterministic global shuffle into training shards: every row gets
    (shard_id, position) from the content-hash gate — the
    write-the-training-set step, where examples must be (a) de-ordered
    (no crawl/source locality within a shard) and (b) reproducibly
    placed, so re-runs, retries, and incremental rebuilds yield
    byte-identical shards.

    shard = hash % n_shards (even split, no planning pass); position =
    rank of hash within the shard (ties → id, for exact determinism).
    One exchange on shard_id + one in-shard sort — never a global
    ``orderBy`` (a total sort's range partitioner needs a sampling job
    and couples every shard's boundaries; hash sharding needs neither).
    Feed the result to ``partitionBy("shard_id")`` writes, sorted by
    ``position`` (``io/writers.py:write_clustered`` composes).

    A true uniform permutation needs position to be globally unique
    only WITHIN a shard — cross-shard order is meaningless to a loader
    that interleaves shards, which is what makes the per-shard window
    scale-safe (state = one shard's rows, not the corpus).
    """
    h = hash_bucket(id_col, seed)
    w = Window.partitionBy("shard_id").orderBy(
        F.col("_h").asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_h", h)
        .withColumn("shard_id", (F.col("_h") % n_shards).cast("int"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .drop("_h")
    )


def packing_efficiency(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    budget: int = 2048,
) -> DataFrame:
    """Capacity-planning report for :func:`pack_sequences`: how full the
    fixed-budget packing bins actually are — the number a training team
    checks before burning GPU-hours on a padding-heavy layout.

    Composes the packing assignment (same deterministic id-order
    running-sum bins) and reduces it to ONE row: document/bin counts,
    total token mass, nominal capacity (bins × budget), utilization in
    basis points (floor), and how many documents individually exceed
    the budget (those need :func:`chunk_documents` first — packing
    cannot split them).

    Returns (n_docs, n_bins, total_tokens, capacity_tokens,
    utilization_bp, n_oversize_docs).
    """
    packed = pack_sequences(
        df, token_count_col, id_col=id_col, group_col=group_col,
        budget=budget,
    )
    parts = [group_col] if group_col else []
    return packed.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct(*(parts + ["pack_id"])).cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.countDistinct(*(parts + ["pack_id"])) * budget)
        .cast("long")
        .alias("capacity_tokens"),
        F.floor(
            F.sum("n_tokens") * 10000
            / (F.countDistinct(*(parts + ["pack_id"])) * budget)
        )
        .cast("long")
        .alias("utilization_bp"),
        F.sum(F.when(F.col("n_tokens") > budget, 1).otherwise(0))
        .cast("long")
        .alias("n_oversize_docs"),
    )


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weights_bp: dict[str, int],
    token_col: Column | str,
    token_budget: int | None = None,
) -> DataFrame:
    """Token-budget mixture planning: the Pile/LLaMA-style data-mix
    table.  Given target mixture weights (basis points per stratum) and
    a total token budget (default: the corpus's own token total),
    report per stratum how many tokens are available, how many the mix
    wants, and the resulting epoch factor:

        target_tokens = budget * weight_bp // 10000
        epochs_milli  = target_tokens * 1000 // n_tokens

    ``epochs_milli`` < 1000 means subsample (it IS the keep rate in
    milli-units, feed it to :func:`mixture_sample`); > 1000 means the
    stratum must repeat (upsample epochs, feed
    :func:`upsample_mixture`).  Strata absent from ``weights_bp`` get
    weight 0 but still report availability.  All arithmetic is 64-bit
    integer floor division — bit-exact on any engine (budget·10⁴ stays
    under 2⁶³ for any real corpus).

    Scale shape: ONE map-side-combined aggregate on the stratum key;
    the budget is a 1-row aggregate cross-joined back as a broadcast
    scalar; output is one row per stratum.  Nothing document-sized
    shuffles.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    per = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(tok).cast("long").alias("n_tokens"),
    )
    if token_budget is None:
        budget = per.agg(F.sum("n_tokens").alias("_budget"))
        per = per.crossJoin(F.broadcast(budget))
    else:
        per = per.withColumn(
            "_budget", F.lit(int(token_budget)).cast("long")
        )
    w = None
    for value, bp in sorted(weights_bp.items()):
        clause = (F.col("stratum") == value, F.lit(int(bp)))
        w = F.when(*clause) if w is None else w.when(*clause)
    w = (F.lit(0) if w is None else w.otherwise(F.lit(0))).cast("long")
    return (
        per.withColumn("weight_bp", w)
        .withColumn(
            "target_tokens", F.expr("_budget * weight_bp div 10000")
        )
        .select(
            "stratum",
            "n_docs",
            "n_tokens",
            "weight_bp",
            "target_tokens",
            # NULL (not DIVIDE_BY_ZERO under ANSI) for an empty
            # stratum: there is no finite epoch factor over 0 tokens
            F.expr(
                "case when n_tokens > 0 "
                "then target_tokens * 1000 div n_tokens end"
            ).alias("epochs_milli"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR: hashed n-gram importance resampling (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling")
# ---------------------------------------------------------------------------

def _hashed_grams(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    hasher: str,
) -> DataFrame:
    """(id, bucket) — one row per gram OCCURRENCE (unigrams + bigrams,
    the DSIR feature bag; duplicates kept, counts are the feature
    values), bucket = hash(gram) % n_buckets.

    ``hasher='xxhash64'`` is the production path (JVM hash, cheap);
    ``'md5'`` is the oracle seam — identical buckets in DuckDB via
    md5_number_upper (same convention as the CMS sketch / span
    corruption mask).
    """
    from ..functions.text import positional_ngrams, tokenize
    from .sketches import md5_int56
    from .util import spread

    toks = tokenize(F.col(text_col))
    # explicit feature map: unigrams for >= 1 token, bigrams for >= 2
    # (no short-tail/empty-string degenerate grams); empty docs emit
    # nothing and surface as (0, 0) through the scoring left join
    bigrams = F.when(
        F.size(toks) >= 2, positional_ngrams(toks, 2)
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(toks, bigrams)
    # spread() before the gram explode+hash (optimization r14, guide
    # §2.5 input skew): a single-file parquet scan is ONE partition
    # locally, so the md5-per-gram-occurrence pipeline — the dominant
    # DSIR cost on the oracle seam — ran on one core.  On a multi-split
    # cluster scan spread() is a no-op; here it is a narrow (id, text)
    # shuffle that unlocks the executor pool.
    exploded = spread(docs.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(grams).alias("_gram")
    )
    if hasher == "md5":
        h = md5_int56(F.concat(F.lit("dsir:"), F.col("_gram")))
    elif hasher == "xxhash64":
        h = F.xxhash64(F.concat(F.lit("dsir:"), F.col("_gram")))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    return exploded.select(
        F.col(id_col), F.pmod(h, F.lit(n_buckets)).cast("long").alias("_b")
    )


def dsir_importance_weights(
    docs: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    hasher: str = "xxhash64",
) -> DataFrame:
    """DSIR importance log-weights: score every raw document by how
    much its hashed-n-gram feature bag looks drawn from the TARGET
    distribution rather than the raw corpus — the mixture-TARGETING
    step the engine's mixture planner lacked (mixture_plan allocates
    token budgets across declared strata; DSIR weights individual
    documents toward a target domain).

    Per bucket b: r(b) = log p_target(b) - log q_raw(b), add-1 smoothed
    over ``n_buckets``; per document: logw = sum over its gram
    occurrences of r(bucket).  The per-BUCKET log-ratio is quantized to
    integer micro-units (floor(1e6 * r)) BEFORE the per-document sum,
    so the sum is pure int64 arithmetic — order-independent, ANSI-safe,
    and bit-identical on any engine (the only floats are n_buckets
    single ln() calls on the bounded ratio table).

    Scale shape: two gram scans (raw + target) collapse map-side to
    <= n_buckets partial rows each; the ratio table (n_buckets rows)
    broadcasts into the scoring join; per-doc sums partial-aggregate
    before the one id-shuffle.  Nothing document-sized moves twice.

    Returns (id_col, n_grams, logw_micro); docs with no grams get
    (0, 0).
    """
    # multi-consumer rule (r8): raw_grams feeds the q aggregate AND the
    # scoring join — unchecked, the gram hashing runs twice over the
    # corpus, which on the md5 oracle seam is the dominant cost (trap:
    # md5+conv ≈ 25× a parquet scan).  The materialized state is (id,
    # bucket) int pairs — 16 bytes per gram, far cheaper to store once
    # than to hash twice.  tgt_grams has one consumer; leave it lazy.
    raw_grams = _hashed_grams(
        docs, text_col, id_col, n_buckets, hasher
    ).localCheckpoint(eager=True)
    tgt_grams = _hashed_grams(target, text_col, id_col, n_buckets, hasher)
    q = raw_grams.groupBy("_b").agg(F.count("*").alias("_q"))
    p = tgt_grams.groupBy("_b").agg(F.count("*").alias("_p"))
    # Gram totals: ONE full-outer bucket join + a single bounded
    # single-partition window stage computes both totals (optimization
    # r14) — the previous shape paid THREE sequential single-partition
    # window stages (q total, p total, then the post-join max rescue
    # for target mass in buckets the raw corpus lacks).  sum(_q)/
    # sum(_p) over the full join see exactly the q/p tables' rows
    # (nulls ignored), so both totals are the same int64s and every
    # downstream double is bit-identical.  (An r14 A/B also folded the
    # collected ratio vector in as a plan-literal array to drop the
    # scoring broadcast-join — REJECTED: 2.47 s vs 1.72 s fresh at
    # sf0.1; the 2048-long literal costs more in codegen/plan handling
    # per construct than the broadcast build it replaced.)
    w_all = Window.partitionBy()
    joined = (
        q.join(p, "_b", "full")
        .withColumn("_n_raw", F.sum("_q").over(w_all))
        .withColumn("_t_all", F.coalesce(F.sum("_p").over(w_all), F.lit(0)))
        .where(F.col("_q").isNotNull())
    )
    ratio = joined.select(
        "_b",
        F.floor(
            F.lit(1_000_000.0)
            * (
                F.log(F.coalesce("_p", F.lit(0)) + F.lit(1.0))
                - F.log((F.col("_t_all") + F.lit(n_buckets)).cast("double"))
                - F.log(F.col("_q") + F.lit(1.0))
                + F.log((F.col("_n_raw") + F.lit(n_buckets)).cast("double"))
            )
        )
        .cast("long")
        .alias("_r_micro"),
    )
    # multi-consumer rule (r8): without this checkpoint the ratio
    # table's subplan — BOTH gram scans and their bucket aggregates —
    # is pasted into every downstream consumer (8 parquet scans in one
    # plan, ~5.9 s fresh at sf0.1 vs ~2.5 s after).  The materialized
    # state is <= n_buckets rows (KBs), the same bounded footprint the
    # broadcast already implied.
    ratio = ratio.localCheckpoint(eager=True)
    scored = (
        raw_grams.join(F.broadcast(ratio), "_b")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("_r_micro").cast("long").alias("logw_micro"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("logw_micro", F.lit(0))
            .cast("long")
            .alias("logw_micro"),
        )
    )


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    hasher: str = "xxhash64",
    seed: int = 0,
) -> DataFrame:
    """DSIR selection: keep the ``k`` raw documents with the highest
    Gumbel-perturbed importance weight — sampling WITHOUT replacement
    from the importance distribution (the Gumbel-top-k identity), fully
    deterministic: the Gumbel noise derives from md5(id), so re-runs,
    retries, and any partitioning pick the same k documents.

    key = logw_micro + floor(1e6 * gumbel(u)),  u = (md5(id) % 1e6
    + 0.5) / 1e6 — the noise is quantized to the same micro-units as
    the weights, keeping the ordering integer-exact.  Top-k is a
    TakeOrdered (no global sort): (key desc, id asc) total order.

    Returns (id_col, logw_micro, key_micro), the selected documents.
    """
    from .sketches import md5_int56

    w = dsir_importance_weights(
        docs, target, text_col, id_col, n_buckets, hasher
    )
    u_micro = md5_int56(
        F.concat(F.lit(f"dsir-gumbel:{seed}:"), F.col(id_col).cast("string"))
    ) % F.lit(1_000_000)
    u = (u_micro.cast("double") + F.lit(0.5)) / F.lit(1_000_000.0)
    gumbel_micro = F.floor(F.lit(1_000_000.0) * -F.log(-F.log(u))).cast(
        "long"
    )
    keyed = w.select(
        id_col,
        "logw_micro",
        (F.col("logw_micro") + gumbel_micro).alias("key_micro"),
    )
    return keyed.orderBy(
        F.col("key_micro").desc(), F.col(id_col).asc()
    ).limit(k)


def packing_budget_curve(
    df: DataFrame,
    token_count_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    budgets: tuple[int, ...] = (512, 1024, 2048, 4096, 8192),
) -> DataFrame:
    """:func:`packing_efficiency` at every candidate budget in ONE
    pass — the table a training team picks its sequence length from
    BEFORE burning GPU-hours (the nb_threshold_curve pattern applied
    to packing): utilization rises with smaller bins but oversize-doc
    counts rise with them too.

    Key saving: the id-order running sum ``before`` is
    budget-INDEPENDENT, so the window runs ONCE; budgets fan out as a
    |budgets|-wide explode AFTER the window (rows × |budgets|, partial
    aggregation collapses map-side), and every per-budget bin id is
    ``floor(before / budget)`` — identical to :func:`pack_sequences`
    at that budget.  Returns one row per budget: (budget, n_docs,
    n_bins, total_tokens, capacity_tokens, utilization_bp,
    n_oversize_docs).
    """
    parts = [group_col] if group_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    base = df.select(
        *[F.col(c) for c in parts],
        F.col(token_count_col).alias("n_tokens"),
        before.alias("_before"),
    )
    fanned = base.select(
        "*",
        F.explode(
            F.array(*[F.lit(b).cast("long") for b in budgets])
        ).alias("budget"),
    ).select(
        "budget",
        "n_tokens",
        *[F.col(c) for c in parts],
        F.floor(F.col("_before") / F.col("budget")).cast("long").alias(
            "pack_id"
        ),
    )
    agg = fanned.groupBy("budget").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.countDistinct(*(parts + ["pack_id"])).cast("long").alias("n_bins"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("n_tokens") > F.col("budget"), 1).otherwise(0))
        .cast("long")
        .alias("n_oversize_docs"),
    )
    return agg.select(
        "budget",
        "n_docs",
        "n_bins",
        "total_tokens",
        (F.col("n_bins") * F.col("budget")).alias("capacity_tokens"),
        F.floor(
            F.col("total_tokens") * 10000 / (F.col("n_bins") * F.col("budget"))
        )
        .cast("long")
        .alias("utilization_bp"),
        "n_oversize_docs",
    )


def pack_documents(
    df: DataFrame,
    text_col: str = "text",
    token_count_col: str = "n_tokens",
    id_col: str = "doc_id",
    group_col: str | None = None,
    budget: int = 2048,
    sep: str = " ",
) -> DataFrame:
    """Materialize :func:`pack_sequences` bins into actual training
    sequences — the step that turns bin ASSIGNMENTS into the packed
    text a dataloader reads: documents concatenated in deterministic
    id order within each bin.

    Same id-order running-sum window as :func:`pack_sequences` (bin
    parity pinned in tests), then one bin-grain aggregate using the
    retry-safe ``sort_array(collect_list(struct(id, text)))`` rebuild
    (collect_list alone is retry/partitioning-nondeterministic).
    State per bin is bounded by the token budget — a bin holds at most
    ~``budget`` tokens of text by construction, so the collect cannot
    blow up on skew the way an unbounded group concat would.

    Returns (group_col?, pack_id, n_docs, n_tokens, text).
    """
    parts = [group_col] if group_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(token_count_col).over(w), F.lit(0))
    assigned = df.select(
        *[F.col(c) for c in parts],
        F.col(id_col),
        F.col(text_col).alias("_text"),
        F.col(token_count_col).alias("_tok"),
        F.floor(before / F.lit(budget)).cast("long").alias("pack_id"),
    )
    return (
        assigned.groupBy(*(parts + ["pack_id"]))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_tok").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col(id_col).alias("i"), F.col("_text").alias("t"))
                        )
                    ),
                    lambda s: s.getField("t"),
                ),
                sep,
            ).alias("text"),
        )
    )


#: Poisson(1) cumulative thresholds in 2^56 units — floor(P(X<=k)·2^56)
#: for k = 0..8 (the k=9 tail keeps ~1.1e-6 of the mass; the cap is
#: part of the deterministic contract).  Shared with the SQL oracle so
#: both engines draw the identical weight from the identical hash.
POISSON1_CDF_56: tuple[int, ...] = (
    26508507426831584,
    53017014853663168,
    66271268567078960,
    70689353138217560,
    71793874281002208,
    72014778509559136,
    72051595880985288,
    72056855505474736,
    72057512958535920,
)


def xxhash56(c: Column) -> Column:
    """Low 56 bits of xxhash64 — the fast PRODUCTION uniform for
    :func:`bootstrap_mean_ci`'s ``hash_fn`` dial (Spark-only, so not
    SQL-oracle-replayable; the md5 seam is the default)."""
    return F.xxhash64(c).bitwiseAND(F.lit((1 << 56) - 1))


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n_replicates: int = 48,
    seed: int = 0,
    lo_bp: int = 250,
    hi_bp: int = 9750,
    hash_fn=None,
) -> DataFrame:
    """Deterministic POISSON-bootstrap confidence interval for a mean —
    the error bar an eval pipeline should attach to any corpus metric
    ("is source A's quality really higher than B's?").  The classic
    multinomial bootstrap needs coordinated global resampling; the
    Poisson(1) approximation (the standard large-scale substitute)
    draws each row's per-replicate multiplicity INDEPENDENTLY, which is
    exactly what a distributed scan can do.

    Determinism contract: replicate ``b``'s weight for a row is the
    Poisson(1) inverse-CDF bucket of the md5-derived 56-bit uniform of
    ``boot:<seed>:<id>:<b>`` against the shared integer thresholds
    :data:`POISSON1_CDF_56` — a pure (id, b, seed) function, invariant
    under partitioning/retries and replayed bit-for-bit by the SQL
    oracle.  Values enter as per-row floor-to-cents; each replicate's
    mean is the order-independent integer division
    ``(Σ w·cents)·10000 div Σw`` (micro-cents); the CI picks exact
    order statistics of the SURVIVING replicate means (ranks
    ``max(1, ceil(q·B′))`` where B′ counts replicates whose total
    Poisson weight is positive, ties by replicate id).  B′ == B
    whenever any replicate draws at least one row — certain at corpus
    scale (P(all-zero) = e^-n per replicate) — so the oracle contract
    is unchanged there; on tiny inputs dead replicates no longer push
    the hi rank past the survivor count into a null CI (ADVICE r10).

    Plan: one ``n × B`` fan-out collapsed map-side to B partial rows
    per task; the final window runs over the B-row aggregate.  Returns
    one row: (n_rows, n_replicates, mean_microcents, ci_lo_microcents,
    ci_hi_microcents).

    ``hash_fn`` dials the uniform source: the default md5 seam is
    SQL-oracle-replayable (what the registered query certifies); pass
    :func:`xxhash56` for the ~3-5× cheaper production hash — same
    contract, same determinism under retries/partitioning, just not
    replayable by DuckDB (the DSIR/simhash dial pattern).
    """
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import md5_int56

    if hash_fn is None:
        hash_fn = md5_int56

    base = df.select(
        F.col(id_col).alias("_id"),
        F.floor(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    fanned = base.select(
        "_id",
        "_cents",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_replicates) - 1))
        ).alias("_b"),
    )
    u = hash_fn(
        F.concat(
            F.lit(f"boot:{seed}:"),
            F.col("_id").cast("string"),
            F.lit(":"),
            F.col("_b").cast("string"),
        )
    )
    w = F.lit(9).cast("long")
    for k in range(len(POISSON1_CDF_56) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF_56[k]), F.lit(k).cast("long")).otherwise(w)
    reps = (
        fanned.select("_b", w.alias("_w"), F.col("_cents"))
        .groupBy("_b")
        .agg(
            F.sum("_w").cast("long").alias("_sw"),
            F.sum(F.col("_w") * F.col("_cents")).cast("long").alias("_swx"),
        )
        .where(F.col("_sw") > 0)
        .select("_b", F.expr("_swx * 10000 div _sw").alias("_mean"))
    )
    wnd = Window.orderBy(F.col("_mean").asc(), F.col("_b").asc())
    # ranks come from the SURVIVING replicate count (count window over
    # the same B'-row set), not n_replicates: (q·B' + 9999) div 10000
    # is the truncation-safe ceil for positive ints on both engines.
    ranked = reps.select(
        "_mean",
        F.row_number().over(wnd).alias("_rk"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_nb"),
    )
    lo_rk = F.greatest(
        F.lit(1).cast("long"), F.expr(f"({int(lo_bp)} * _nb + 9999) div 10000")
    )
    hi_rk = F.greatest(
        F.lit(1).cast("long"), F.expr(f"({int(hi_bp)} * _nb + 9999) div 10000")
    )
    ci = ranked.agg(
        F.max(F.when(F.col("_rk") == lo_rk, F.col("_mean"))).alias(
            "ci_lo_microcents"
        ),
        F.max(F.when(F.col("_rk") == hi_rk, F.col("_mean"))).alias(
            "ci_hi_microcents"
        ),
    )
    point = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("sum(_cents) * 10000 div count(*)").alias("mean_microcents"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        F.lit(int(n_replicates)).cast("long").alias("n_replicates"),
        "mean_microcents",
        "ci_lo_microcents",
        "ci_hi_microcents",
    )


def shard_manifest(
    df: DataFrame,
    id_col: str,
    fingerprint_cols: "list[str]",
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Per-shard reproducibility manifest for a :func:`training_shards`
    export: (shard_id, n_rows, xor_fp, sum_low20) — the content
    checksums a training run records NEXT TO its shards so any later
    rebuild (new cluster, new partitioning, incremental re-export) can
    prove byte-equivalence per shard without re-reading the originals
    (the ``table_fingerprint`` contract applied at shard grain).

    One scan: the shard assignment is the same content-hash arithmetic
    as the export, the per-row md5-int56 fingerprint XORs
    order-independently per shard (duplicate-pair-cancellation guarded
    by the low-20-bit multiplicity sum).  Shuffle rows carry
    (shard_id, one long).
    """
    from youtube_podcast_data_pipeline_azure_spark.operators.quality import row_fingerprint

    sharded = training_shards(df, id_col, n_shards=n_shards, seed=seed)
    base = sharded.select(
        "shard_id", row_fingerprint(fingerprint_cols).alias("_fp")
    )
    return base.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bit_xor(_fp)").alias("xor_fp"),
        F.sum(F.col("_fp") % F.lit(1 << 20)).cast("long").alias("sum_low20"),
    )


def bootstrap_mean_ci_by_group(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_col: str,
    n_replicates: int = 48,
    seed: int = 0,
    lo_bp: int = 250,
    hi_bp: int = 9750,
    hash_fn=None,
) -> DataFrame:
    """Per-group :func:`bootstrap_mean_ci` — the actual comparison
    table behind "is source A's metric really higher than B's?":
    non-overlapping CIs are the defensible answer, a bare mean gap is
    not.  Same deterministic Poisson machinery, resampled WITHIN each
    group (weights keyed on (group, id, b, seed) via the same id hash —
    a row's weight doesn't depend on the grouping, so adding a group
    never perturbs another's CI); the rank window partitions by group
    over the (groups × B)-row aggregate.  Returns one row per group:
    (group_col, n_rows, n_replicates, mean_microcents,
    ci_lo_microcents, ci_hi_microcents).
    """
    from youtube_podcast_data_pipeline_azure_spark.operators.sketches import md5_int56

    if hash_fn is None:
        hash_fn = md5_int56
    base = df.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        F.floor(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    fanned = base.select(
        "_g",
        "_id",
        "_cents",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_replicates) - 1))
        ).alias("_b"),
    )
    u = hash_fn(
        F.concat(
            F.lit(f"boot:{seed}:"),
            F.col("_id").cast("string"),
            F.lit(":"),
            F.col("_b").cast("string"),
        )
    )
    w = F.lit(9).cast("long")
    for k in range(len(POISSON1_CDF_56) - 1, -1, -1):
        w = F.when(u < F.lit(POISSON1_CDF_56[k]), F.lit(k).cast("long")).otherwise(w)
    reps = (
        fanned.select("_g", "_b", w.alias("_w"), F.col("_cents"))
        .groupBy("_g", "_b")
        .agg(
            F.sum("_w").cast("long").alias("_sw"),
            F.sum(F.col("_w") * F.col("_cents")).cast("long").alias("_swx"),
        )
        .where(F.col("_sw") > 0)
        .select("_g", "_b", F.expr("_swx * 10000 div _sw").alias("_mean"))
    )
    wnd = Window.partitionBy("_g").orderBy(
        F.col("_mean").asc(), F.col("_b").asc()
    )
    # per-group survivor count drives the ranks (the bootstrap_mean_ci
    # ADVICE r10 fix, applied per group)
    lo_rk = F.greatest(
        F.lit(1).cast("long"), F.expr(f"({int(lo_bp)} * _nb + 9999) div 10000")
    )
    hi_rk = F.greatest(
        F.lit(1).cast("long"), F.expr(f"({int(hi_bp)} * _nb + 9999) div 10000")
    )
    ci = (
        reps.select(
            "_g",
            "_mean",
            F.row_number().over(wnd).alias("_rk"),
            F.count(F.lit(1)).over(Window.partitionBy("_g")).alias("_nb"),
        )
        .groupBy("_g")
        .agg(
            F.max(F.when(F.col("_rk") == lo_rk, F.col("_mean"))).alias(
                "ci_lo_microcents"
            ),
            F.max(F.when(F.col("_rk") == hi_rk, F.col("_mean"))).alias(
                "ci_hi_microcents"
            ),
        )
    )
    point = base.groupBy("_g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("sum(_cents) * 10000 div count(*)").alias("mean_microcents"),
    )
    return point.join(ci, "_g").select(
        F.col("_g").alias(group_col),
        "n_rows",
        F.lit(int(n_replicates)).cast("long").alias("n_replicates"),
        "mean_microcents",
        "ci_lo_microcents",
        "ci_hi_microcents",
    )

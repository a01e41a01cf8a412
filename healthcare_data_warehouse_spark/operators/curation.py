"""Training-corpus curation operators: deterministic sampling, token-budget
packing, and the end-to-end clean pipeline.

north_star scope (LLM-training-data pipeline ops). Reference has no analog;
semantics follow standard corpus-curation practice (C4/Gopher-style filters,
mixture rebalancing, sequence packing).

Design rules:

- **Deterministic by content, not by RNG.** Sampling uses an md5-derived
  uniform key (``substr(md5(id), 1, 4)`` compared against a hex threshold)
  instead of ``rand()``: the sample is reproducible run-to-run, stable
  under repartitioning, and expressible in ANSI SQL — so every operator
  here is fully oracle-checkable (rand-based sampleBy is none of those).
- **No global sorts.** Packing orders within (stratum, shard) where the
  shard is itself hash-derived — each pack window is independent, so the
  work parallelizes to stratum×shard granularity at any corpus size.
- **Filters stay native.** Everything is Column expressions over
  whitespace tokenization (``text.tokens``); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

# ---------------------------------------------------------------------------
# Deterministic uniform key + stratified sampling
# ---------------------------------------------------------------------------


def det_key(id_col: Column | str, width: int = 4) -> Column:
    """Deterministic uniform sampling key: the first ``width`` hex chars of
    md5 of the id's decimal string. Uniform over 16^width buckets,
    identical in any engine with md5 (the oracle uses the same
    expression), and independent of partitioning."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string")), 1, width)


def hex_threshold(rate: float, width: int = 4) -> str:
    """Hex string t such that det_key < t keeps ~``rate`` of rows."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(min(int(rate * 16 ** width), 16 ** width - 1), f"0{width}x")


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 1.0) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-rebalancing
    primitive (e.g. downsample the dominant language before training).

    Pure narrow filter: no shuffle, no RNG, pushed to the scan; the kept
    set is a function of (id, stratum) only, so reruns and backfills
    select the same rows at any scale."""
    key = det_key(id_col)

    def keep(rate: float) -> Column:
        # rate >= 1 must keep EVERYTHING: a hex-string compare can't
        # express it ('ffff' excludes keys equal to 'ffff', and '10000'
        # sorts lexicographically BELOW 'ffff').
        if rate >= 1.0:
            return F.lit(True)
        return key < F.lit(hex_threshold(rate))

    expr = keep(default_rate)
    for stratum, rate in sorted(rates.items()):
        expr = F.when(F.col(stratum_col) == stratum, keep(rate)).otherwise(expr)
    return df.filter(expr)


# ---------------------------------------------------------------------------
# Token-budget packing
# ---------------------------------------------------------------------------


def pack_token_budget(df: DataFrame, budget: int, stratum_col: str = "lang",
                      id_col: str = "doc_id", text_col: str = "text",
                      n_shards: int = 16) -> DataFrame:
    """Greedy sequential packing of documents into ``budget``-token bins
    (context-window packing for LLM training).

    Documents are processed in ``id_col`` order within (stratum, shard)
    and a document's bin is where its running token total STARTS:
    ``pack_id = floor((cumsum - n_tokens) / budget)`` — the standard
    streaming approximation (a doc crossing a boundary stays in the bin
    it started in; oversized docs own their bins).

    The shard is hash-derived from the id (``substr(md5(id), 1, 1)``):
    each (stratum, shard) window sorts independently, so the plan is
    #strata × ``n_shards`` parallel sorted windows — never a global sort,
    and shard count can grow with the corpus. Shards are deterministic,
    so the packing itself is reproducible end to end."""
    from .skew import spread

    if n_shards != 16:
        raise ValueError("n_shards is fixed at 16 (one hex char of md5)")
    n_tok = F.size(tokens(text_col))
    shard = F.substring(F.md5(F.col(id_col).cast("string")), 1, 1)
    w = (
        Window.partitionBy(stratum_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spread(df, id_col).select(
            F.col(id_col), F.col(stratum_col),
            n_tok.cast("long").alias("n_tokens"), shard.alias("shard"),
        )
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .select(
            id_col, stratum_col, "shard", "n_tokens",
            F.floor((F.col("__cum") - F.col("n_tokens")) / budget)
            .cast("long").alias("pack_id"),
        )
    )


def assign_split(df: DataFrame, fractions: dict[str, float] | None = None,
                 id_col: str = "doc_id",
                 out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: the md5 sampling key
    falls into consecutive hex intervals sized by ``fractions`` (default
    80/10/10). A document's split is a pure function of its id — stable
    across reruns, repartitions, and corpus growth (new docs never move
    old docs between splits, the property RNG splits lack). Narrow
    projection, no shuffle."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    key = det_key(id_col)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = key < F.lit(hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, expr)


def sample_k_per_group(df: DataFrame, k: int, group_col: str = "lang",
                       id_col: str = "doc_id") -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically — the
    distributed stand-in for per-group reservoir sampling.

    Rows rank within their group by the md5 hash of the id (id itself as
    the tiebreak), and the k smallest win: the selection is uniform-ish in
    hash space, identical run-to-run and partition-layout-independent,
    and re-derivable in ANSI SQL (QUALIFY row_number() ...), unlike
    rand()-based reservoirs. One shuffle on the group key; each group
    sorts independently (no global sort), so the plan scales to any
    group count — a single pathological mega-group is the same bound any
    per-group window has (pre-filter or shard such groups upstream)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(group_col).orderBy(det_key(id_col, 8), id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Context-window chunking
# ---------------------------------------------------------------------------


def chunk_documents(df: DataFrame, chunk_tokens: int = 32, overlap: int = 8,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Split documents into overlapping token-window chunks — the standard
    pre-processing for embedding / retrieval / long-context training
    (each chunk is ``chunk_tokens`` wide; consecutive chunks share
    ``overlap`` tokens, i.e. stride = chunk_tokens - overlap).

    Pure native plan: one projection builds the token array, ``sequence``
    generates the chunk starts (1, 1+stride, …, ≤ n_tokens), ``explode``
    fans out one row per chunk, and ``slice``/``array_join`` materialize
    the chunk text. No shuffle at all — chunking is embarrassingly
    row-parallel, so the stage scales linearly with the corpus and
    whole-stage codegen keeps it JVM-side. Empty documents yield one
    empty chunk (split('') is [''] in both Spark and the oracle), so
    row-parity with the DuckDB twin is exact.

    Output: (id, chunk_id, chunk_text, n_chunk_tokens)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}/{chunk_tokens}")
    stride = chunk_tokens - overlap
    toked = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    n = F.size("__toks")
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
    piece = F.slice("__toks", F.col("start"), F.lit(chunk_tokens))
    return (
        toked.select(id_col, "__toks", F.explode(starts).alias("start"))
        .select(
            F.col(id_col),
            ((F.col("start") - 1) / stride).cast("int").alias("chunk_id"),
            F.array_join(piece, " ").alias("chunk_text"),
            F.size(piece).cast("int").alias("n_chunk_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end corpus clean
# ---------------------------------------------------------------------------


def corpus_clean(df: DataFrame, min_tokens: int = 10, max_tokens: int = 5000,
                 max_avg_word_len: float = 15.0, budget_per_stratum: int = 5000,
                 stratum_col: str = "lang", id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """The composed curation pipeline: quality filter → exact dedup →
    per-stratum token budget. One declarative plan, fully oracle-checkable.

    Stages (all shuffles are keyed and bounded):
    1. Quality: token count in [min_tokens, max_tokens] and average word
       length ≤ max_avg_word_len (C4/Gopher-style length rules) — narrow,
       pushed to the scan.
    2. Exact dedup: keep the min-id representative per md5(text) group,
       via a min-over-fingerprint window (one shuffle on the fingerprint).
    3. Budget: running token total per stratum in id order; docs are kept
       while the stratum's cumulative total stays ≤ budget_per_stratum —
       deterministic "first N tokens per stratum". NOTE the budget window
       is per-stratum sequential BY SEMANTICS (the kept set depends on
       order); for corpus-scale budgets, apply stage 3 per (stratum,
       shard) like ``pack_token_budget`` and budget each shard.
    """
    from .skew import spread

    # Quality stats via explode + codegen hash-aggregate, NOT an array
    # HOF: token count and non-whitespace length come from count(*) /
    # sum(length(w)) over the exploded token stream (sum of token
    # lengths == length of regexp_replace(text, '\s+', '') — the
    # oracle's formulation — since trim+split drops exactly the
    # whitespace). The previous F.aggregate form was interpreted
    # per-element AND re-evaluated under the pushed-down filter
    # conjuncts; explode keeps the tokenize to ONE evaluation and the
    # stats inside whole-stage codegen with map-side partial aggregation
    # (group key is doc-level, so the shuffle carries one row per doc).
    # Docs whose token array is NULL/empty vanish at the explode, exactly
    # as the n_tokens >= min_tokens filter would drop them. Measured at
    # sf10: quality stage 11.3 s → 2.8 s, identical kept set.
    t = (
        spread(df, id_col)
        .select(
            F.col(id_col), F.col(stratum_col), F.col("source"),
            F.md5(F.col(text_col)).alias("__fp"),
            F.explode(tokens(text_col)).alias("__w"),
        )
        .groupBy(id_col, stratum_col, "source", "__fp")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.length("__w")).alias("__nosp"),
        )
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("__nosp").cast("double") / F.col("n_tokens")
               <= max_avg_word_len)
        )
        .drop("__nosp")
    )
    rep = t.withColumn("__keep", F.min(id_col).over(Window.partitionBy("__fp")))
    deduped = rep.filter(F.col(id_col) == F.col("__keep"))
    bw = (
        Window.partitionBy(stratum_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        deduped.withColumn("__cum", F.sum("n_tokens").over(bw))
        .filter(F.col("__cum") <= budget_per_stratum)
        .select(id_col, stratum_col, "source", "n_tokens")
    )


def temperature_weights(df: DataFrame, alpha: float = 0.5,
                        stratum_col: str = "lang",
                        text_col: str = "text") -> DataFrame:
    """Temperature-scaled mixture weights: sampling weight ∝ share^alpha,
    renormalized — the standard recipe for upweighting low-resource
    strata in a pre-training mixture (alpha→0 flattens toward uniform,
    alpha=1 keeps natural proportions).

    One hash aggregate produces the per-stratum token counts; both
    windows run over that already-aggregated (stratum-cardinality) tiny
    frame. For the oracle-checked alpha=0.5 the scaling goes through
    ``sqrt`` (IEEE correctly-rounded → bit-identical in any engine,
    unlike pow/ln), and the normalizing sum accumulates in
    DECIMAL(18,12) so the distributed total is order-independent."""
    from .skew import spread

    n_tok = F.size(tokens(text_col))
    agg = spread(df, "doc_id").groupBy(stratum_col).agg(
        F.sum(n_tok.cast("long")).alias("token_count"))
    w = Window.partitionBy()
    share = F.col("token_count").cast("double") / F.sum("token_count").over(w)
    scaled = (F.sqrt(share) if alpha == 0.5
              else F.pow(share, F.lit(float(alpha))))
    t = agg.select(stratum_col, "token_count",
                   share.alias("token_share"), scaled.alias("__s"))
    denom = F.sum(F.col("__s").cast("decimal(18,12)")).over(w).cast("double")
    return t.select(
        stratum_col, "token_count", "token_share",
        (F.col("__s") / denom).alias("weight"),
    )


def mixture_stats(df: DataFrame, stratum_col: str = "lang",
                  source_col: str = "source", text_col: str = "text") -> DataFrame:
    """Training-mixture composition: per (stratum, source) document and
    token counts plus each cell's share of all tokens — the table you
    balance a pre-training mixture against. One hash aggregate; the
    pct-of-total window runs over the already-aggregated (tiny) result.
    Tokenization (the CPU) happens in the spread stage, partial-aggregated
    map-side before the one (stratum, source) shuffle."""
    from .skew import spread

    n_tok = F.size(tokens(text_col))
    agg = spread(df, "doc_id").groupBy(stratum_col, source_col).agg(
        F.count("*").alias("doc_count"),
        F.sum(n_tok.cast("long")).alias("token_count"),
    )
    total_w = Window.partitionBy()
    return agg.select(
        stratum_col, source_col, "doc_count", "token_count",
        (F.col("token_count").cast("double")
         / F.sum("token_count").over(total_w)).alias("token_share"),
    )


def weighted_sample(df: DataFrame, weight_col: str, n_per_group: int,
                    group_col: str, id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): each row draws priority u^(1/w) with u
    uniform from the md5 of its id and w its weight; the top-n
    priorities per group are an exact without-replacement weighted
    sample. Quality-weighted corpus subsampling with reproducible
    output (same ids in, same sample out — no RNG state, no
    partitioning sensitivity).

    One shuffle (the per-group top-n window); at 100 TB prefer a
    two-phase top-n (per-partition heads then merge) — same semantics,
    which is exactly what TakeOrderedAndProject does when the group
    count is 1.

    Hash-certifiable ranking: the rank key is the LOG-form E-S priority
    ln(u)/w (order-equivalent to u^(1/w) — ln is monotone — and the
    numerically better-conditioned variant: u^(1/w) itself crushes all
    heavy-weight rows into a sliver below 1.0, while ln(u)/w keeps them
    spread), rounded to 9dp with the IEEE-pure floor formula. The md5 →
    uniform step is exact on both engines; ln's cross-libm last-ulp
    variance is absorbed by the rounding (a value must sit within
    ~1e-16 of a 1e-9 boundary to diverge), and 9dp ties — astronomically
    rare given the 60-bit uniform — break on the id, identically
    everywhere. Same ids in, same sample out: no RNG state, no
    partitioning sensitivity, no engine sensitivity.

    Weight domain: A-ES is undefined for w < 0 and w = NULL, and Spark's
    non-ANSI divide would fail silently there (w<0 gives u^(1/w) >= 1,
    outranking every positive-weight row) — those raise at execution
    time rather than silently inverting the sample. w = 0 has a
    well-defined A-ES limit — priority u^(1/w) → 0, i.e. "never chosen
    ahead of any positive-weight row" — so zero-weight rows (an empty
    document scored n_chars=0, say) are excluded from the sample rather
    than aborting the whole job."""
    from pyspark.sql import Window

    wcol = F.col(weight_col).cast("double")
    guarded = F.when(wcol > 0, wcol).otherwise(
        F.raise_error(F.concat(
            F.lit(f"weighted_sample: {weight_col} must be >= 0, got "),
            F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
        ))
    )
    # 60 bits of md5 → uniform (0, 1]; +1 avoids u=0 (ln(0) = -inf
    # would tie every zero-draw row regardless of weight)
    u = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
                16, 10).cast("double") + 1.0) / float(1 << 60)
    # log-form E-S priority, 9dp IEEE-pure rounding (see docstring)
    prio = F.floor(F.log(u) / guarded * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)
    w = Window.partitionBy(group_col).orderBy(F.desc("__prio"), F.asc(id_col))
    return (
        # w=0: A-ES limit priority 0 — never sampled. NULLs pass through
        # to the guard's raise (NULL != 0 is NULL and would silently drop).
        df.filter((wcol != 0) | wcol.isNull())
        .withColumn("__prio", prio)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__prio", "__rn")
    )


def shuffle_shards(df: DataFrame, id_col: str = "doc_id",
                   n_shards: int = 8, salt: str = "shard:") -> DataFrame:
    """Deterministic global shuffle + shard assignment — the last step of
    every training-data pipeline: break any source/time ordering so each
    shard (and each position within a shard) is an unbiased sample of the
    corpus, reproducibly. Shard and order both derive from one md5 of the
    row key (seeded resampling = new salt), so the layout is stable under
    reruns and independent of input partitioning.

    Scale shape: shard membership is a hash mod (no global sort), and
    pos_in_shard comes from the two-phase dense key (``keys.add_dense_key``
    over (shard, md5): range-partition + per-partition row_number +
    offsets) — NEVER a per-shard window, which would funnel corpus/n_shards
    rows through single tasks. The per-shard base offsets are an
    ``n_shards``-row aggregate, joined back broadcast."""
    from ..functions.expressions import hexslice, md5hex
    from .keys import add_dense_key

    m = md5hex(F.col(id_col), salt)
    t = df.select(
        F.col(id_col),
        m.alias("__m"),
        (hexslice(m, 1, 13) % n_shards).cast("int").alias("shard"),
    )
    keyed = add_dense_key(t, ["shard", "__m"], key_col="__gk")
    mins = keyed.groupBy("shard").agg(F.min("__gk").alias("__g0"))
    return keyed.join(F.broadcast(mins), "shard").select(
        id_col,
        "shard",
        (F.col("__gk") - F.col("__g0") + 1).cast("long").alias("pos_in_shard"),
    )

"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket
self-join -> Jaccard verify), SimHash (60-bit, hamming-distance pairs),
and n-gram Jaccard similarity. All hot paths are native Spark SQL
expressions (md5 / higher-order array functions) — JVM-side, no Python.

Portability contract with the DuckDB oracle: every hash is md5-hex (both
engines produce identical digests); minhash = lexicographic MIN over hex
strings; 60-bit integer hashes parse the first 15 md5 hex chars
(Spark ``conv(h,16,10)``, DuckDB ``CAST('0x'||h AS BIGINT)``).

Scale notes: the LSH band self-join shuffles on band_key — banding bounds
bucket sizes, and Jaccard verification touches only candidate pairs
(never the n^2 cross join). At 100 TB add a bucket-size cap
(count per band_key, drop degenerate buckets) before the self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from podcast_audio_feature_extraction_spark.checkpoint import (
    free_local_checkpoint as _free_local_checkpoint,
)
from podcast_audio_feature_extraction_spark.checkpoint import swap_cached as _swap_cached

SHINGLE_K = 3


def tokens_col(text_col: Column) -> Column:
    return F.filter(F.split(F.coalesce(text_col, F.lit("")), r"\s+"), lambda x: x != "")


def shingles_col(text_col: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-token shingles; texts with < k tokens fall back to the
    whole text as a single shingle."""
    toks = tokens_col(text_col)
    kgrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - k),
        lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= k, kgrams).otherwise(F.array(F.coalesce(text_col, F.lit(""))))
    )


# single-slot cache for minhash_lsh_pairs' shingle table (see
# checkpoint.swap_cached for the lifecycle)
_MINHASH_CKPT: list = [None]


def minhash_col(shingles: Column, n_hashes: int = 12) -> Column:
    """n_hashes permutations approximated by seed-prefixed md5; the
    lexicographic min over hex digests is a valid uniform minhash."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(i.cast("string"), F.lit(":"), s)))),
    )


def band_keys_col(minhashes: Column, n_bands: int, band_size: int) -> Column:
    """LSH band keys: md5 over each band's '|'-joined minhashes. THE single
    definition of the banding scheme — self-join, block-reroute and
    cross-table contamination candidates are only comparable because every
    site builds band keys through this one expression."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(F.array_join(F.slice(minhashes, b * band_size + 1, band_size), "|")),
    )


def jaccard_col(a: Column, b: Column, round_digits: int = 6) -> Column:
    return F.round(
        F.size(F.array_intersect(a, b)) / F.size(F.array_union(a, b)).cast("double"), round_digits
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 12,
    band_size: int = 3,
    jaccard_threshold: float = 0.2,
    max_bucket: int | None = 2000,
    reuse_table: bool = True,
) -> DataFrame:
    """Candidate pairs via LSH banding, verified by exact shingle Jaccard.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, distinct.

    ``max_bucket`` (DEFAULT 2000 — scale-safe) drops degenerate buckets
    (e.g. the all-empty-text bucket) before the self-join — at 100 TB a
    hot bucket of B docs costs B^2 candidate pairs, so capping is the
    difference between an LSH join and an accidental cross join. Capped
    buckets are skew outliers by construction (near-identical
    boilerplate); route them to exact dedup. Pass ``max_bucket=None``
    EXPLICITLY for the uncapped mode (CI parity with the all-pairs
    oracle).

    ``reuse_table`` caches the (doc_id, shingles, minhashes) table so
    the band self-join computes the md5-heavy shingle+minhash subtree
    (n_hashes+1 md5 passes over every token) ONCE instead of once per
    join side — the stored shingle-table shape a cluster deployment
    would use. Lazy single-slot persist (checkpoint.swap_cached): no job
    at construction time, a previous call's still-held result degrades
    to recomputation rather than erroring, block-manager growth
    bounded."""
    n_bands = n_hashes // band_size
    docs = df.select(
        F.col(id_col).alias("doc_id"),
        shingles_col(F.col(text_col)).alias("shingles"),
    ).withColumn("minhashes", minhash_col(F.col("shingles"), n_hashes))
    if reuse_table:
        docs = _swap_cached(_MINHASH_CKPT, docs)

    bands = docs.select(
        "doc_id",
        "shingles",
        F.posexplode(band_keys_col(F.col("minhashes"), n_bands, band_size)).alias("band_idx", "band_key"),
    )
    if max_bucket is not None:
        from pyspark.sql.window import Window

        cnt = Window.partitionBy("band_idx", "band_key")
        bands = (
            bands.withColumn("__n", F.count(F.lit(1)).over(cnt))
            .filter(F.col("__n") <= max_bucket)
            .drop("__n")
        )

    a = bands.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"), "band_idx", "band_key")
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"), "band_idx", "band_key")
    cand = (
        a.join(b, ["band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return (
        cand.withColumn("jaccard", jaccard_col(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    n_hashes: int = 12,
    band_size: int = 3,
    jaccard_threshold: float = 0.2,
    k: int = SHINGLE_K,
) -> str:
    """DuckDB twin of :func:`minhash_lsh_pairs` (embed after WITH ... or
    standalone prefixed by WITH)."""
    n_bands = n_hashes // band_size
    return f"""
        , __docs AS (
            SELECT {id_col} AS doc_id,
                   list_distinct(
                     CASE WHEN len(list_filter(regexp_split_to_array(COALESCE(text,''), '\\s+'), x -> x <> '')) >= {k}
                          THEN list_transform(
                                 range(len(list_filter(regexp_split_to_array(COALESCE(text,''), '\\s+'), x -> x <> '')) - {k - 1}),
                                 i -> array_to_string(list_filter(regexp_split_to_array(COALESCE(text,''), '\\s+'), x -> x <> '')[i+1:i+{k}], ' '))
                          ELSE [COALESCE(text,'')] END) AS shingles
            FROM {src}
        ),
        __mh AS (
            SELECT doc_id, shingles,
                   list_transform(range({n_hashes}),
                       i -> list_aggregate(list_transform(shingles, s -> md5(i::VARCHAR || ':' || s)), 'min')) AS minhashes
            FROM __docs
        ),
        __bands AS (
            SELECT doc_id, shingles, b.range AS band_idx,
                   md5(array_to_string(minhashes[b.range * {band_size} + 1 : b.range * {band_size} + {band_size}], '|')) AS band_key
            FROM __mh CROSS JOIN range({n_bands}) b
        ),
        __cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   first(a.shingles) AS sh_a, first(b.shingles) AS sh_b
            FROM __bands a JOIN __bands b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                     / len(list_distinct(sh_a || sh_b)), 6) AS jaccard
        FROM __cand
        WHERE round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                    / len(list_distinct(sh_a || sh_b)), 6) >= {jaccard_threshold}
    """


def hash60_col(tok: Column) -> Column:
    """Portable 60-bit token hash: first 15 md5 hex chars as integer."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def simhash_table(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60) -> DataFrame:
    """SimHash fingerprint per row: bit j set iff the majority of token
    hashes have bit j set (strictly more set than unset).

    Two-projection form: the per-token 60-bit hash ARRAY is computed
    once into a real column, then the 60-bit fold only does bit tests
    over it. Inlining the hash expression into the fold (the pre-round-4
    single-projection form) would md5 every token once per bit —
    measured 8.4 s -> 0.35 s at sf0.01 (CollapseProject leaves the
    multi-referenced non-cheap alias un-inlined, verified via timing).
    Spark-SQL expression strings because the PySpark shiftleft/shiftright
    wrappers only take literal shift counts, not the lambda var ``j``."""
    toks = f"filter(split(coalesce({text_col}, ''), '\\\\s+'), x -> x != '')"
    hashes = f"transform({toks}, t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint))"
    pre = df.select(F.col(id_col).alias("doc_id"), F.expr(hashes).alias("__h"))
    bit_j = (
        "CASE WHEN 2 * size(filter(__h, h -> (shiftright(h, j) & 1) = 1)) > size(__h) "
        "THEN cast(1 as bigint) ELSE cast(0 as bigint) END"
    )
    return pre.select(
        "doc_id",
        F.expr(
            f"aggregate(sequence(0, {bits - 1}), cast(0 as bigint), (acc, j) -> acc + shiftleft({bit_j}, j))"
        ).alias("simhash"),
    )


# single-slot cache for simhash_pairs' fingerprint table (see
# checkpoint.swap_cached for the lifecycle)
_SIMHASH_CKPT: list = [None]


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 24,
    prefix_bits: int = 12,
    reuse_table: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top ``prefix_bits`` bits
    (LSH-style bucketing), verify hamming distance on the full hash.

    ``reuse_table`` caches the fingerprint table (doc_id, simhash,
    bucket — one long per doc, tiny) so the self-join computes the
    60-bit fold subtree once, not once per side (and the optimizer's
    subtree handling around the un-cached self-join re-evaluated it far
    more than twice — measured 7.0 s -> 0.17 s at sf0.01). On a cluster
    this is the stored-fingerprint-table shape. Lazy single-slot persist
    (checkpoint.swap_cached) — see :func:`minhash_lsh_pairs`."""
    sh = simhash_table(df, id_col, text_col).withColumn(
        "bucket", F.shiftright(F.col("simhash"), 60 - prefix_bits)
    )
    if reuse_table:
        sh = _swap_cached(_SIMHASH_CKPT, sh)
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "bucket")
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def simhash_sql(src: str = "documents", id_col: str = "doc_id", bits: int = 60) -> str:
    """DuckDB twin of :func:`simhash_table` (fragment: `, __sh AS (...)` tail
    included by callers). Same two-step shape: hash array once in a
    subquery, bit fold over the materialized column."""
    return f"""
        SELECT doc_id,
               CAST(list_sum(list_transform(range({bits}), j ->
                   CASE WHEN 2 * len(list_filter(h, x -> (x >> j) & 1 = 1)) > len(h)
                        THEN (1::BIGINT << j) ELSE 0 END)) AS BIGINT) AS simhash
        FROM (
            SELECT {id_col} AS doc_id,
                   list_transform(list_filter(regexp_split_to_array(COALESCE(text,''), '\\s+'), x -> x <> ''),
                                  t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS h
            FROM {src}
        )
    """


def simhash_pairs_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    max_hamming: int = 24,
    prefix_bits: int = 12,
    bits: int = 60,
) -> str:
    """DuckDB twin of :func:`simhash_pairs` — same prefix-bucket blocking
    (the 100 TB path: equi-join on the top bits, hamming verify only on
    bucket collisions)."""
    return f"""
        WITH __sh AS ({simhash_sql(src, id_col, bits)}),
        __b AS (SELECT doc_id, simhash, simhash >> {bits - prefix_bits} AS bucket FROM __sh)
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM __b a JOIN __b b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over near-dup pairs -> one keeper per cluster.

    The last mile of every dedup pipeline: pair lists (from minhash/simhash
    /cosine) become clusters, and only the cluster minimum survives.
    Min-label propagation: every doc starts labeled with itself; each round
    takes the min of its own label and its neighbors' labels; converges in
    graph-diameter rounds (near-dup clusters are shallow — a handful).
    The loop is driver-controlled but each round is one distributed join +
    aggregate; an early-exit count stops at the fixpoint.

    Returns (doc_id, cluster_id, is_keeper) for EVERY doc (singletons are
    their own cluster).
    """
    # undirected edge list, both directions
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).distinct()
    labels = docs.select(F.col(id_col).alias("node")).distinct().withColumn("label", F.col("node"))
    e = e.localCheckpoint()  # edges reused every round: cut the re-read
    labels = labels.localCheckpoint()
    prev_checkpoint = None
    converged = False
    for _ in range(max_iters):
        neigh = (
            e.join(labels, e.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the old label through the SAME pass so the fixpoint probe
        # is a filter over the checkpointed result, not a second full join
        new_labels = (
            labels.join(neigh, "node", "left")
            .select(
                "node",
                F.col("label").alias("__old"),
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("label") != F.col("__old")).limit(1).count()
        # the new round is checkpointed and counted — the previous round's
        # checkpoint blocks are dead weight in the block manager now; free
        # them so a deep chain holds at most 2 copies, not max_iters
        if prev_checkpoint is not None:
            _free_local_checkpoint(prev_checkpoint)
        prev_checkpoint = new_labels
        labels = new_labels.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        # silently returning partial labels would let duplicates survive
        # dedup AND diverge from the exact recursive-closure oracle
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iters={max_iters} "
            "(a near-dup chain longer than max_iters hops exists) — raise max_iters"
        )
    return labels.select(
        F.col("node").alias(id_col),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).cast("int").alias("is_keeper"),
    )


def dedup_clusters_star(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction — the O(log^2 n)-round form for graphs where min-label
    propagation's O(diameter) rounds would be the bottleneck (billion-node
    near-dup graphs with DEEP chains; near-dup clusters are usually
    shallow, so :func:`dedup_clusters` stays the default).

    Each round is two shuffled aggregations + joins over the edge list:

    - large-star: every node links its LARGER neighbors to the minimum of
      its neighborhood (+self) — long tails hook onto local minima;
    - small-star: every node links its smaller-or-equal neighbors (+
      itself) to that minimum — stars flatten.

    The edge set converges to one star per component rooted at the
    component minimum (Kiveris et al., "Connected Components in MapReduce
    and Beyond" — public algorithm). Output matches
    :func:`dedup_clusters` exactly: (doc_id, cluster_id, is_keeper) for
    every doc, cluster_id = component min.
    """

    def _sym(edges: DataFrame) -> DataFrame:
        return (
            edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    e = _sym(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).localCheckpoint()
    # seed with the initial checkpoint so round 1 frees it — it is the
    # full symmetrized edge set, the largest RDD in the job
    prev_ckpt = e
    n_edges = e.count()
    converged = n_edges == 0  # no edges: all singletons
    for _ in range(max_iters if not converged else 0):
        # LARGE-STAR: m(u) = min(N(u) + {u}); for v in N(u), v > u: (v, m)
        mins = (
            e.groupBy("src")
            .agg(F.min("dst").alias("__mn"))
            .select("src", F.least(F.col("__mn"), F.col("src")).alias("m"))
        )
        ls = (
            e.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        )
        e1 = _sym(ls)
        # SMALL-STAR on the larger->smaller orientation: per u, m = min of
        # its smaller neighbors; link those neighbors AND u itself to m
        d = e1.filter(F.col("src") > F.col("dst"))
        mins2 = d.groupBy("src").agg(F.min("dst").alias("m"))
        joined = d.join(mins2, "src")
        ss = (
            joined.filter(F.col("dst") != F.col("m"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(joined.select("src", F.col("m").alias("dst")))
        )
        new_e = _sym(ss).localCheckpoint()
        # EXACT fixpoint check (a digest could collide and silently emit
        # wrong clusters): counts first (cheap, usually differs while
        # contracting), then set difference — both sides are distinct'd,
        # so equal counts + empty except <=> equal edge sets. The except
        # runs against the still-live previous checkpoint.
        new_n = new_e.count()
        same = new_n == n_edges and new_e.exceptAll(e).limit(1).count() == 0
        if prev_ckpt is not None:
            _free_local_checkpoint(prev_ckpt)
        prev_ckpt, e = new_e, new_e
        n_edges = new_n
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dedup_clusters_star did not converge within max_iters={max_iters}"
        )
    # star form: every non-root points directly at its component min
    roots = e.filter(F.col("src") > F.col("dst")).groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("root")
    )
    nodes = docs.select(F.col(id_col).alias("node")).distinct()
    return (
        nodes.join(roots, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("root"), F.col("node")).alias("cluster_id"),
            (F.col("root").isNull()).cast("int").alias("is_keeper"),
        )
    )


def dedup_clusters_sql(pairs_cte: str, docs_cte: str = "documents", id_col: str = "doc_id") -> str:
    """DuckDB twin: connected components via a recursive min-label closure
    (UNION dedup guarantees termination), embedded after a WITH clause that
    defines ``pairs_cte`` with (doc_a, doc_b)."""
    return f"""
        , __edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM {pairs_cte}
            UNION SELECT doc_b, doc_a FROM {pairs_cte}
        ),
        __reach AS (
            WITH RECURSIVE r(node, reach) AS (
                SELECT {id_col}, {id_col} FROM {docs_cte}
                UNION
                SELECT r.node, e.dst FROM r JOIN __edges e ON e.src = r.reach
            )
            SELECT node, min(reach) AS cluster_id FROM r GROUP BY node
        )
        SELECT node AS {id_col}, cluster_id,
               CAST(node = cluster_id AS INT) AS is_keeper
        FROM __reach
    """


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: groups by content hash, keeps the min id."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies")
    )


def _block_all_pairs(docs: DataFrame, round_digits: int) -> DataFrame:
    a = docs.select("grp", F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = docs.select("grp", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        a.join(b, "grp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("grp", "doc_a", "doc_b", jaccard_col(F.col("sh_a"), F.col("sh_b"), round_digits).alias("jaccard"))
    )


def _block_lsh_pairs(
    docs: DataFrame, round_digits: int, n_hashes: int = 12, band_size: int = 3
) -> DataFrame:
    """Within-group pairs via minhash-LSH banding — candidates only, exact
    Jaccard verified on collisions. The reroute target for blocks too big
    to all-pairs."""
    n_bands = n_hashes // band_size
    bands = docs.withColumn("minhashes", minhash_col(F.col("sh"), n_hashes)).select(
        "grp",
        "doc_id",
        "sh",
        F.posexplode(band_keys_col(F.col("minhashes"), n_bands, band_size)).alias("band_idx", "band_key"),
    )
    a = bands.select("grp", F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"), "band_idx", "band_key")
    b = bands.select("grp", F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"), "band_idx", "band_key")
    return (
        a.join(b, ["grp", "band_idx", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["grp", "doc_a", "doc_b"])
        .select("grp", "doc_a", "doc_b", jaccard_col(F.col("sh_a"), F.col("sh_b"), round_digits).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
    round_digits: int = 6,
    max_block: int | None = 2000,
) -> DataFrame:
    """n-gram Jaccard pairs within a blocking group (J2-style blocked
    theta join; blocking keeps the pair count bounded).

    ``max_block`` (DEFAULT 2000 — scale-safe) bounds the quadratic
    exposure: a block of B docs costs B^2/2 pairs, so at 100x data a
    popular block would dominate the job. Blocks larger than ``max_block``
    are REROUTED through minhash-LSH candidate generation (same band
    scheme as :func:`minhash_lsh_pairs`) instead of being silently
    dropped — high-Jaccard pairs still surface (near-dups collide in
    bands w.h.p.), only the hopeless low-similarity tail of a huge block
    is skipped. Pass ``max_block=None`` EXPLICITLY for all-pairs
    everywhere (exact; CI-parity scale only)."""
    docs = df.select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("doc_id"), shingles_col(F.col(text_col), k).alias("sh")
    )
    if max_block is None:
        return _block_all_pairs(docs, round_digits)
    from pyspark.sql.window import Window

    sized = docs.withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    small = sized.filter(F.col("__n") <= max_block).drop("__n")
    big = sized.filter(F.col("__n") > max_block).drop("__n")
    return _block_all_pairs(small, round_digits).unionByName(_block_lsh_pairs(big, round_digits))

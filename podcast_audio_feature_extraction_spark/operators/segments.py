"""Segment index table (SURVEY.md §3.2 lifecycle; operators W1/A6/A7/A8/A10).

Analog of the reference's Elasticsearch segment docs
(/root/reference/src/search/index.py:17-36,55-110): 120 s windows stepped
60 s over each conversation, each segment carrying the ordered
concatenation of its words (index.py:90-91), a word-count length
(index.py:34-35) and a distinct-speaker count (index.py:93-95), keyed
``{conv_id}_{window_start_seconds}`` (index.py:66,81).

Spark plan: ONE groupBy(conv_id, F.window(...)) — the overlapping-window
grouping subsumes the reference's per-window interval scan. Ordered text
aggregation uses sort_array(collect_list(struct(ts, turn_idx, text)))
for the stable-(conv_id, turn_idx)-ordering invariant; collect_list alone
is NOT order-deterministic under shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from podcast_audio_feature_extraction_spark.functions.time import ts_micros


def build_segments(
    df: DataFrame,
    length: str = "120 seconds",
    hop: str = "60 seconds",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    exact_speakers: bool = True,
    skew_salts: int | None = None,
) -> DataFrame:
    """``exact_speakers=True`` (default) counts speakers exactly via
    ``size(collect_set(role))`` — a single-pass aggregate whose state is
    the distinct role set (bounded by the role vocabulary).
    ``exact_speakers=False`` switches to approx_count_distinct (HLL,
    constant state) for corpora whose per-window speaker cardinality is
    itself huge; for the reference's use (a boolean-ish mood feature)
    either is fine."""
    win = F.window(F.col(ts_col), length, hop)
    if skew_salts and not exact_speakers:
        # the salted branch merges per-salt role SETS (array_distinct over
        # flattened partials) — necessarily exact; HLL sketches can't be
        # merged through collect_list. Silently computing the more
        # expensive exact plan would hide the config conflict.
        raise ValueError(
            "build_segments: exact_speakers=False is not supported with skew_salts "
            "(salt partials merge role sets exactly); drop one of the two flags"
        )
    if skew_salts:
        # Viral-conversation guard: collect_list is holistic, so a hot
        # (conv, window) group's whole text buffer lands on one reducer.
        # Stage 1 collects per (conv, win, salt) — the hot group spreads
        # over skew_salts reducers; stage 2 flattens the salt partials and
        # sorts ONCE (total order => result identical to the unsalted
        # plan). n_turns re-sums partial counts; speakers merges partial
        # role sets. Costs one extra (small: partials only) shuffle — use
        # when detect_heavy_keys says the corpus has viral conversations.
        from podcast_audio_feature_extraction_spark.operators.skew import with_salt

        partial = (
            with_salt(df, n_salts=skew_salts, tie_col="turn_idx")
            .groupBy(F.col(conv_col), win.alias("win"), F.col("salt"))
            .agg(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col("turn_idx"), F.col("text"))
                ).alias("__items"),
                F.count(F.lit(1)).alias("__n"),
                F.collect_set("role").alias("__roles"),
            )
        )
        ordered = F.sort_array(F.flatten(F.collect_list("__items")))
        grouped = partial.groupBy(conv_col, "win").agg(
            F.array_join(F.transform(ordered, lambda s: s["text"]), " ").alias("seg_words"),
            F.sum("__n").alias("n_turns"),
            F.size(F.array_distinct(F.flatten(F.collect_list("__roles")))).cast("long").alias(
                "seg_speakers"
            ),
        )
    else:
        ordered = F.sort_array(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col("turn_idx"), F.col("text")))
        )
        # exact speakers via size(collect_set): identical to
        # count(DISTINCT role) (both skip NULLs), but a single-pass
        # aggregate — count_distinct plans a 2-phase Expand that
        # DUPLICATES every input row (text payload included) and adds a
        # second Exchange on (conv, win, role); with the holistic text
        # collect in the same agg that doubled the shuffled bytes
        # (measured ~25% off the segments row). collect_set's per-group
        # state is the distinct role set — bounded by the role vocabulary,
        # scale-safe.
        speakers = (
            F.size(F.collect_set("role")).cast("long")
            if exact_speakers
            else F.approx_count_distinct("role")
        )
        # NOTE: unlike the numeric functional grid, this aggregation keeps
        # map-side partial aggregation: for a HOT (conv, window) group the
        # partial collect is the parallelism (32 map tasks build text
        # buffers concurrently; the reducer merges buffers instead of
        # collecting 3M raw rows serially — measured 2.5x on the viral
        # burst bench when partials were removed).
        grouped = df.groupBy(F.col(conv_col), win.alias("win")).agg(
            F.array_join(F.transform(ordered, lambda s: s["text"]), " ").alias("seg_words"),
            F.count(F.lit(1)).alias("n_turns"),
            speakers.alias("seg_speakers"),
        )
    return (
        grouped
        .select(
            F.concat_ws(
                "_", F.col(conv_col), (ts_micros(F.col("win.start")) / F.lit(1_000_000)).cast("long").cast("string")
            ).alias("seg_id"),
            conv_col,
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "seg_words",
            F.size(F.filter(F.split(F.col("seg_words"), r"\s+"), lambda x: x != "")).cast("int").alias("seg_length"),
            "n_turns",
            "seg_speakers",
        )
    )


def build_segments_sql(length_s: int = 120, hop_s: int = 60, src: str = "transcript") -> str:
    """DuckDB twin of :func:`build_segments`."""
    n_shifts = length_s // hop_s
    shifts = ", ".join(f"({i * hop_s})" for i in range(n_shifts))
    return f"""
        SELECT conv_id || '_' || CAST(CAST(epoch_us(win_start) / 1e6 AS BIGINT) AS VARCHAR) AS seg_id,
               conv_id,
               win_start,
               win_start + INTERVAL {length_s} SECOND AS win_end,
               string_agg(text, ' ' ORDER BY ts, turn_idx) AS seg_words,
               CAST(len(list_filter(regexp_split_to_array(string_agg(text, ' ' ORDER BY ts, turn_idx), '\\s+'), x -> x <> '')) AS INT) AS seg_length,
               count(*) AS n_turns,
               count(DISTINCT role) AS seg_speakers
        FROM (
            SELECT t.*, make_timestamp(((epoch_us(ts) // ({hop_s} * 1000000)) * {hop_s} - off.o) * 1000000) AS win_start
            FROM {src} t CROSS JOIN (VALUES {shifts}) AS off(o)
        )
        WHERE epoch_us(ts) >= epoch_us(win_start)
          AND epoch_us(ts) <  epoch_us(win_start) + {length_s} * 1000000
        GROUP BY conv_id, win_start
    """

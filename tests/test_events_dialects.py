"""The transcript view is defined ONCE in both dialects
(sources/events.py: TRANSCRIPT_SQL for DuckDB, transcript_from_events for
Spark). The driver parquet has no NULL props, so the oracle gate alone
cannot catch NULL-handling divergence — this test feeds both dialects a
table WITH NULLs and compares every derived column."""

import duckdb
import pandas as pd

from podcast_audio_feature_extraction_spark.sources.events import TRANSCRIPT_SQL, transcript_from_events


def test_transcript_dialects_agree_on_null_props(spark):
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [7, 7, 8, 8],
            "event_type": ["view", "purchase", "error", "signup"],
            "props": ['{"k":1}', None, None, '{"k":2}'],
            "ts": pd.to_datetime([10, 20, 30, 40], unit="s"),
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    got = (
        transcript_from_events(spark.createDataFrame(events))
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", events)
    want = (
        con.execute(TRANSCRIPT_SQL + " ORDER BY conv_id, turn_idx").fetchdf().reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        g, w = got[c].fillna("∅"), want[c].fillna("∅")
        assert (g.astype(str) == w.astype(str)).all(), f"dialect divergence in {c}: {g.tolist()} vs {w.tolist()}"
    # the NULL-props rows must keep the event_type text (concat_ws skips
    # NULLs in BOTH dialects; '||' would have nulled the whole text)
    assert "purchase" in set(got["text"])
    assert "error" in set(got["text"])

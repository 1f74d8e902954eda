import numpy as np

from podcast_audio_feature_extraction_spark.operators.sessionize import sessionize, session_bounds
from podcast_audio_feature_extraction_spark.oracle.numpy_oracle import sessionize_np, sort_transcript

GAP = 1800.0


def test_sessionize_matches_oracle(spark, transcripts_sdf, transcripts_pdf):
    got = (
        sessionize(transcripts_sdf, gap_s=GAP)
        .select("conv_id", "turn_idx", "ts", "session_id")
        .toPandas()
        .sort_values(["conv_id", "ts", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = sessionize_np(transcripts_pdf, gap_s=GAP)[["conv_id", "turn_idx", "ts", "session_id"]]
    assert len(got) == len(want)
    assert (got["conv_id"].to_numpy() == want["conv_id"].to_numpy()).all()
    assert (got["turn_idx"].to_numpy() == want["turn_idx"].to_numpy()).all()
    np.testing.assert_array_equal(got["session_id"].to_numpy(), want["session_id"].to_numpy())


def test_sessions_are_monotone_and_zero_based(spark, transcripts_sdf):
    pdf = sessionize(transcripts_sdf, gap_s=GAP).toPandas()
    for _, g in pdf.groupby("conv_id"):
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        sid = g["session_id"].to_numpy()
        assert sid[0] == 0
        assert (np.diff(sid) >= 0).all()
        assert set(np.unique(sid)) == set(range(sid.max() + 1))


def test_session_bounds_counts(spark, transcripts_sdf, transcripts_pdf):
    sess = sessionize(transcripts_sdf, gap_s=GAP)
    bounds = session_bounds(sess).toPandas()
    assert bounds["n_turns"].sum() == len(transcripts_pdf)
    assert (bounds["duration_s"] >= 0).all()
    # every gap inside a session is <= GAP
    pdf = sort_transcript(sess.toPandas())
    for (_, _), g in pdf.groupby(["conv_id", "session_id"]):
        ts = g["ts"].astype("int64").to_numpy() / 1e9
        if len(ts) > 1:
            assert np.diff(ts).max() <= GAP

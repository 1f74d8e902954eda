import numpy as np

from podcast_audio_feature_extraction_spark.functions.embedding import with_embedding, embed_text_np
from podcast_audio_feature_extraction_spark.oracle.numpy_oracle import embed_text_oracle


def test_embed_udf_matches_oracle(spark, transcripts_sdf, transcripts_pdf):
    got = (
        with_embedding(transcripts_sdf, dim=64)
        .select("conv_id", "turn_idx", "text", "embedding")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )
    want = transcripts_pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
    assert len(got) == len(want)
    sample = np.random.default_rng(0).choice(len(got), size=min(300, len(got)), replace=False)
    for i in sample:
        g = np.array(got.loc[i, "embedding"], dtype=np.float64)
        w = embed_text_oracle(want.loc[i, "text"], dim=64)
        np.testing.assert_allclose(g, w, rtol=1e-12, atol=1e-12)


def test_embed_unit_norm_or_zero():
    v = embed_text_np("hello world hello", dim=32)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12
    z = embed_text_np("", dim=32)
    assert np.linalg.norm(z) == 0.0
    assert np.linalg.norm(embed_text_np(None, dim=32)) == 0.0

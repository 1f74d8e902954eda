import json

import numpy as np
import pandas as pd
import pytest

from podcast_audio_feature_extraction_spark.sources.asr_json import (
    full_transcript,
    parse_asr_strings,
    timestamped_words,
    words_to_transcript_table,
)
from podcast_audio_feature_extraction_spark.sources.multimodal import (
    extract_media_features,
    media_feature_summary,
    synthesize_media,
)


def _asr_doc(words, transcripts):
    results = [{"alternatives": [{"transcript": t, "confidence": 0.9, "words": None}]} for t in transcripts]
    results.append(
        {
            "alternatives": [
                {
                    "transcript": None,
                    "confidence": None,
                    "words": [
                        {"startTime": f"{s}s", "endTime": f"{e}s", "word": w, "speakerTag": tag}
                        for (s, e, w, tag) in words
                    ],
                }
            ]
        }
    )
    return json.dumps({"results": results})


@pytest.fixture(scope="module")
def asr_sdf(spark):
    docs = [
        ("ep1", _asr_doc([(0.0, 0.5, "hello", 1), (0.5, 1.2, "world", 2)], [" hello", " world"])),
        ("ep2", _asr_doc([(3.0, 3.5, "spark", 1)], [" spark rules"])),
    ]
    sdf = spark.createDataFrame(pd.DataFrame(docs, columns=["episode_id", "json"]))
    return parse_asr_strings(sdf)


def test_timestamped_words_explode_and_cast(spark, asr_sdf):
    got = timestamped_words(asr_sdf).toPandas().sort_values(["episode_id", "word_idx"]).reset_index(drop=True)
    assert list(got["word"]) == ["hello", "world", "spark"]
    np.testing.assert_allclose(got["start_s"], [0.0, 0.5, 3.0])
    np.testing.assert_allclose(got["end_s"], [0.5, 1.2, 3.5])
    assert list(got["speaker"]) == [1, 2, 1]
    assert got["start_s"].dtype == np.float64


def test_full_transcript_concats_all_but_last(spark, asr_sdf):
    got = full_transcript(asr_sdf).toPandas().set_index("episode_id")["transcript"]
    assert got["ep1"] == " hello world"
    assert got["ep2"] == " spark rules"


def test_words_adapter_schema(spark, asr_sdf):
    t = words_to_transcript_table(timestamped_words(asr_sdf))
    assert [f.name for f in t.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    row = t.filter("conv_id = 'ep2'").first()
    assert row["role"] == "speaker_1" and row["text"] == "spark"


def test_media_features_deterministic_fanout(spark):
    media = synthesize_media(spark, n=12, seed=42)
    feats = extract_media_features(media, window=256, hop=128)
    pdf = feats.toPandas()
    assert len(pdf) > 12  # UDTF shape: more frames than media rows
    assert all(len(f) == 16 for f in pdf["feature"])
    # deterministic across runs
    pdf2 = extract_media_features(media, window=256, hop=128).toPandas()
    a = pdf.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    b = pdf2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert (a["media_id"] == b["media_id"]).all()
    np.testing.assert_allclose(np.stack(a["feature"]), np.stack(b["feature"]))
    # rollup covers every media item
    summary = media_feature_summary(feats).toPandas()
    assert set(summary["media_id"]) == set(media.toPandas()["media_id"])


def test_media_real_decode_is_explicit_stub_for_compressed(spark):
    """decode='real' on non-WAV payloads lands every item in the
    quarantine channel with the NotImplementedError message (E2 fault
    isolation, not a task failure)."""
    from podcast_audio_feature_extraction_spark.sources.multimodal import quarantine

    media = synthesize_media(spark, n=3)  # random-byte payloads, no RIFF
    ok, bad = quarantine(extract_media_features(media, decode="real"))
    assert ok.count() == 0
    errs = bad.toPandas()
    assert len(errs) == 3
    assert errs["error"].str.contains("NotImplementedError").all()


def test_media_real_decode_wav_end_to_end(spark):
    """16-bit PCM WAV payloads REALLY decode (stdlib wave): channel-mean
    downmix /32768.0 like the reference; image/video stay quarantined."""
    import numpy as np
    from podcast_audio_feature_extraction_spark.sources.multimodal import quarantine

    media = synthesize_media(spark, n=9, seed=7, wav_audio=True)
    ok, bad = quarantine(extract_media_features(media, decode="real", window=64, hop=32))
    okp = ok.toPandas()
    assert set(okp["kind"]) == {"audio"}  # 3 of 9 items are audio
    assert okp["media_id"].nunique() == 3
    assert bad.count() == 6  # image + video quarantined
    # downmix of int16 noise: mean ~0, |values| <= 1
    feats = np.stack(okp["feature"])
    assert np.abs(feats[:, 0]).max() < 0.5  # window means near zero
    assert feats[:, 2].min() >= -1.0 and feats[:, 3].max() <= 1.0


def test_media_quarantine_isolates_bad_rows(spark):
    media = synthesize_media(spark, n=6)
    from podcast_audio_feature_extraction_spark.sources.multimodal import quarantine

    ok, bad = quarantine(extract_media_features(media, decode="fake"))
    assert bad.count() == 0
    assert ok.count() > 0
    assert "error" not in ok.columns


def test_sample_frames_strided_fanout(spark):
    from podcast_audio_feature_extraction_spark.sources.multimodal import quarantine, sample_frames

    media = synthesize_media(spark, n=9, seed=3)
    ok, bad = quarantine(sample_frames(media, every=3, frame_size=128))
    pdf = ok.toPandas()
    assert bad.count() == 0
    assert all(len(f) == 128 for f in pdf["frame"])
    # strided: only frame indices 0, 3, 6, ... appear
    assert (pdf["frame_idx"] % 3 == 0).all()
    # per-item frame count == ceil(n_full_frames / 3) for its payload size
    sizes = {r["media_id"]: len(r["payload"]) for r in media.select("media_id", "payload").collect()}
    per = pdf.groupby("media_id")["frame_idx"].count()
    for mid, cnt in per.items():
        n_frames = sizes[mid] // 128
        assert cnt == (n_frames + 2) // 3


def test_resize_pooled_block_average(spark):
    import numpy as np
    import pandas as pd
    from podcast_audio_feature_extraction_spark.schema import MEDIA_SCHEMA
    from podcast_audio_feature_extraction_spark.sources.multimodal import quarantine, resize_pooled

    # 4x4 image with known byte values -> 2x2 average pool
    px = np.arange(16, dtype=np.uint8)  # values 0..15
    rows = [
        {
            "media_id": "img1", "conv_id": "c0", "kind": "image",
            "payload": px.tobytes(), "mime": "image/png",
            "width": 4, "height": 4, "sample_rate": None, "duration_s": None,
        },
        {  # payload shorter than declared dims -> quarantined
            "media_id": "img2", "conv_id": "c0", "kind": "image",
            "payload": b"\x00\x01", "mime": "image/png",
            "width": 4, "height": 4, "sample_rate": None, "duration_s": None,
        },
    ]
    media = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    ok, bad = quarantine(resize_pooled(media, out_w=2, out_h=2))
    got = ok.toPandas().set_index("media_id")
    assert bad.toPandas()["media_id"].tolist() == ["img2"]
    want = px.reshape(4, 4).astype(float).reshape(2, 2, 2, 2).mean(axis=(1, 3)).ravel() / 256.0
    np.testing.assert_allclose(np.array(got.loc["img1", "pixels"]), want)


def test_read_metadata_tsv_and_qrels(spark, tmp_path):
    from podcast_audio_feature_extraction_spark.sources.tabular import read_metadata_tsv, read_qrels

    tsv = tmp_path / "metadata.tsv"
    hdr = "episode_uri\tshow_name\tshow_description\tpublisher\tlanguage\tshow_filename_prefix\tepisode_filename_prefix\tepisode_name\tepisode_description\tduration"
    row = 'spotify:episode:abc\tMy "Show"\tA desc\tPub\ten\tshow_1\tep_1\tEp One\t"has\ttab? no, quoted"\t12.5'
    tsv.write_text(hdr + "\n" + row + "\n")
    got = read_metadata_tsv(spark, str(tsv)).toPandas()
    assert got.loc[0, "episode_uri"] == "spotify:episode:abc"
    assert got.loc[0, "duration"] == 12.5

    qrels = tmp_path / "qrels.list"
    qrels.write_text("1 0 ep_1_60 2\n1 0  ep_2_120  0\n\n8 0 ep_9_0 1\n")
    q = read_qrels(spark, str(qrels)).toPandas().sort_values(["topic_id", "seg_id"]).reset_index(drop=True)
    assert len(q) == 3
    assert list(q["topic_id"]) == [1, 1, 8]
    assert q.loc[0, "seg_id"] == "ep_1_60" and q.loc[0, "grade"] == 2

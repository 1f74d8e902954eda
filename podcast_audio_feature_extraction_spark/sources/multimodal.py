"""Multimodal columns: media as opaque binary + typed metadata.

The reference's audio path (ogg -> int16 PCM -> downmix -> windowed model,
/root/reference/src/features/YAMNetExtractor.py:61-95) maps to: binary
payload column -> decode -> per-window feature rows (1 media row in, n
feature rows out — the UDTF shape, SURVEY.md §2.10 E5).

Codec coverage in this container: ``decode="real"`` REALLY decodes 16-bit
PCM WAV (stdlib ``wave`` — the reference's int16 read + channel-mean
downmix, exactly); compressed formats (ogg/png/mp4) raise
NotImplementedError with the swap-in documented, since PIL/soundfile/pyav
are absent here. ``decode="fake"`` is a deterministic byte-level decoder
that keeps every Spark-side contract real and testable — schema, Arrow
batch shape, mapInPandas plumbing, per-window fan-out, executor-singleton
model slot, quarantine channel.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from podcast_audio_feature_extraction_spark.schema import MEDIA_SCHEMA

FEATURE_DIM = 16

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
        # E2 quarantine channel (FeatureExtractor.py:57-65 analog): a failed
        # decode produces ONE row with feature=null and the error recorded,
        # instead of killing the task — split off with quarantine()
        T.StructField("error", T.StringType(), True),
    ]
)


def _wav_bytes(rng, n_samples: int, n_ch: int = 2, rate: int = 16000) -> bytes:
    """Real little WAV file (16-bit PCM) for exercising the real decoder."""
    import io
    import wave

    pcm = rng.integers(-32768, 32767, size=(n_samples, n_ch), dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def synthesize_media(spark: SparkSession, n: int = 32, seed: int = 42, wav_audio: bool = False) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes);
    ``wav_audio=True`` makes audio payloads REAL 16-bit PCM WAV files so
    the real decode path is exercised end-to-end."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        # images carry exactly width*height pixel bytes (metadata-consistent)
        size = 64 * 64 if kind == "image" else int(rng.integers(256, 4096))
        if kind == "audio" and wav_audio:
            payload = _wav_bytes(rng, n_samples=size)
        else:
            payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "conv_id": f"c{i % 7}",
                "kind": kind,
                "payload": payload,
                "mime": {"image": "image/png", "audio": "audio/ogg", "video": "video/mp4"}[kind],
                "width": 64 if kind != "audio" else None,
                "height": 64 if kind != "audio" else None,
                "sample_rate": 44100 if kind != "image" else None,
                "duration_s": float(rng.integers(1, 30)) if kind != "image" else None,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)


def _decode_wav(payload: bytes) -> np.ndarray:
    """REAL decode for PCM WAV via the stdlib ``wave`` module: 16-bit
    frames -> channel-mean downmix -> /32768.0 — byte-for-byte the
    reference's read path (YAMNetExtractor.py:69-70:
    ``sf.read(dtype=int16)`` then ``np.mean(wav, axis=1)/32768.0``)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch = w.getnchannels()
        if w.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got sampwidth={w.getsampwidth()}")
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64).reshape(-1, n_ch)
    return x.mean(axis=1) / 32768.0


def _decode_real(payload: bytes, kind: str) -> np.ndarray:
    if (
        kind == "audio"
        and payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        return _decode_wav(payload)
    raise NotImplementedError(
        "decode beyond PCM WAV requires codec libs not present in this "
        "container (re-verified round 5: soundfile/PIL/librosa/cv2/av all "
        "absent): image -> PIL.Image.open(BytesIO(payload)) -> np.asarray; "
        "compressed audio -> soundfile.read(BytesIO(payload), dtype='int16') "
        "-> stereo downmix mean(axis=1)/32768.0 (YAMNetExtractor.py:69-70); "
        "video -> pyav frame iterator. Swap _decode for these on a real "
        "cluster — the mapInPandas plumbing below is unchanged."
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in: payload bytes as a [0,1) float signal."""
    if payload is None or len(payload) == 0:
        return np.zeros(0, dtype=np.float64)
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float64) / 256.0


def extract_media_features(
    media: DataFrame,
    window: int = 256,
    hop: int = 128,
    decode: str = "fake",
) -> DataFrame:
    """Per-window media features via mapInPandas (UDTF shape: one media row
    -> n frame rows). Feature = [mean, std(pop), min, max, ...histogram]
    of the decoded signal per window — the engine-side analog of a model
    embedding per 0.96 s patch.

    Arrow batches stream through the Python worker; the decoder is chosen
    once per executor (executor-singleton pattern, E3/E9).
    """
    decoder = {"fake": _decode_fake, "real": _decode_real}[decode]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                # per-item fault isolation (E2): one bad payload quarantines
                # itself, the rest of the batch proceeds
                try:
                    sig = decoder(payload, kind)
                    if sig.size < window:
                        windows = [sig] if sig.size else []
                    else:
                        starts = range(0, sig.size - window + 1, hop)
                        windows = [sig[s : s + window] for s in starts]
                    for fi, w in enumerate(windows):
                        # (-1, 1) covers both decoders: fake bytes land in
                        # [0, 1), real PCM downmix in [-1, 1]
                        hist, _ = np.histogram(w, bins=FEATURE_DIM - 4, range=(-1.0, 1.0))
                        feat = np.concatenate(
                            [[w.mean(), w.std(), w.min(), w.max()], hist / max(w.size, 1)]
                        )
                        out_rows.append((media_id, kind, fi, feat.tolist(), None))
                except Exception as e:  # noqa: BLE001
                    out_rows.append((media_id, kind, -1, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(out_rows, columns=["media_id", "kind", "frame_idx", "feature", "error"])

    return media.select("media_id", "kind", "payload").mapInPandas(process, schema=MEDIA_FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.ArrayType(T.DoubleType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.DoubleType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def sample_frames(
    media: DataFrame,
    every: int = 5,
    frame_size: int = 256,
    max_frames: int = 100,
    decode: str = "fake",
) -> DataFrame:
    """Strided frame sampling (the video-kind W6 analog: keep every Nth
    frame, bounded count — create_vggish_features.py's ``[:6000:5]`` shape
    applied to media). UDTF fan-out via mapInPandas; failures quarantine
    per item like extract_media_features."""
    decoder = {"fake": _decode_fake, "real": _decode_real}[decode]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                try:
                    sig = decoder(payload, kind)
                    n_frames = sig.size // frame_size
                    for fi in range(0, min(n_frames, max_frames * every), every):
                        rows.append(
                            (media_id, kind, fi, sig[fi * frame_size : (fi + 1) * frame_size].tolist(), None)
                        )
                except Exception as e:  # noqa: BLE001
                    rows.append((media_id, kind, -1, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "frame_idx", "frame", "error"])

    return media.select("media_id", "kind", "payload").mapInPandas(process, schema=FRAME_SCHEMA)


def resize_pooled(media: DataFrame, out_w: int = 8, out_h: int = 8, decode: str = "fake") -> DataFrame:
    """Image resize by average pooling: decoded pixels reshaped to the
    metadata (height, width) grid, block-averaged down to (out_h, out_w).
    Items whose payload does not match width*height quarantine themselves
    (metadata/payload consistency is exactly what breaks at corpus scale).
    Real compressed-image decode needs PIL — documented stub; the pooling
    math and plumbing are real and run on the fake decoder."""
    decoder = {"fake": _decode_fake, "real": _decode_real}[decode]

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload, w, h in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                try:
                    if kind != "image":
                        raise ValueError(f"resize expects image kind, got {kind}")
                    w, h = int(w), int(h)
                    sig = decoder(payload, kind)
                    if sig.size < w * h:
                        raise ValueError(f"payload {sig.size} px < declared {w}x{h}")
                    img = sig[: w * h].reshape(h, w)
                    # crop to a pool-divisible grid, then block-average
                    ch, cw = (h // out_h) * out_h, (w // out_w) * out_w
                    img = img[:ch, :cw]
                    pooled = img.reshape(out_h, ch // out_h, out_w, cw // out_w).mean(axis=(1, 3))
                    rows.append((media_id, out_w, out_h, pooled.ravel().tolist(), None))
                except Exception as e:  # noqa: BLE001
                    rows.append((media_id, out_w, out_h, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=["media_id", "out_w", "out_h", "pixels", "error"])

    return media.select("media_id", "kind", "payload", "width", "height").mapInPandas(
        process, schema=RESIZE_SCHEMA
    )


def quarantine(features: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split feature rows from quarantined failures (errors table, E2)."""
    ok = features.filter(F.col("error").isNull()).drop("error")
    id_cols = [c for c in ("media_id", "kind") if c in features.columns]
    bad = features.filter(F.col("error").isNotNull()).select(*id_cols, "error")
    return ok, bad


def media_feature_summary(features: DataFrame) -> DataFrame:
    """Roll frame-level features up to one row per media item."""
    return features.groupBy("media_id", "kind").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.round(F.avg(F.element_at("feature", 1)), 6).alias("mean_level"),
        F.round(F.max(F.element_at("feature", 4)), 6).alias("peak_level"),
    )

"""pyspark-transcript-feature-engine.

A brand-new PySpark-native feature-engineering engine re-expressing the
capabilities of ``trecpodcasts/podcast-audio-feature-extraction`` (see
SURVEY.md) as a point-in-time / as-of join + window-function pipeline over
a table of multi-turn conversation transcripts
``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``.

Subpackages
-----------
- ``sources``    : scans / generators (synthetic transcripts, events-derived
                   transcripts, nested ASR JSON, multimodal binary columns).
- ``operators``  : relational/windowed operators (sessionize, rolling
                   functionals, as-of join, segments, rerank, dedup, ANN,
                   skew salting, checkpoint/resume).
- ``functions``  : column expressions + vectorized pandas UDFs (text
                   analysis, hash embeddings, mood metrics).
- ``plans``      : end-to-end pipelines (feature backfill flagship).
- ``streaming``  : Structured Streaming variants (session windows).
- ``oracle``     : single-node numpy/pandas golden reimplementation used by
                   parity tests (the reference's own computational medium).
"""

__version__ = "0.1.0"

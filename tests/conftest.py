import pandas as pd
import pytest

from podcast_audio_feature_extraction_spark.session import get_spark
from podcast_audio_feature_extraction_spark.sources.synthetic import generate_transcripts


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pytest-engine", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf() -> pd.DataFrame:
    return generate_transcripts(n_convs=20, mean_turns=25, seed=42)


@pytest.fixture(scope="session")
def transcripts_sdf(spark, transcripts_pdf):
    from podcast_audio_feature_extraction_spark.schema import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(transcripts_pdf, schema=TRANSCRIPT_SCHEMA).cache()

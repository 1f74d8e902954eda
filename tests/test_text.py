import pandas as pd
import pyspark.sql.functions as F

from podcast_audio_feature_extraction_spark.functions.text import (
    attention_mask_col,
    lang_guess_col,
    tokenize_pad_col,
)


def test_tokenize_pad_exact_length_and_pads(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["one two three", "", " ".join(str(i) for i in range(50))]})
    )
    got = (
        df.select(
            "doc_id",
            tokenize_pad_col(F.col("text"), max_len=8).alias("ids"),
            attention_mask_col(F.col("text"), max_len=8).alias("mask"),
        )
        .toPandas()
        .set_index("doc_id")
    )
    for i in (1, 2, 3):
        assert len(got.loc[i, "ids"]) == 8 and len(got.loc[i, "mask"]) == 8
    # short doc: 3 real ids then zeros; mask matches
    assert list(got.loc[1, "ids"][3:]) == [0] * 5
    assert list(got.loc[1, "mask"]) == [1, 1, 1, 0, 0, 0, 0, 0]
    assert all(t > 0 for t in got.loc[1, "ids"][:3])  # 0 reserved for pad
    # empty doc: all pads
    assert list(got.loc[2, "ids"]) == [0] * 8
    # long doc: truncated, no pads, mask all ones
    assert all(t > 0 for t in got.loc[3, "ids"]) and list(got.loc[3, "mask"]) == [1] * 8


def test_lang_guess_basics(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "the cat is in the house and it was a day",
                    "der hund ist nicht zu haus und ich bin da",
                    "zzz qqq xxx",
                ],
            }
        )
    )
    got = df.select("doc_id", lang_guess_col(F.col("text")).alias("lang")).toPandas().set_index("doc_id")["lang"]
    assert got[1] == "en" and got[2] == "de" and got[3] == "unknown"


def test_quality_repetition_and_scrub_signals(spark):
    from podcast_audio_feature_extraction_spark.functions.text import quality_cols

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    "buy now buy now buy now buy now buy now buy now",  # repetitive
                    "every token here is quite different from the others",
                    "contact me at a.user@example.com or https://example.com/page now",
                ],
            }
        )
    )
    q = quality_cols(F.col("text"))
    got = df.select("doc_id", *[c.alias(n) for n, c in q.items()]).toPandas().set_index("doc_id")
    assert got.loc[1, "rep_3gram_ratio"] > 0.7
    assert got.loc[2, "rep_3gram_ratio"] == 0.0
    assert got.loc[3, "n_urls"] == 1 and got.loc[3, "n_emails"] == 1
    assert got.loc[1, "n_urls"] == 0 and got.loc[1, "n_emails"] == 0


def test_unigram_surprisal_orders_rare_above_common(spark):
    from podcast_audio_feature_extraction_spark.operators.lm import unigram_surprisal

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                # doc 1 = only the corpus-dominant token; doc 2 = rare tokens
                "text": ["common common common common", "xylophone quark zeitgeist common"],
            }
        )
    )
    got = unigram_surprisal(df).toPandas().set_index("doc_id")
    assert got.loc[2, "mean_surprisal"] > got.loc[1, "mean_surprisal"]
    assert got.loc[1, "n_tokens"] == 4


def test_rep_ratio_zero_for_short_docs(spark):
    from podcast_audio_feature_extraction_spark.functions.text import quality_cols

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2], "text": ["hello world", ""]}))
    q = quality_cols(F.col("text"))
    got = df.select("doc_id", q["rep_3gram_ratio"].alias("r")).toPandas().set_index("doc_id")["r"]
    # no possible trigram != maximally repetitive
    assert got[1] == 0.0 and got[2] == 0.0

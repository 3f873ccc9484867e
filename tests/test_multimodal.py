"""Multimodal binary-column plumbing tests (SURVEY.md §2.11 L6):
real binaryFile ingest + mapInPandas batch shape; decode stubbed
(no codecs in this container)."""

import pytest

from fcs_etl_reactor_spark.operators.multimodal import (
    extract_features,
    read_media,
    sniff_modality,
    write_partitioned_by_modality,
)


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(b"\x89PNG\r\n\x1a\n" + bytes(range(64)))
    (d / "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + bytes(200))
    (d / "c.wav").write_bytes(b"RIFF....WAVE" + bytes(32))
    (d / "d.bin").write_bytes(bytes([7] * 100))
    return str(d)


def test_sniff_modality():
    assert sniff_modality(b"\x89PNGxxxx") == "image/png"
    assert sniff_modality(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_modality(b"RIFF....") == "audio/wav"
    assert sniff_modality(b"FCS3.1  ") == "cytometry/fcs"
    assert sniff_modality(b"zzzz") == "application/octet-stream"


def test_read_media(spark, media_dir):
    df = read_media(spark, media_dir)
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert rows["a.png"]["modality"] == "image/png"
    assert rows["b.jpg"]["modality"] == "image/jpeg"
    assert rows["c.wav"]["modality"] == "audio/wav"
    assert rows["d.bin"]["modality"] == "application/octet-stream"
    assert rows["a.png"]["n_bytes"] == 72
    assert bytes(rows["d.bin"]["content"]) == bytes([7] * 100)


def test_extract_features_stub(spark, media_dir):
    feats = extract_features(read_media(spark, media_dir), feature_dim=8)
    rows = {r["path"].split("/")[-1]: r["feature"] for r in feats.collect()}
    assert all(len(v) == 8 for v in rows.values())
    # d.bin is 100 bytes of value 7 -> all mass in bin 0
    assert rows["d.bin"][0] == pytest.approx(1.0)
    assert sum(rows["d.bin"]) == pytest.approx(1.0)


def test_extract_features_unstubbed_raises(spark, media_dir):
    with pytest.raises(Exception, match="NotImplementedError|no media codecs"):
        extract_features(read_media(spark, media_dir), decode_stub=False).collect()


def test_partitioned_write(spark, media_dir, tmp_path):
    out = str(tmp_path / "lake")
    write_partitioned_by_modality(read_media(spark, media_dir), out)
    back = spark.read.parquet(out)
    assert back.count() == 4
    assert set(back.select("modality").distinct().toPandas()["modality"]) == {
        "image/png", "image/jpeg", "audio/wav", "application/octet-stream",
    }
    # partition pruning: reading one modality touches one directory
    pruned = spark.read.parquet(out).filter("modality = 'image/png'")
    assert pruned.count() == 1

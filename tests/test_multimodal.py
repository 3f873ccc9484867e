"""Multimodal binary-column tests (SURVEY.md §2.11 L6): real
binaryFile ingest + mapInPandas batch shape, plus the pure-NumPy
BMP/WAV decoders that prove the decode→feature path end-to-end with
real pixel/sample data (no codec libraries in this container)."""

import struct

import numpy as np
import pytest

from fcs_etl_reactor_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    extract_features,
    read_media,
    sniff_modality,
    write_partitioned_by_modality,
)


def make_bmp(width: int, height: int, gray: bool = False) -> bytes:
    """Deterministic gradient image through the package encoder."""
    if gray:
        img = np.fromfunction(
            lambda y, x: (x * 7 + y * 13) % 256, (height, width)
        ).astype(np.uint8)
    else:
        img = np.zeros((height, width, 3), np.uint8)
        y, x = np.indices((height, width))
        img[..., 0], img[..., 1], img[..., 2] = (
            (x + y) % 256, (2 * x) % 256, (3 * y) % 256,
        )
    return encode_bmp(img)


def make_wav(rate: int = 8000, n: int = 1024, channels: int = 1,
             bits: int = 16) -> bytes:
    """PCM WAV with a 440 Hz sine, with a junk chunk spliced before
    data (chunk-walk coverage)."""
    t = np.arange(n * channels) / rate
    x = np.sin(2 * np.pi * 440.0 * t).reshape(n, channels)
    data = encode_wav(rate, x, bits=bits)
    # splice a JUNK chunk between fmt and data to exercise chunk walking
    junk = b"JUNK" + struct.pack("<I", 4) + b"\x00" * 4
    di = data.index(b"data")
    spliced = data[:di] + junk + data[di:]
    return b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(b"\x89PNG\r\n\x1a\n" + bytes(range(64)))
    (d / "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + bytes(200))
    (d / "c.wav").write_bytes(make_wav())
    (d / "d.bin").write_bytes(bytes([7] * 100))
    (d / "e.bmp").write_bytes(make_bmp(13, 7))
    return str(d)


def test_sniff_modality():
    assert sniff_modality(b"\x89PNGxxxx") == "image/png"
    assert sniff_modality(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_modality(b"RIFF....") == "audio/wav"
    assert sniff_modality(b"BM\x00\x00") == "image/bmp"
    assert sniff_modality(b"FCS3.1  ") == "cytometry/fcs"
    assert sniff_modality(b"zzzz") == "application/octet-stream"


# ---- codecs, no Spark --------------------------------------------------


def test_bmp_roundtrip_property():
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (5, 3), (7, 13, 3), (16, 16), (2, 9, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_bmp(encode_bmp(img))
        np.testing.assert_array_equal(out, img)


def test_wav_roundtrip_property():
    rng = np.random.default_rng(11)
    for channels in (1, 2):
        # exactly-representable 16-bit levels → lossless roundtrip
        q = rng.integers(-32768, 32768, size=(300, channels))
        x = q / 32768.0
        rate, back = decode_wav(encode_wav(44100, x))
        assert rate == 44100
        np.testing.assert_allclose(back, x, atol=0)


def test_png_roundtrip_all_filters():
    from fcs_etl_reactor_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(13)
    for shape in [(1, 1), (5, 3), (7, 13, 3), (16, 16), (2, 9, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        encodings = [encode_png(img, filter_type=f) for f in range(5)]
        for f, blob in enumerate(encodings):
            assert blob[:8] == b"\x89PNG\r\n\x1a\n"
            out = decode_png(blob)
            np.testing.assert_array_equal(out, img, err_msg=f"filter {f}")
        # different filters = different bytes, same pixels
        assert len({e for e in encodings}) > 1 or img.size == 1


def test_png_rejects_garbage_and_bad_crc():
    import pytest

    from fcs_etl_reactor_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"NOPE" * 10)
    blob = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    blob[-5] ^= 0xFF  # corrupt the IEND CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_png_feature_extraction_matches_bmp():
    # identical pixels through either container → identical features
    from fcs_etl_reactor_spark.operators.multimodal import (
        _decode_feature,
        encode_bmp,
        encode_png,
    )

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    via_png = _decode_feature(encode_png(img, filter_type=4), "image/png", 8)
    via_bmp = _decode_feature(encode_bmp(img), "image/bmp", 8)
    np.testing.assert_array_equal(via_png, via_bmp)


def test_decode_bmp_rgb_roundtrip():
    img = decode_bmp(make_bmp(13, 7))
    assert img.shape == (7, 13, 3)
    # row 0 (top), pixel x: BGR = ((x+0)%256, 2x%256, 0)
    assert img[0, 5, 0] == 5 and img[0, 5, 1] == 10 and img[0, 5, 2] == 0
    # bottom row y=6: blue = (x+6)%256
    assert img[6, 2, 0] == 8


def test_decode_bmp_gray_roundtrip():
    img = decode_bmp(make_bmp(10, 4, gray=True))
    assert img.shape == (4, 10)
    assert img[2, 3] == (3 * 7 + 2 * 13) % 256


def test_decode_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + bytes(20))
    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG")


def test_decode_wav_16bit():
    rate, samples = decode_wav(make_wav(rate=8000, n=1024))
    assert rate == 8000 and samples.shape == (1024, 1)
    # 440 Hz sine RMS ≈ 1/sqrt(2)
    assert np.sqrt((samples**2).mean()) == pytest.approx(0.707, abs=0.01)


def test_decode_wav_8bit_stereo():
    rate, samples = decode_wav(make_wav(rate=4000, n=256, channels=2, bits=8))
    assert rate == 4000 and samples.shape == (256, 2)
    assert np.abs(samples).max() <= 1.0


def test_decode_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"RIFF....WAVE" + bytes(32))  # no fmt/data chunks


# ---- Spark plumbing ----------------------------------------------------


def test_read_media(spark, media_dir):
    df = read_media(spark, media_dir)
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert rows["a.png"]["modality"] == "image/png"
    assert rows["b.jpg"]["modality"] == "image/jpeg"
    assert rows["c.wav"]["modality"] == "audio/wav"
    assert rows["e.bmp"]["modality"] == "image/bmp"
    assert rows["d.bin"]["modality"] == "application/octet-stream"
    assert rows["a.png"]["n_bytes"] == 72
    assert bytes(rows["d.bin"]["content"]) == bytes([7] * 100)


def test_extract_features_histogram(spark, media_dir):
    feats = extract_features(read_media(spark, media_dir), feature_dim=8)
    rows = {r["path"].split("/")[-1]: r["feature"] for r in feats.collect()}
    assert all(len(v) == 8 for v in rows.values())
    # d.bin is 100 bytes of value 7 -> all mass in bin 0
    assert rows["d.bin"][0] == pytest.approx(1.0)
    assert sum(rows["d.bin"]) == pytest.approx(1.0)


def test_extract_features_auto_decodes_real_formats(spark, media_dir):
    feats = extract_features(read_media(spark, media_dir), mode="auto")
    rows = {r["path"].split("/")[-1]: r["feature"] for r in feats.collect()}
    # e.bmp really decoded: [1, W, H, channels, mean, std, row-energy, 0]
    assert rows["e.bmp"][0] == 1.0
    assert rows["e.bmp"][1] == 13.0 and rows["e.bmp"][2] == 7.0
    assert rows["e.bmp"][3] == 3.0
    # c.wav really decoded: [2, rate/1e5, log10(n), ch, rms≈0.707, ...]
    assert rows["c.wav"][0] == 2.0
    assert rows["c.wav"][1] == pytest.approx(0.08)
    assert rows["c.wav"][4] == pytest.approx(0.707, abs=0.01)
    # the fake a.png fails the real PNG decoder -> histogram fallback
    # (mass sums to 1); a VALID png would real-decode (see the
    # png_feature_extraction test)
    assert sum(rows["a.png"]) == pytest.approx(1.0)


def test_extract_features_strict_raises_for_unsupported(spark, media_dir):
    # jpeg has no decoder (NotImplementedError); the fake a.png now
    # reaches the REAL PNG decoder, which rejects its garbage chunks
    with pytest.raises(
        Exception, match="NotImplementedError|no pure-NumPy|truncated PNG|not a PNG"
    ):
        extract_features(read_media(spark, media_dir), mode="strict").collect()


def test_partitioned_write(spark, media_dir, tmp_path):
    out = str(tmp_path / "lake")
    write_partitioned_by_modality(read_media(spark, media_dir), out)
    back = spark.read.parquet(out)
    assert back.count() == 5
    assert set(back.select("modality").distinct().toPandas()["modality"]) == {
        "image/png", "image/jpeg", "image/bmp", "audio/wav",
        "application/octet-stream",
    }
    # partition pruning: reading one modality touches one directory
    pruned = spark.read.parquet(out).filter("modality = 'image/png'")
    assert pruned.count() == 1


class TestRawvFrameSampling:
    def test_container_roundtrip_and_seek(self):
        import numpy as np

        from fcs_etl_reactor_spark.operators.multimodal import (
            decode_rawv_frame,
            encode_rawv,
            rawv_frame_count,
        )

        frames = [
            np.arange(64, dtype=np.uint8).reshape(8, 8) + i for i in range(5)
        ]
        data = encode_rawv(frames)
        assert rawv_frame_count(data) == 5
        for i in (0, 2, 4):
            assert (decode_rawv_frame(data, i) == frames[i]).all()

    def test_frame_indices_integer_uniform(self):
        from fcs_etl_reactor_spark.operators.multimodal import frame_indices

        assert frame_indices(7, 3) == [0, 3, 6]
        assert frame_indices(10, 4) == [0, 3, 6, 9]
        assert frame_indices(1, 3) == [0]
        assert frame_indices(2, 2) == [0, 1]

    def test_resize_nn_values(self):
        import numpy as np

        from fcs_etl_reactor_spark.operators.multimodal import resize_nn

        img = np.arange(16, dtype=np.uint8).reshape(4, 4)
        up = resize_nn(img, 8, 8)
        assert up.shape == (8, 8)
        # each source pixel maps to a 2x2 block under exact 2x upscale
        assert (up[::2, ::2] == img).all() and (up[1::2, 1::2] == img).all()
        down = resize_nn(img, 2, 2)
        assert (down == img[[0, 2]][:, [0, 2]]).all()


class TestAudioSpectral:
    def test_parseval_and_dominant_bin(self, spark):
        import numpy as np

        from fcs_etl_reactor_spark.operators.multimodal import (
            audio_spectral_features,
            encode_wav,
        )

        rate, n = 8000, 256
        rows = []
        for k, freq_bin in [("a", 4), ("b", 17), ("c", 31)]:
            t = np.arange(n) / n
            x = 0.5 * np.sin(2 * np.pi * freq_bin * t)[:, None]
            rows.append((k, bytearray(encode_wav(rate, x))))
        df = spark.createDataFrame(rows, "path STRING, content BINARY")
        out = {r["path"]: r for r in audio_spectral_features(df).collect()}
        assert all(r["parseval_ok"] for r in out.values())
        # a pure sine's dominant rfft bin is its cycle count over the clip
        assert out["a"]["dom_bin"] == 4
        assert out["b"]["dom_bin"] == 17
        assert out["c"]["dom_bin"] == 31
        for r in out.values():
            assert r["dom_hz"] == r["dom_bin"] * rate / n
            assert abs(r["rms"] - 0.5 / np.sqrt(2)) < 1e-3  # 16-bit quant


class TestBilinearResize:
    def test_identity_and_constant(self):
        from fcs_etl_reactor_spark.operators.multimodal import resize_bilinear

        img = np.arange(48, dtype=np.uint8).reshape(6, 8)
        np.testing.assert_array_equal(resize_bilinear(img, 6, 8), img)
        const = np.full((5, 7, 3), 99, dtype=np.uint8)
        np.testing.assert_array_equal(
            resize_bilinear(const, 10, 3), np.full((10, 3, 3), 99, np.uint8)
        )

    def test_2x_upsample_midpoints(self):
        from fcs_etl_reactor_spark.operators.multimodal import resize_bilinear

        # 1-D gradient row: doubling width puts known blends at centers
        img = np.array([[0, 100]], dtype=np.uint8)
        out = resize_bilinear(img, 1, 4)
        # centers at src x = -0.25, 0.25, 0.75, 1.25 (clipped) ->
        # values 0, 25, 75, 100
        np.testing.assert_array_equal(out, [[0, 25, 75, 100]])

    def test_downsample_range_and_shape(self):
        from fcs_etl_reactor_spark.operators.multimodal import resize_bilinear

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
        out = resize_bilinear(img, 4, 5)
        assert out.shape == (4, 5, 3) and out.dtype == np.uint8
        assert out.min() >= img.min() and out.max() <= img.max()


class TestSceneCuts:
    def test_diffs_match_numpy_reference(self, spark):
        import numpy as np

        from fcs_etl_reactor_spark.operators.multimodal import (
            encode_rawv,
            scene_cuts,
        )

        rng = np.random.default_rng(3)
        frames = [rng.integers(0, 256, (6, 8), dtype=np.uint8) for _ in range(5)]
        blob = encode_rawv(frames)
        df = spark.createDataFrame([("v0", bytearray(blob))], "path STRING, content BINARY")
        rows = {r["frame_idx"]: r["frame_diff"] for r in scene_cuts(df).collect()}
        for i in range(1, 5):
            want = float(
                np.abs(frames[i].astype(int) - frames[i - 1].astype(int)).mean()
            )
            assert rows[i] == want, i

    def test_identical_frames_never_cut(self, spark):
        import numpy as np

        from fcs_etl_reactor_spark.operators.multimodal import (
            encode_rawv,
            scene_cuts,
        )

        frames = [np.full((4, 4), 7, dtype=np.uint8)] * 4
        df = spark.createDataFrame(
            [("v0", bytearray(encode_rawv(frames)))], "path STRING, content BINARY"
        )
        rows = scene_cuts(df).collect()
        assert len(rows) == 3
        assert all(r["frame_diff"] == 0.0 and not r["is_cut"] for r in rows)

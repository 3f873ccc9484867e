"""Multimodal (binary) columns — SURVEY.md §2.11 L6.

Images/audio/video ride through the engine as opaque ``binary``
columns plus typed metadata, exactly like the FCS DATA segment: the
relational layer routes/filters/joins; Arrow-batched Python does the
per-blob work.

Decoding: the container has no codec libraries (PIL/ffmpeg), so two
container formats with pure-NumPy decoders are supported end-to-end —
uncompressed BMP (8-bit grayscale / 24-bit BGR) and PCM WAV (8/16-bit)
— proving the decode→feature path with real pixel/sample data. Other
formats fall back to a deterministic byte-histogram featurizer (mode
"auto"), or raise NotImplementedError (mode "strict") where a real
codec would plug in. The Spark-side plumbing is identical in every
mode: binaryFile ingest, schema, mapInPandas batch shape,
partition-by-modality writes, magic-number sniffing.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "path STRING, modality STRING, n_bytes BIGINT, magic STRING, content BINARY"
)

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"BM", "image/bmp"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
    (b"FCS", "cytometry/fcs"),
]


def sniff_modality(head: bytes) -> str:
    for magic, modality in _MAGIC:
        if head.startswith(magic):
            return modality
    return "application/octet-stream"


def sniff_media(blobs: DataFrame) -> DataFrame:
    """Attach sniffed modality + byte-level metadata to any
    (path STRING, content BINARY) frame — Arrow-batched, no codec."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "modality": [sniff_modality(bytes(c[:16])) for c in content],
                    "n_bytes": [len(c) for c in content],
                    "magic": [bytes(c[:4]).hex() for c in content],
                    "content": content,
                }
            )

    return blobs.select("path", "content").mapInPandas(_meta, MEDIA_SCHEMA)


def read_media(spark: SparkSession, path: str) -> DataFrame:
    """Ingest a directory of arbitrary binary files with sniffed
    modality and byte-level metadata. One row per file; files are the
    parallel unit (same scaling argument as FCS ingest)."""
    return sniff_media(spark.read.format("binaryFile").load(path))


# ---- pure-NumPy codecs (no codec libraries in this container) ----------


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (H, W) uint8 grayscale or (H, W, 3) uint8 BGR array
    as an uncompressed BMP (the inverse of decode_bmp): BITMAPINFOHEADER,
    bottom-up rows, 4-byte row alignment, 8-bit images carry a
    grayscale palette."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (H,W) gray or (H,W,3) BGR uint8")
    h, w = img.shape[0], img.shape[1]
    bpp = 8 if gray else 24
    row_bytes = (w * bpp // 8 + 3) & ~3
    palette = (
        b"".join(bytes([i, i, i, 0]) for i in range(256)) if gray else b""
    )
    pixel_off = 14 + 40 + len(palette)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = img[y].tobytes()
        rows.append(row.ljust(row_bytes, b"\x00"))
    pixels = b"".join(rows)
    hdr = b"BM" + struct.pack("<IHHI", pixel_off + len(pixels), 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(pixels), 2835, 2835,
        256 if gray else 0, 0,
    )
    return hdr + info + palette + pixels


def encode_wav(rate: int, samples: np.ndarray, bits: int = 16) -> bytes:
    """Encode an (n, channels) float array in [-1, 1] as PCM WAV
    (the inverse of decode_wav; 16-bit signed or 8-bit unsigned)."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples.reshape(-1, 1)
    if samples.ndim != 2:
        raise ValueError("expected (n,) or (n, channels) samples")
    n, channels = samples.shape
    flat = samples.reshape(-1)
    if bits == 16:
        raw = np.clip(flat * 32768.0, -32768, 32767).astype("<i2").tobytes()
    elif bits == 8:
        raw = np.clip(flat * 128.0 + 128.0, 0, 255).astype(np.uint8).tobytes()
    else:
        raise ValueError(f"bits={bits} unsupported")
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed BMP into an (H, W) or (H, W, 3) uint8
    array. Supports the two classic BITMAPINFOHEADER layouts: 8-bit
    (palette ignored — treated as grayscale indices) and 24-bit BGR.
    Rows are 4-byte aligned and stored bottom-up (top-down when height
    is negative), per the Windows DIB spec.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    if bpp not in (8, 24):
        raise ValueError(f"BMP bit depth {bpp} unsupported")
    top_down = height < 0
    height = abs(height)
    row_bytes = (width * bpp // 8 + 3) & ~3
    need = pixel_off + row_bytes * height
    if len(data) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * height,
                         offset=pixel_off).reshape(height, row_bytes)
    if not top_down:
        rows = rows[::-1]
    if bpp == 8:
        return rows[:, :width].copy()
    return rows[:, : width * 3].reshape(height, width, 3).copy()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a PCM WAV into (sample_rate, samples) with samples an
    (n, channels) float64 array in [-1, 1]. Supports 8-bit unsigned
    and 16-bit signed little-endian PCM; walks RIFF chunks properly
    (fmt may precede data with other chunks between).
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    if bits == 8:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    else:
        x = np.frombuffer(raw[: len(raw) & ~1], dtype="<i2").astype(np.float64)
        x = x / 32768.0
    n = len(x) // channels
    return rate, x[: n * channels].reshape(n, channels)


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode an (H, W) uint8 grayscale or (H, W, 3) uint8 RGB array
    as a real PNG (signature + IHDR + one zlib IDAT + IEND, 8-bit,
    non-interlaced). ``filter_type`` picks the per-scanline filter
    (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) so every decoder filter
    path is testable; all five produce byte-different but
    pixel-identical files."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("expected (H,W) gray or (H,W,3) RGB uint8")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"filter_type {filter_type} not in 0..4")
    h, w = img.shape[0], img.shape[1]
    bpp = 1 if gray else 3  # bytes per pixel (8-bit samples)
    rows = img.reshape(h, w * bpp).astype(np.int64)
    zeros = np.zeros((1, w * bpp), dtype=np.int64)
    prior = np.vstack([zeros, rows[:-1]])  # row above (0 for first)
    left = np.hstack([np.zeros((h, bpp), dtype=np.int64), rows[:, :-bpp]])
    upleft = np.hstack([np.zeros((h, bpp), dtype=np.int64), prior[:, :-bpp]])
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - prior
    elif filter_type == 3:
        filt = rows - (left + prior) // 2
    else:  # Paeth
        p = left + prior - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, prior, upleft))
        filt = rows - pred
    raw = b"".join(
        bytes([filter_type]) + (filt[y] & 0xFF).astype(np.uint8).tobytes()
        for y in range(h)
    )

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced grayscale (color type 0) or RGB
    (color type 2) PNG into an (H, W) or (H, W, 3) uint8 array.
    Implements the full scanline-filter reconstruction (None/Sub/Up/
    Average/Paeth), walks chunks properly (IDAT may be split), and
    verifies per-chunk CRCs."""
    import zlib

    if len(data) < 8 or data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or comp != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); only 8-bit gray/RGB non-interlaced"
        )
    bpp = 1 if color == 0 else 3
    stride = w * bpp
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = line + prior
        elif ft in (1, 3, 4):
            # left-dependent filters are sequential per scanline
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                # mask NOW: the next byte's prediction must see the
                # reconstructed (mod-256) value, not the raw sum
                rec[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = rec & 0xFF
    return out.copy() if color == 0 else out.reshape(h, w, 3).copy()


def _histogram_feature(data: bytes, feature_dim: int) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=feature_dim, range=(0, 256))
    return (hist / max(len(arr), 1)).astype(np.float32)


def _decode_feature(data: bytes, modality: str, feature_dim: int) -> np.ndarray:
    """Real-decode features: BMP/PNG → [1, W, H, channels, mean/255,
    std/255, row-energy, 0…]; WAV → [2, rate/1e5, log10(n), channels,
    RMS, zero-crossing rate, peak, 0…]. Raises on undecodable input
    (caller decides whether to fall back)."""
    out = np.zeros(feature_dim, dtype=np.float32)
    if modality in ("image/bmp", "image/png"):
        img = decode_bmp(data) if modality == "image/bmp" else decode_png(data)
        h, w = img.shape[0], img.shape[1]
        chans = 1 if img.ndim == 2 else img.shape[2]
        flat = img.astype(np.float64)
        vals = [1.0, w, h, chans, flat.mean() / 255.0, flat.std() / 255.0,
                np.abs(np.diff(flat, axis=0)).mean() / 255.0 if h > 1 else 0.0]
    elif modality == "audio/wav":
        rate, samples = decode_wav(data)
        mono = samples.mean(axis=1)
        zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if len(mono) > 1 else 0.0
        vals = [2.0, rate / 1e5, np.log10(max(len(mono), 1)), samples.shape[1],
                float(np.sqrt(np.mean(mono**2))), zcr,
                float(np.abs(mono).max()) if len(mono) else 0.0]
    else:
        raise NotImplementedError(
            f"no pure-NumPy decoder for {modality}; plug a real codec "
            "(PIL/torchaudio/ffmpeg) into _decode_feature in prod"
        )
    out[: min(len(vals), feature_dim)] = vals[:feature_dim]
    return out


FEATURE_SCHEMA = "path STRING, modality STRING, feature ARRAY<FLOAT>"


def extract_features(
    df: DataFrame, feature_dim: int = 8, mode: str = "histogram"
) -> DataFrame:
    """Decode + feature-extract per blob via mapInPandas.

    Modes:
    - "histogram": deterministic byte-histogram projection for every
      blob (codec-free; what the oracle-checked q75 envelope uses).
    - "auto": real pure-NumPy decode for supported formats (BMP, WAV),
      byte-histogram fallback for the rest — the production shape when
      some modalities lack a codec.
    - "strict": real decode or NotImplementedError — surfaces exactly
      which formats would need a codec library.
    """
    if mode not in ("histogram", "auto", "strict"):
        raise ValueError(f"unknown mode {mode!r}")

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for c, m in zip(pdf["content"], pdf["modality"]):
                data = bytes(c)
                if mode == "histogram":
                    feats.append(_histogram_feature(data, feature_dim))
                elif mode == "strict":
                    feats.append(_decode_feature(data, m, feature_dim))
                else:
                    # corrupt-blob tolerance must cover codec-internal
                    # errors too: a valid-signature PNG with a corrupt
                    # deflate stream raises zlib.error, truncation mid-
                    # chunk raises struct.error — neither is a ValueError
                    # subclass, and one bad blob must not sink the batch
                    import struct as _struct
                    import zlib as _zlib

                    try:
                        feats.append(_decode_feature(data, m, feature_dim))
                    except (
                        ValueError,
                        NotImplementedError,
                        _zlib.error,
                        _struct.error,
                        IndexError,
                    ):
                        feats.append(_histogram_feature(data, feature_dim))
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "modality": pdf["modality"],
                    "feature": feats,
                }
            )

    return df.select("path", "modality", "content").mapInPandas(
        _extract, FEATURE_SCHEMA
    )


def write_partitioned_by_modality(df: DataFrame, path: str) -> None:
    """S5 for media: partition the lake by modality so downstream scans
    prune entire modalities."""
    df.write.mode("overwrite").partitionBy("modality").parquet(path)


# --------------------------------------------------------------------------
# Video-shaped ops: frame sampling and resize. Real video codecs are
# absent from the container, so the honest design splits cleanly:
# the CONTAINER layer (RAWV below: length-indexed concatenated BMP
# frames) is real and seekable, the per-frame codec is the real BMP
# one, and an actual mp4/webm would plug in behind decode_frame with
# the same signature. The load-bearing property for 100 TB video is
# SEEKABILITY: sampling k of n frames reads k frames' bytes via the
# index table — never a full-container decode.
# --------------------------------------------------------------------------

_RAWV_MAGIC = b"RAWV"


def encode_rawv(frames: list[np.ndarray]) -> bytes:
    """Container: magic, u32 frame count, u32 per-frame lengths, then
    the frames as BMP blobs back-to-back (the length table makes any
    frame O(1) seekable)."""
    blobs = [encode_bmp(f) for f in frames]
    import struct

    head = _RAWV_MAGIC + struct.pack("<I", len(blobs))
    head += b"".join(struct.pack("<I", len(b)) for b in blobs)
    return head + b"".join(blobs)


def rawv_frame_count(data: bytes) -> int:
    import struct

    assert data[:4] == _RAWV_MAGIC, "not a RAWV container"
    return struct.unpack_from("<I", data, 4)[0]


def decode_rawv_frame(data: bytes, idx: int) -> np.ndarray:
    """Seek + decode ONE frame: index-table lookup, then the real BMP
    decoder on that frame's byte range only."""
    import struct

    n = rawv_frame_count(data)
    assert 0 <= idx < n, f"frame {idx} out of range {n}"
    lengths = struct.unpack_from(f"<{n}I", data, 8)
    start = 8 + 4 * n + sum(lengths[:idx])
    return decode_bmp(data[start : start + lengths[idx]])


def frame_indices(n_total: int, k: int) -> list[int]:
    """Uniform k-of-n sampling with pure integer arithmetic —
    replayable in any engine: idx_i = floor(i·(n−1)/(k−1))."""
    if k <= 1 or n_total <= 1:
        return [0]
    return [min((i * (n_total - 1)) // (k - 1), n_total - 1) for i in range(k)]


def resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure NumPy): index maps computed once,
    applied as a fancy-index gather — the vectorized kernel shape any
    real resampler (bilinear, area) would reuse."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return img[rows][:, cols]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize (pure NumPy, uint8 in/out): align-corners=False
    (half-pixel centers, the OpenCV/PIL convention), gather the four
    neighbors with precomputed index/weight vectors and blend in
    float64 — same vectorized-gather shape as ``resize_nn``, two index
    maps and an outer-product blend instead of one."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    # source coordinate of each output pixel center
    ys = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    xs = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    if img.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    a = img[y0][:, x0].astype(np.float64)
    b = img[y0][:, x1].astype(np.float64)
    c = img[y1][:, x0].astype(np.float64)
    d = img[y1][:, x1].astype(np.float64)
    top = a + (b - a) * wx
    bot = c + (d - c) * wx
    out = top + (bot - top) * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def sample_frames(df: DataFrame, k: int = 3) -> DataFrame:
    """Frame-sample operator over (path, content) RAWV rows: emits
    (path, frame_idx, frame_mean) for k uniformly-spaced frames per
    container — mapInPandas, decoding ONLY the sampled frames."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, idxs, means = [], [], []
            for path, data in zip(pdf["path"], pdf["content"]):
                data = bytes(data)
                n = rawv_frame_count(data)
                for idx in frame_indices(n, k):
                    img = decode_rawv_frame(data, idx)
                    paths.append(path)
                    idxs.append(idx)
                    means.append(float(np.float32(img.mean() / 255.0)))
            yield pd.DataFrame(
                {"path": paths, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_mean": means}
            )

    return df.select("path", "content").mapInPandas(
        _sample, "path STRING, frame_idx INT, frame_mean DOUBLE"
    )


def audio_spectral_features(df, content_col: str = "content", n_bins: int = 4):
    """Decode WAV blobs and emit spectral features per clip: RMS,
    dominant-frequency bin index + its Hz, and energy in n_bins
    equal log-spaced bands — the audio analogue of the image feature
    extractor. NumPy rfft per clip inside mapInPandas (Arrow batches;
    clips are independent → embarrassingly parallel). Parseval's
    identity (time-domain energy == frequency-domain energy / N) is
    asserted per clip in tests — a decoded-sample-level correctness
    check no schema test can fake.
    """
    from collections.abc import Iterator

    import pandas as pd

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {
                "path": [], "rate": [], "n_samples": [], "rms": [],
                "dom_bin": [], "dom_hz": [], "band_energy": [],
                "parseval_ok": [],
            }
            for path, blob in zip(pdf["path"], pdf[content_col]):
                rate, x = decode_wav(bytes(blob))
                mono = np.asarray(x, dtype=np.float64).mean(axis=1)
                n = mono.size
                spec = np.fft.rfft(mono)
                power = np.abs(spec) ** 2
                # Parseval: sum x² == (|X0|² + 2·Σ|Xk|² [+ |X_nyq|²·(1 if even n duplicated term removed)]) / n
                inner = power.copy()
                inner[1:] *= 2.0
                if n % 2 == 0:
                    inner[-1] /= 2.0
                t_energy = float((mono ** 2).sum())
                f_energy = float(inner.sum()) / n
                dom = int(power[1:].argmax()) + 1 if power.size > 1 else 0
                edges = np.unique(
                    np.round(
                        np.logspace(0, np.log10(max(power.size - 1, 1)), n_bins + 1)
                    ).astype(int)
                )
                bands = [
                    float(power[lo : hi + 1].sum())
                    for lo, hi in zip(edges[:-1], edges[1:])
                ]
                out["path"].append(path)
                out["rate"].append(int(rate))
                out["n_samples"].append(int(n))
                out["rms"].append(float(np.sqrt((mono ** 2).mean())))
                out["dom_bin"].append(dom)
                out["dom_hz"].append(float(dom * rate / n))
                out["band_energy"].append(bands)
                out["parseval_ok"].append(
                    bool(abs(t_energy - f_energy) <= 1e-9 * max(t_energy, 1.0))
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(
        _feats,
        "path STRING, rate INT, n_samples INT, rms DOUBLE, dom_bin INT, "
        "dom_hz DOUBLE, band_energy ARRAY<DOUBLE>, parseval_ok BOOLEAN",
    )


def scene_cuts(df: DataFrame, threshold: float = 100.0) -> DataFrame:
    """Scene-cut detection over (path, content) RAWV rows: decode
    frames SEQUENTIALLY (two frames resident at a time, not the whole
    container) and emit (path, frame_idx, frame_diff, is_cut) for each
    adjacent pair, where frame_diff is the mean absolute pixel
    difference and is_cut marks diffs above the threshold — the
    shot-boundary primitive video-corpus pipelines key frame-sampling
    and per-shot dedup on. mapInPandas: containers are independent, so
    the pass is embarrassingly parallel and O(total frames)."""

    def _cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, idxs, diffs, cuts = [], [], [], []
            for path, data in zip(pdf["path"], pdf["content"]):
                data = bytes(data)
                n = rawv_frame_count(data)
                prev = decode_rawv_frame(data, 0).astype(np.int64)
                for idx in range(1, n):
                    cur = decode_rawv_frame(data, idx).astype(np.int64)
                    d = float(np.abs(cur - prev).mean())
                    paths.append(path)
                    idxs.append(idx)
                    diffs.append(d)
                    cuts.append(d > threshold)
                    prev = cur
            yield pd.DataFrame(
                {
                    "path": paths,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_diff": diffs,
                    "is_cut": pd.array(cuts, dtype="boolean"),
                }
            )

    return df.select("path", "content").mapInPandas(
        _cuts, "path STRING, frame_idx INT, frame_diff DOUBLE, is_cut BOOLEAN"
    )

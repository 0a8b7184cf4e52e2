"""Multimodal column plumbing (SURVEY.md §2 M4).

Images/audio/video are carried as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested, and the
decode step is CODEC-VERIFIED for the self-describing uncompressed
formats via pure-numpy decoders (no media libraries needed): PPM P6 +
24bpp BMP images (:func:`decode_image`), RIFF/WAVE PCM audio
(:func:`decode_wav`), YUV4MPEG2 video (:func:`decode_y4m`). Compressed
codecs (JPEG/PNG/H.264/mp3) stay import-gated on PIL/ffmpeg, which this
container doesn't ship; ``extract_features`` additionally keeps a
deterministic payload-byte fake so one mapInPandas path stays
SQL-oracle-checkable end to end.

At 100 TB: binary payloads dominate partition size → ``mapInPandas`` with
small ``spark.sql.files.maxPartitionBytes`` / explicit repartition before
decode, and metadata-only predicates pushed down *before* any payload is
decoded (payload column pruned until needed).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, n_bytes bigint"
)
FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, feat_mean double, feat_dim int"

# Real pure-numpy decoders for the self-describing uncompressed formats;
# compressed formats (JPEG/PNG, H.264, mp3...) stay behind an import-try
# on PIL/ffmpeg, which this container doesn't ship.
DECODERS_IMPLEMENTED = ("ppm", "bmp", "wav-pcm", "y4m")

# Adversarial-payload fence at the decode boundary: the decoders reject
# TRUNCATED containers, but a well-formed multi-GiB payload would still
# decode eagerly inside one Arrow batch and can OOM the executor. Decode
# entry points refuse payloads above this cap unless the caller raises it
# explicitly for known-large media (None disables). 64 MiB comfortably
# covers the fixture media while staying far below executor batch memory.
DEFAULT_MAX_PAYLOAD_BYTES = 64 * 1024 * 1024


def _check_payload_size(doc_id, payload, max_bytes: int | None) -> None:
    """Length check BEFORE any bytes() copy of the Arrow buffer — an
    oversized payload is rejected without ever being materialized twice."""
    if max_bytes is not None and len(payload) > max_bytes:
        raise ValueError(
            f"doc {doc_id}: payload is {len(payload)} bytes, above"
            f" max_payload_bytes={max_bytes}; pass a higher"
            f" max_payload_bytes (or None) for known-large media"
        )


def attach_fake_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Simulate a multimodal table: payload = utf-8 bytes of the text,
    metadata derived deterministically from it."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.length(F.col(text_col)) % 640 + 16).cast("int").alias("width"),
        (F.length(F.col(text_col)) % 480 + 16).cast("int").alias("height"),
        F.length(F.encode(F.col(text_col), "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def _ppm_token(data: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited PPM header token, skipping '#' comments."""
    while pos < len(data):
        c = data[pos : pos + 1]
        if c in b" \t\r\n":
            pos += 1
        elif c == b"#":
            while pos < len(data) and data[pos : pos + 1] != b"\n":
                pos += 1
        else:
            break
    start = pos
    while pos < len(data) and data[pos : pos + 1] not in b" \t\r\n":
        pos += 1
    return data[start:pos], pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (height, width, 3) uint8 RGB. Pure numpy — PPM is
    a whitespace-delimited header (magic, width, height, maxval, one
    whitespace byte) followed by raw interleaved RGB."""
    magic, pos = _ppm_token(payload, 0)
    if magic != b"P6":
        raise ValueError(f"not a P6 PPM (magic {magic!r})")
    w_b, pos = _ppm_token(payload, pos)
    h_b, pos = _ppm_token(payload, pos)
    maxval_b, pos = _ppm_token(payload, pos)
    w, h, maxval = int(w_b), int(h_b), int(maxval_b)
    if w <= 0 or h <= 0:
        # np.frombuffer treats a negative count as read-everything and
        # reshape(-1, …) happily infers a dimension — a corrupt header
        # would decode into a wrong-but-plausible image; must raise
        raise ValueError(f"invalid PPM dimensions {w}x{h}")
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    pos += 1  # exactly one whitespace byte after maxval
    need = w * h * 3
    arr = np.frombuffer(payload, np.uint8, need, pos)
    return arr.reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (height, width, 3) uint8 RGB. Pure numpy:
    14-byte file header + BITMAPINFOHEADER, BGR rows padded to 4 bytes,
    bottom-up unless height is negative."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24bpp BMP (got {bpp}bpp/c{compression})")
    if w <= 0 or h == 0:  # negative h is legal (top-down rows); w is not
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    hh = abs(h)
    row = (w * 3 + 3) // 4 * 4
    arr = np.frombuffer(payload, np.uint8, row * hh, data_offset).reshape(hh, row)
    arr = arr[:, : w * 3].reshape(hh, w, 3)
    if h > 0:
        arr = arr[::-1]  # bottom-up storage
    return arr[..., ::-1].copy()  # BGR → RGB


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: PPM(P6) and uncompressed BMP decode in pure
    numpy; anything else needs PIL, which is import-gated (absent in this
    container → NotImplementedError with the supported-format list)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:  # pragma: no cover - PIL not installed here
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            f"unsupported image format (magic {payload[:4]!r}); built-in "
            f"decoders: {DECODERS_IMPLEMENTED}; install PIL for JPEG/PNG"
        ) from None


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (samples as float64 in [-1, 1] shaped
    (n_frames, n_channels), sample_rate). Pure struct/numpy: walks the
    RIFF chunk list to 'fmt ' and 'data'; 8-bit (unsigned) and 16-bit
    (signed little-endian) PCM supported — the formats raw audio pipelines
    actually land; compressed codecs would need ffmpeg (absent here)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) < size:
            # a silently-shortened slice would decode a truncated payload
            # into wrong-but-plausible features; corrupt media must raise
            raise ValueError(
                f"truncated {cid!r} chunk: declared {size}, got {len(body)} bytes"
            )
        if cid == b"fmt ":
            if len(body) < 16:
                # struct.error would escape the documented ValueError/
                # NotImplementedError contract callers quarantine on
                raise ValueError(
                    f"fmt chunk too short: {len(body)} bytes (need 16)"
                )
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(f"only PCM wav (got format {audio_fmt})")
    if bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    return x.reshape(-1, n_ch), rate


def attach_wav_media(df: DataFrame, text_col: str, id_col: str, rate: int = 8000) -> DataFrame:
    """Deterministic REAL audio payloads: each row's text bytes become the
    8-bit PCM sample data of a spec-conformant mono WAV — built with
    Column expressions only (RIFF sizes are little-endian ints, composed
    from the byte length)."""
    txt = F.encode(F.col(text_col), "UTF-8")
    nb = F.length(txt)
    # header for mono 8-bit PCM at `rate`: fmt chunk is constant, RIFF and
    # data sizes depend on nb
    fmt_body = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    const_mid = b"WAVEfmt " + struct.pack("<I", len(fmt_body)) + fmt_body + b"data"
    nb_i = nb.cast("int")
    payload = F.concat(
        F.lit(b"RIFF"),
        _le32_col(nb_i + (4 + 8 + len(fmt_body) + 8)),
        F.lit(const_mid),
        _le32_col(nb_i),
        txt,
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("audio/wav").alias("media_type"),
        F.lit(rate).alias("sample_rate"),
        nb.cast("bigint").alias("n_samples"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


def _le32_col(n: Column) -> Column:
    """Column-expression little-endian uint32: format as 8 hex digits,
    reverse the byte pairs, unhex to 4 raw bytes (exact for any byte
    value — string/encode tricks only cover code points < 128)."""
    hex8 = F.lpad(F.conv(n.cast("string"), 10, 16), 8, "0")
    b = [F.substring(hex8, i, 2) for i in (1, 3, 5, 7)]
    return F.unhex(F.concat(b[3], b[2], b[1], b[0]))


AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, sample_rate int, n_frames bigint, duration_s double,"
    " rms double, peak double"
)


def extract_audio_features(
    media: DataFrame, max_payload_bytes: int | None = DEFAULT_MAX_PAYLOAD_BYTES
) -> DataFrame:
    """REAL WAV decode → waveform statistics (duration, RMS, peak),
    Arrow-batched — the audio analogue of extract_pixel_features.
    Payloads above ``max_payload_bytes`` are rejected before decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "sample_rate", "n_frames", "duration_s", "rms", "peak",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _check_payload_size(doc_id, payload, max_payload_bytes)
                x, rate = decode_wav(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_frames"].append(x.shape[0])
                rows["duration_s"].append(round(x.shape[0] / rate, 6))
                rows["rms"].append(round(float(np.sqrt((x**2).mean())), 6) if len(x) else 0.0)
                rows["peak"].append(round(float(np.abs(x).max()), 6) if len(x) else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(rows["sample_rate"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int64"),
                    "duration_s": pd.Series(rows["duration_s"], dtype="float64"),
                    "rms": pd.Series(rows["rms"], dtype="float64"),
                    "peak": pd.Series(rows["peak"], dtype="float64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURE_SCHEMA
    )


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int, int, tuple[int, int]]:
    """YUV4MPEG2 (uncompressed video) → (frames, width, height,
    (fps_num, fps_den)); ``frames`` is (n_frames, height, width) uint8 of
    the LUMA plane (Y) — the plane video-quality features run on. Pure
    numpy: plain-text stream header ``YUV4MPEG2 W.. H.. F..:.. [C..]\\n``,
    then per frame a ``FRAME[ params]\\n`` marker + raw planes. Supported
    chroma: C420* (w·h·3/2 bytes/frame, the default), C444 (w·h·3),
    Cmono (w·h); chroma planes are skipped, not parsed."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps = (25, 1)
    chroma = "420"
    for tok in payload[:nl].split(b" ")[1:]:
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(":")
            fps = (int(num), int(den))
        elif tag == b"C":
            chroma = val
    if not w or not h:
        raise ValueError("missing W/H in YUV4MPEG2 header")
    if chroma.startswith("420"):
        frame_bytes = w * h * 3 // 2
    elif chroma == "444":
        frame_bytes = w * h * 3
    elif chroma == "mono":
        frame_bytes = w * h
    else:
        raise NotImplementedError(f"chroma C{chroma} not supported")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at byte {pos}")
        fnl = payload.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header (no newline)")
        data_start = fnl + 1
        if data_start + frame_bytes > len(payload):
            raise ValueError("truncated frame data")
        frames.append(
            np.frombuffer(payload, np.uint8, w * h, data_start).reshape(h, w)
        )
        pos = data_start + frame_bytes
    return (
        np.stack(frames) if frames else np.empty((0, h, w), np.uint8),
        w,
        h,
        fps,
    )


def attach_y4m_media(
    df: DataFrame, text_col: str, id_col: str, width: int = 8, height: int = 4
) -> DataFrame:
    """Deterministic REAL video payloads: text bytes become the luma planes
    of consecutive C420 frames of a spec-conformant YUV4MPEG2 stream
    (chroma planes zeroed), assembled with Column expressions. Each frame
    consumes width·height luma bytes; the text is zero-padded to whole
    frames.

    Bound: the per-row F.aggregate concat re-copies the accumulated buffer
    each frame — O(frames²) bytes per row. Fine for the short fixture
    payloads this synthesizer targets; real video lands its container
    bytes directly (this function exists to feed the decoder test path,
    not to encode video at scale)."""
    txt = F.encode(F.col(text_col), "UTF-8")
    nb = F.length(txt)
    luma = width * height
    n_frames = F.greatest(F.ceil(nb / F.lit(luma)).cast("int"), F.lit(1))
    pad_len = n_frames * luma - nb
    padded = F.concat(txt, F.encode(F.repeat(F.lit("\x00"), pad_len), "UTF-8"))
    header = F.lit(f"YUV4MPEG2 W{width} H{height} F25:1 C420\n".encode())
    chroma = b"\x00" * (luma // 2)
    # per-frame: FRAME\n + luma slice + zero chroma — aggregate over a
    # frame-index sequence keeps this in expression land
    frame_seq = F.sequence(F.lit(0), n_frames - 1)
    payload = F.concat(
        header,
        F.aggregate(
            frame_seq,
            F.lit(b""),
            lambda acc, i: F.concat(
                acc,
                F.lit(b"FRAME\n"),
                F.substring(padded, i * luma + 1, luma),
                F.lit(chroma),
            ),
        ),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("video/x-yuv4mpeg").alias("media_type"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        n_frames.cast("int").alias("n_frames"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


VIDEO_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_frames int, fps double,"
    " luma_mean double, luma_motion double"
)


def extract_video_features(
    media: DataFrame, max_payload_bytes: int | None = DEFAULT_MAX_PAYLOAD_BYTES
) -> DataFrame:
    """REAL Y4M decode → per-clip statistics over decoded luma planes:
    mean luminance and mean absolute frame-to-frame delta (a motion
    proxy) — the video analogue of extract_pixel_features.
    Payloads above ``max_payload_bytes`` are rejected before decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_frames", "fps",
                "luma_mean", "luma_motion",
            )}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _check_payload_size(doc_id, payload, max_payload_bytes)
                frames, w, h, (fn, fd) = decode_y4m(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(len(frames))
                rows["fps"].append(round(fn / fd, 6))
                f = frames.astype(np.float64)
                rows["luma_mean"].append(round(float(f.mean()), 6) if len(f) else 0.0)
                rows["luma_motion"].append(
                    round(float(np.abs(np.diff(f, axis=0)).mean()), 6)
                    if len(f) > 1
                    else 0.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "n_frames": pd.Series(rows["n_frames"], dtype="int32"),
                    "fps": pd.Series(rows["fps"], dtype="float64"),
                    "luma_mean": pd.Series(rows["luma_mean"], dtype="float64"),
                    "luma_motion": pd.Series(rows["luma_motion"], dtype="float64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=VIDEO_FEATURE_SCHEMA
    )


def decode_stub(payload: bytes) -> bytes:
    """Kept for API compatibility; the real decoders are
    :func:`decode_image` (PPM/BMP built-in, PIL-gated otherwise),
    :func:`decode_wav` (PCM built-in) and :func:`decode_y4m` (uncompressed
    video built-in). Compressed video (H.264 etc.) would need ffmpeg,
    absent in this container."""
    raise NotImplementedError(
        "compressed-codec decode is not available in this environment; "
        "built-ins: decode_image (PPM/BMP), decode_wav (PCM), decode_y4m "
        "(YUV4MPEG2)"
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload.

    The fake 'feature' is the mean byte value of the payload — deterministic
    and SQL-mirrorable, so the full mapInPandas path is oracle-checkable.
    A real extractor swaps the loop body for decoded-pixel features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            means = [
                (sum(p) / len(p)) if len(p) else 0.0 for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["n_bytes"],
                    "feat_mean": [round(m, 6) for m in means],
                    "feat_dim": [1] * len(pdf),
                }
            )

    return media.select("doc_id", "payload", "n_bytes").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def attach_ppm_media(df: DataFrame, text_col: str, id_col: str, width: int = 8) -> DataFrame:
    """Deterministic REAL image payloads: each row's text bytes become the
    pixel data of a binary PPM (P6) — zero-padded to full rows — so the
    decode path is exercised on genuine, spec-conformant image bytes with
    ground truth derivable from the text. Built with Column expressions
    (concat of header + padded bytes); no Python in the attach step."""
    txt = F.encode(F.col(text_col), "UTF-8")
    nb = F.length(txt)  # BYTE length (length() on binary), not char length
    row_bytes = width * 3
    h = F.greatest(F.ceil(nb / F.lit(row_bytes)).cast("int"), F.lit(1))
    pad_len = h * row_bytes - nb
    padding = F.encode(F.repeat(F.lit("\x00"), pad_len), "UTF-8")
    header = F.encode(
        F.concat(F.lit(f"P6\n{width} "), h.cast("string"), F.lit("\n255\n")),
        "UTF-8",
    )
    payload = F.concat(header, txt, padding)
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("media_type"),
        F.lit(width).cast("int").alias("width"),
        h.alias("height"),
        F.length(payload).cast("bigint").alias("n_bytes"),
    )


PIXEL_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, mean_r double, mean_g double, mean_b double"
)


def extract_pixel_features(
    media: DataFrame, max_payload_bytes: int | None = DEFAULT_MAX_PAYLOAD_BYTES
) -> DataFrame:
    """REAL decode → per-channel pixel statistics, Arrow-batched. Unlike
    :func:`extract_features` (payload-byte fake for oracle-checkability),
    this path parses the image container (PPM/BMP via the pure-numpy
    decoders) and computes features over decoded pixels — the M4 decode
    step, codec-verified, not plumbing-verified.
    Payloads above ``max_payload_bytes`` are rejected before decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _check_payload_size(doc_id, payload, max_payload_bytes)
                img = decode_image(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["height"].append(img.shape[0])
                rows["width"].append(img.shape[1])
                m = img.reshape(-1, 3).mean(axis=0)
                rows["mean_r"].append(round(float(m[0]), 6))
                rows["mean_g"].append(round(float(m[1]), 6))
                rows["mean_b"].append(round(float(m[2]), 6))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "width": pd.Series(rows["width"], dtype="int32"),
                    "height": pd.Series(rows["height"], dtype="int32"),
                    "mean_r": pd.Series(rows["mean_r"], dtype="float64"),
                    "mean_g": pd.Series(rows["mean_g"], dtype="float64"),
                    "mean_b": pd.Series(rows["mean_b"], dtype="float64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=PIXEL_FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id bigint, width int, height int, n_bytes bigint"


def resize_media(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Arrow-batched resize over the binary payload.

    A real implementation decodes and rescales pixels; the deterministic
    fake scales the byte budget by the area ratio and truncates the payload
    (floor, min 1 byte), which keeps the full mapInPandas path — schema,
    batch shape, payload handling — oracle-checkable. Metadata-only
    predicates should be applied *before* this operator so payloads for
    filtered-out rows are never shipped to Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_len = [
                max(1, min(int(n), int(n) * target_w * target_h // (int(w) * int(h))))
                for n, w, h in zip(pdf["n_bytes"], pdf["width"], pdf["height"])
            ]
            # the truncation is the "work"; only metadata leaves the stage
            _ = [p[:k] for p, k in zip(pdf["payload"], out_len)]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                    "n_bytes": out_len,
                }
            )

    return media.select("doc_id", "payload", "width", "height", "n_bytes").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes int, frame_mean double"


def sample_frames(
    media: DataFrame, frame_size: int = 16, stride: int = 4
) -> DataFrame:
    """Video-style frame sampling: treat the payload as fixed-size frames
    and emit every ``stride``-th one (1:N explode through mapInPandas).
    The fake per-frame feature is the mean byte of the frame slice; a real
    sampler would decode keyframes. Output fans out ~n_frames/stride rows
    per input row, so at scale repartition *after* this operator, not
    before (input partitions are payload-heavy, output rows are tiny)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            means: list[float] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i in range(0, len(payload), frame_size * stride):
                    frame = payload[i : i + frame_size]
                    ids.append(doc_id)
                    idxs.append(i // frame_size)
                    sizes.append(len(frame))
                    means.append(round(sum(frame) / len(frame), 6))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(sizes, dtype="int32"),
                    "frame_mean": pd.Series(means, dtype="float64"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)

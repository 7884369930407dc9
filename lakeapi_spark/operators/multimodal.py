"""Multimodal (binary) column plumbing (greenfield extension).

Treat image/audio/video payloads as opaque ``binary`` columns with a
typed metadata struct alongside. The Spark-side plumbing — schema,
Arrow batch shape, partition sizing, UDF signatures — is real and
tested. Fixed-layout header decodes (PNG IHDR, RIFF/WAVE fmt, JPEG
marker walk) are pure JVM expressions; ``decode_real`` is a REAL
stdlib PNG pixel decode (chunk walk + CRC validation + zlib inflate +
all-five-filter unfiltering); only the heavy codec formats
(JPEG entropy decode, video) remain behind ``decode_stub_features``'s
deterministic fake-feature kernel, which keeps the pipeline shape
testable without PIL/ffmpeg.

Design rules encoded here for 100 TB:
- binaries travel in their own column so column pruning keeps metadata
  queries from ever reading the payload bytes;
- decode runs in mapInPandas (Arrow batches) — per-batch Python cost,
  bounded batch memory via maxRecordsPerBatch;
- feature outputs are fixed-width array<float> ready for the
  similarity operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "id long, payload binary, media_type string, width int, height int, n_bytes long"
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Build a typed media table from any table (test/demo path): payload
    is the utf-8 bytes of the text column standing in for an image blob."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.octet_length(payload) % 64 + 1).cast("int").alias("width"),
        (F.octet_length(payload) % 48 + 1).cast("int").alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection: never touches the payload column — the
    parquet reader prunes it (ReadSchema excludes `payload`)."""
    return df.select("id", "media_type", "width", "height", "n_bytes")


FEATURE_DIM = 8


def decode_stub_features(df: DataFrame) -> DataFrame:
    """STUB decode: deterministic fake features from the raw bytes
    (byte-bucket histogram, L1-normalized). Replace the kernel body with
    a real codec (PIL/torchvision/ffmpeg) when available — the Spark
    plumbing (Arrow batches, schema, partitioning) is unchanged."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.float64)
                total = hist.sum()
                # exact IEEE division, NO decimal rounding: count/total is
                # bit-identical in any engine, while round-to-6 lands on
                # exact .5 ulp boundaries for power-of-two byte totals
                # (128-byte doc: c*1e6/128) where numpy's half-even and
                # SQL ROUND half-away diverge — cross-engine-verifiable
                # by construction instead of by luck
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"id": pdf["id"], "features": feats})

    return df.select("id", "payload").mapInPandas(
        kernel, schema="id long, features array<double>"
    )


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image-resize plumbing: payload bytes are interpreted as a
    (height, width) uint8 raster (zero-padded/truncated), nearest-
    neighbor resampled to (target_h, target_w), re-emitted as bytes
    with updated metadata. The numpy kernel body is where PIL/OpenCV
    slots in; batch shape, output schema and metadata update are the
    production plumbing. Vectorized per Arrow batch, payload column
    only (metadata-only readers never touch bytes)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                img = np.zeros(h * w, dtype=np.uint8)
                img[: min(len(raw), h * w)] = raw[: h * w]
                img = img.reshape(h, w)
                ys = (np.arange(target_h) * h) // target_h
                xs = (np.arange(target_w) * w) // target_w
                out.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": out,
                    "media_type": pdf["media_type"],
                    "width": np.full(len(pdf), target_w, dtype=np.int32),
                    "height": np.full(len(pdf), target_h, dtype=np.int32),
                    "n_bytes": np.full(len(pdf), target_w * target_h, dtype=np.int64),
                }
            )

    return df.select(
        "id", "payload", "media_type", "width", "height", "n_bytes"
    ).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def frame_sample_stub(df: DataFrame, frame_bytes: int, every_n: int) -> DataFrame:
    """Video frame-sampling plumbing: payload is treated as a sequence
    of fixed-size frames; every ``every_n``-th frame becomes its OWN
    OUTPUT ROW (id, frame_idx, frame) — the row-expanding shape a real
    ffmpeg sampler needs. Expansion happens inside mapInPandas, so a
    10-minute video never materializes as one driver row, and
    downstream ops see a plain (id, frame_idx)-keyed table."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(1, (len(raw) + frame_bytes - 1) // frame_bytes)
                for i in range(0, n_frames, every_n):
                    chunk = raw[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(chunk.ljust(frame_bytes, b"\0"))
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("id", "payload").mapInPandas(
        kernel, schema="id long, frame_idx int, frame binary"
    )


#: PNG file signature, hex
PNG_SIG_HEX = "89504E470D0A1A0A"
#: signature + IHDR chunk length (13) + "IHDR" type tag, hex
_PNG_HEADER_HEX = PNG_SIG_HEX + "0000000D49484452"


def attach_png_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Typed media table whose payload is a REAL PNG header (signature +
    IHDR with big-endian width/height) followed by the text bytes as
    stand-in pixel data — enough structure for a header decoder to
    parse, built entirely from JVM expressions (unhex/concat)."""
    w = (F.length(F.col(text_col)) % 64 + 1).cast("long")
    h = (F.length(F.col(text_col)) % 48 + 1).cast("long")
    header = F.unhex(
        F.concat(
            F.lit(_PNG_HEADER_HEX),
            F.lpad(F.hex(w), 8, "0"),
            F.lpad(F.hex(h), 8, "0"),
            F.lit("0806000000"),  # bit depth 8, RGBA, default methods
        )
    )
    payload = F.concat(header, F.encode(F.col(text_col), "utf-8"))
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.lit("image/png").alias("media_type"),
        w.cast("int").alias("width"),
        h.cast("int").alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def png_dimensions(df: DataFrame) -> DataFrame:
    """REAL binary decode, zero Python: parse width/height out of the
    PNG IHDR (bytes 17-24, big-endian u32s) with substring/hex/conv
    built-ins, validating the 8-byte signature first. This is the
    pattern for any fixed-layout header (WAV sample rate, BMP dims,
    RIFF chunks): whole-stage codegen over the binary column, no codec
    library, no UDF — executors never ship bytes to Python just to
    read a header."""
    sig_ok = F.hex(F.substring("payload", 1, 8)) == F.lit(PNG_SIG_HEX)
    width = F.conv(F.hex(F.substring("payload", 17, 4)), 16, 10).cast("long")
    height = F.conv(F.hex(F.substring("payload", 21, 4)), 16, 10).cast("long")
    return df.select(
        "id",
        sig_ok.alias("valid_png"),
        F.when(sig_ok, width).alias("width"),
        F.when(sig_ok, height).alias("height"),
    )


def _le_hex(col, pos: int, nbytes: int):
    """Hex string of an ``nbytes`` little-endian field at 1-based byte
    ``pos`` — the byte order reversed pair-wise so conv() can read it."""
    return F.concat(
        *[F.hex(F.substring(col, pos + i, 1)) for i in range(nbytes - 1, -1, -1)]
    )


def attach_wav_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Typed media table with a REAL RIFF/WAVE header (fmt chunk with
    little-endian channel count + sample rate) followed by the text
    bytes as stand-in samples — all JVM expressions."""
    n = F.length(F.col(text_col))
    channels = (n % 2 + 1).cast("long")  # 1 or 2
    rate = (F.lit(8000) + (n % 5) * 8000).cast("long")  # 8k..40k

    def le(v, nbytes):
        h = F.lpad(F.hex(v), nbytes * 2, "0")
        return F.concat(
            *[F.substring(h, 2 * i + 1, 2) for i in range(nbytes - 1, -1, -1)]
        )

    header = F.unhex(
        F.concat(
            F.lit("52494646"),  # "RIFF"
            le(n + 36, 4),  # chunk size, LE
            F.lit("57415645666D742010000000"),  # "WAVE" + "fmt " + len 16 LE
            F.lit("0100"),  # PCM, LE u16
            le(channels, 2),
            le(rate, 4),
            le(rate * channels * 2, 4),  # byte rate
            le(channels * 2, 2),  # block align
            F.lit("1000"),  # 16 bits/sample, LE u16
            F.lit("64617461"),  # "data"
            le(n, 4),
        )
    )
    payload = F.concat(header, F.encode(F.col(text_col), "utf-8"))
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.lit("audio/wav").alias("media_type"),
        channels.cast("int").alias("width"),  # channel count in the width slot
        F.lit(1).alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def wav_format(df: DataFrame) -> DataFrame:
    """REAL little-endian header decode, zero Python: channel count and
    sample rate out of the RIFF fmt chunk (bytes 23-24 and 25-28, LE)
    via per-byte substring + hex reorder + conv — the LE twin of
    :func:`png_dimensions`' big-endian parse."""
    sig_ok = (F.hex(F.substring("payload", 1, 4)) == F.lit("52494646")) & (
        F.hex(F.substring("payload", 9, 4)) == F.lit("57415645")
    )
    channels = F.conv(_le_hex("payload", 23, 2), 16, 10).cast("long")
    rate = F.conv(_le_hex("payload", 25, 4), 16, 10).cast("long")
    return df.select(
        "id",
        sig_ok.alias("valid_wav"),
        F.when(sig_ok, channels).alias("n_channels"),
        F.when(sig_ok, rate).alias("sample_rate"),
    )


_SOF_MARKERS = ("FFC0", "FFC1", "FFC2", "FFC3")  # baseline..progressive


def attach_jpeg_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Typed media table whose payload is a REAL JPEG prelude: SOI,
    a JFIF APP0 segment, a VARIABLE-LENGTH COM segment (first
    ``length(text) % 17`` text bytes as the comment — so a decoder must
    actually walk the segment chain, not read a fixed offset), then an
    SOF0 frame header carrying big-endian height/width, SOS, and the
    text bytes as stand-in entropy data. Built entirely from
    unhex/concat JVM expressions."""
    n = F.length(F.col(text_col))
    w = (n % 200 + 1).cast("long")
    h = (n % 120 + 1).cast("long")
    clen = (n % 17).cast("long")
    be2 = lambda v: F.lpad(F.hex(v), 4, "0")  # noqa: E731
    app0 = F.lit("FFE0" + "0010" + "4A46494600" + "0101" + "00" + "0048" + "0048" + "0000")
    com = F.concat(
        F.unhex(F.concat(F.lit("FFFE"), be2(clen + 2))),
        F.encode(F.substring(F.col(text_col), 1, 16), "utf-8").substr(
            F.lit(1), clen.cast("int")
        ),
    )
    sof0 = F.concat(
        F.lit("FFC0").cast("string"),
        F.lit("0011"),  # 17-byte segment: len+precision+dims+3 component specs
        F.lit("08"),
        be2(h),
        be2(w),
        F.lit("03" + "012200" + "021101" + "031101"),
    )
    sos = F.lit("FFDA" + "000C" + "03" + "013F00" + "023F00" + "033F00")
    payload = F.concat(
        F.unhex(F.concat(F.lit("FFD8"), app0)),
        com,
        F.unhex(F.concat(sof0, sos)),
        F.encode(F.col(text_col), "utf-8"),
    )
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.lit("image/jpeg").alias("media_type"),
        w.cast("int").alias("width"),
        h.cast("int").alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def jpeg_dimensions(df: DataFrame, max_segments: int = 8) -> DataFrame:
    """REAL variable-layout decode, zero Python: walk the JPEG marker
    chain (each segment = 2-byte marker + 2-byte big-endian length)
    until an SOF0-SOF3 frame header and read its height/width. Unlike
    the fixed-offset PNG/WAV parses, the hop target depends on each
    segment's declared length, so the scan is an ``F.aggregate`` fold
    over a bounded hop budget (``max_segments`` — typical files carry
    a handful of APPn/COM segments before SOF; raise for exif-heavy
    corpora) with an early-exit accumulator. Still a single
    whole-stage-codegen expression per row: no UDF, no codec library,
    bytes never leave the JVM."""
    p = F.col("payload")
    sig_ok = F.hex(p.substr(F.lit(1), F.lit(2))) == F.lit("FFD8")

    out_t = "struct<pos:bigint,done:boolean,found:boolean,h:bigint,w:bigint>"

    def mk(pos, done, found, h, w):
        return F.struct(
            pos.cast("long").alias("pos"),
            done.alias("done"),
            found.alias("found"),
            h.cast("long").alias("h"),
            w.cast("long").alias("w"),
        )

    null_l = F.lit(None).cast("long")

    def step(acc, _):
        pos = acc.getField("pos")
        marker = F.hex(p.substr(pos.cast("int"), F.lit(2)))
        seglen = F.conv(F.hex(p.substr((pos + 2).cast("int"), F.lit(2))), 16, 10).cast(
            "long"
        )
        h = F.conv(F.hex(p.substr((pos + 5).cast("int"), F.lit(2))), 16, 10)
        w = F.conv(F.hex(p.substr((pos + 7).cast("int"), F.lit(2))), 16, 10)
        is_sof = marker.isin(*_SOF_MARKERS)
        # SOS starts entropy data (no more headers), EOI ends the file,
        # a non-FF byte means we lost sync: all terminal without dims
        dead_end = (
            (~marker.startswith("FF"))
            | marker.isin("FFDA", "FFD9")
            | (pos + 8 > F.octet_length(p))
        )
        return (
            F.when(acc.getField("done"), acc)
            .when(is_sof, mk(pos, F.lit(True), F.lit(True), h, w))
            .when(dead_end, mk(pos, F.lit(True), F.lit(False), null_l, null_l))
            .otherwise(
                mk(pos + 2 + seglen, F.lit(False), F.lit(False), null_l, null_l)
            )
        )

    init = mk(F.lit(3), F.lit(False), F.lit(False), null_l, null_l).cast(out_t)
    res = F.aggregate(
        F.sequence(F.lit(1), F.lit(int(max_segments))), init, step
    )
    valid = sig_ok & res.getField("found")
    return df.select(
        "id",
        valid.alias("valid_jpeg"),
        F.when(valid, res.getField("w")).alias("width"),
        F.when(valid, res.getField("h")).alias("height"),
    )


def attach_real_png_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Typed media table whose payload is a COMPLETE, VALID PNG built
    with the stdlib only: signature, IHDR, zlib-deflated filtered
    scanlines split across two IDAT chunks (so readers must reassemble),
    correct CRC32 trailers, IEND. Pixels are a deterministic function of
    the text column that a SQL oracle re-derives without any codec:
    flat pixel byte i = code_point(text[i mod n]) mod 256 over a
    (h x w x c) raster with w = n%16+1, h = n%12+1, c = 1 (grayscale,
    color type 0) for even ids and 3 (RGB, color type 2) for odd ids.
    Scanline s is filter-encoded with type (id + s) mod 5, so a decoder
    must implement ALL FIVE filters (None/Sub/Up/Average/Paeth) to get
    the raster back. Rows with empty text are dropped (no raster to
    build). Runs in mapInPandas — per-batch Python, the fixture twin of
    :func:`decode_real`."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import pandas as pd

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        # local twin of module-level _paeth: the closure must be
        # self-contained — executors do not have lakeapi_spark on
        # sys.path (driver-side injection only)
        def paeth(a: int, b: int, c: int) -> int:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            return b if pb <= pc else c

        for pdf in batches:
            ids, payloads, widths, heights, nbytes = [], [], [], [], []
            for rid, text in zip(pdf["_id"], pdf["_text"]):
                n = len(text)
                if n == 0:
                    continue
                rid = int(rid)
                w, h = n % 16 + 1, n % 12 + 1
                c = 1 if rid % 2 == 0 else 3
                stride = w * c
                raster = bytes(
                    ord(text[i % n]) % 256 for i in range(h * stride)
                )
                filtered = bytearray()
                prev = bytes(stride)
                for s in range(h):
                    cur = raster[s * stride : (s + 1) * stride]
                    f = (rid + s) % 5
                    filtered.append(f)
                    for j in range(stride):
                        left = cur[j - c] if j >= c else 0
                        up = prev[j]
                        upleft = prev[j - c] if j >= c else 0
                        if f == 0:
                            pred = 0
                        elif f == 1:
                            pred = left
                        elif f == 2:
                            pred = up
                        elif f == 3:
                            pred = (left + up) >> 1
                        else:
                            pred = paeth(left, up, upleft)
                        filtered.append((cur[j] - pred) & 0xFF)
                    prev = cur
                comp = zlib.compress(bytes(filtered))
                ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if c == 1 else 2, 0, 0, 0)
                png = (
                    b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", ihdr)
                    + chunk(b"IDAT", comp[:32])
                    + chunk(b"IDAT", comp[32:])
                    + chunk(b"IEND", b"")
                )
                ids.append(rid)
                payloads.append(png)
                widths.append(w)
                heights.append(h)
                nbytes.append(len(png))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "media_type": pd.Series(["image/png"] * len(ids), dtype="object"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                }
            )

    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def png_resize(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL image resize, stdlib only: decode each PNG payload (same
    chunk/CRC/inflate/unfilter path as :func:`decode_real`),
    nearest-neighbor resample the raster to (target_h, target_w) per
    channel — dst(y, x) = src((y*h)//th, (x*w)//tw), the exact rule a
    SQL oracle re-derives — and RE-ENCODE a complete valid PNG (filters
    cycling per scanline, CRC trailers), emitting the media schema with
    updated metadata. Rows whose payload fails to decode are dropped
    (the validity verdict lives in decode_real; resize is a transform).
    mapInPandas, self-contained closure, per-row cost linear in raster
    size — swap PIL into the kernel body for throughput, every contract
    stays put."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def paeth(a: int, b: int, c: int) -> int:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            return b if pb <= pc else c

        def chunk(typ: bytes, data: bytes) -> bytes:
            return (
                struct.pack(">I", len(data))
                + typ
                + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        def decode_raster(raw: bytes):
            if raw[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("bad signature")
            pos, ihdr, idat = 8, None, b""
            while pos + 12 <= len(raw):
                (ln,) = struct.unpack(">I", raw[pos : pos + 4])
                typ = raw[pos + 4 : pos + 8]
                data = raw[pos + 8 : pos + 8 + ln]
                if len(data) != ln or pos + 12 + ln > len(raw):
                    raise ValueError("truncated chunk")
                (crc,) = struct.unpack(">I", raw[pos + 8 + ln : pos + 12 + ln])
                if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                    raise ValueError("crc mismatch")
                if typ == b"IHDR":
                    ihdr = data
                elif typ == b"IDAT":
                    idat += data
                elif typ == b"IEND":
                    break
                pos += 12 + ln
            if ihdr is None or len(ihdr) < 13:
                raise ValueError("missing IHDR")
            w, h, depth, color = struct.unpack(">IIBB", ihdr[:10])
            if depth != 8 or color not in (0, 2, 6):
                raise ValueError("unsupported format")
            c = {0: 1, 2: 3, 6: 4}[color]
            stream = zlib.decompress(idat)
            stride = w * c
            if len(stream) != h * (stride + 1):
                raise ValueError("bad stream length")
            prev = bytes(stride)
            raster = bytearray()
            for s in range(h):
                line = stream[s * (stride + 1) : (s + 1) * (stride + 1)]
                f = line[0]
                cur = bytearray(line[1:])
                if f == 1:
                    for j in range(stride):
                        cur[j] = (cur[j] + (cur[j - c] if j >= c else 0)) & 0xFF
                elif f == 2:
                    for j in range(stride):
                        cur[j] = (cur[j] + prev[j]) & 0xFF
                elif f == 3:
                    for j in range(stride):
                        left = cur[j - c] if j >= c else 0
                        cur[j] = (cur[j] + ((left + prev[j]) >> 1)) & 0xFF
                elif f == 4:
                    for j in range(stride):
                        a = cur[j - c] if j >= c else 0
                        ul = prev[j - c] if j >= c else 0
                        cur[j] = (cur[j] + paeth(a, prev[j], ul)) & 0xFF
                elif f != 0:
                    raise ValueError("unknown filter")
                raster += cur
                prev = bytes(cur)
            return int(w), int(h), c, color, bytes(raster)

        def encode_png(raster: np.ndarray, color: int) -> bytes:
            th, tw, c = raster.shape
            stride = tw * c
            flat = raster.reshape(th, stride)
            filtered = bytearray()
            prev = np.zeros(stride, dtype=np.int16)
            for s in range(th):
                cur = flat[s].astype(np.int16)
                f = s % 5
                filtered.append(f)
                if f == 0:
                    out = cur
                elif f == 2:
                    out = (cur - prev) & 0xFF
                else:
                    left = np.zeros(stride, dtype=np.int16)
                    left[c:] = cur[:-c]
                    upleft = np.zeros(stride, dtype=np.int16)
                    upleft[c:] = prev[:-c]
                    if f == 1:
                        out = (cur - left) & 0xFF
                    elif f == 3:
                        out = (cur - ((left + prev) >> 1)) & 0xFF
                    else:  # Paeth — per-byte (predictor branches per value)
                        out = np.array(
                            [
                                (int(cur[j]) - paeth(int(left[j]), int(prev[j]), int(upleft[j]))) & 0xFF
                                for j in range(stride)
                            ],
                            dtype=np.int16,
                        )
                filtered += bytes(out.astype(np.uint8))
                prev = cur
            comp = zlib.compress(bytes(filtered))
            ihdr = struct.pack(">IIBBBBB", tw, th, 8, color, 0, 0, 0)
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", comp[:32])
                + chunk(b"IDAT", comp[32:])
                + chunk(b"IEND", b"")
            )

        for pdf in batches:
            ids, payloads, mts, ws, hs, nb = [], [], [], [], [], []
            for rid, payload, mt in zip(
                pdf["id"], pdf["payload"], pdf["media_type"]
            ):
                try:
                    w, h, c, color, raster = decode_raster(bytes(payload))
                except Exception:  # noqa: BLE001 - undecodable rows drop
                    continue
                arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, c)
                ys = (np.arange(target_h) * h) // target_h
                xs = (np.arange(target_w) * w) // target_w
                resized = arr[np.ix_(ys, xs)]
                png = encode_png(resized, color)
                ids.append(int(rid))
                payloads.append(png)
                mts.append(mt)
                ws.append(target_w)
                hs.append(target_h)
                nb.append(len(png))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "media_type": pd.Series(mts, dtype="object"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                }
            )

    return df.select(
        "id", "payload", "media_type", "width", "height", "n_bytes"
    ).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def decode_real(df: DataFrame) -> DataFrame:
    """REAL PNG pixel decode, stdlib only — the formerly-gated
    integration point, now implemented: walk the chunk chain validating
    every CRC32, reassemble multi-chunk IDAT, zlib-inflate, and
    un-filter each scanline (all five PNG filter types incl. the Paeth
    predictor) into the raw raster. Supports 8-bit gray/RGB/RGBA
    (color types 0/2/6); anything else — bad signature, CRC mismatch,
    truncation, unknown filter, wrong stream length — yields a
    ``valid=false`` row instead of poisoning the batch.

    Output is the raster reduced to SQL-re-derivable integer stats
    (n_px, pixel_sum, and the order-pinning weighted checksum
    Σ (i+1)·pixel_i), so an oracle that knows the fixture's pixel rule
    can hash-verify the decode END TO END without any codec: the bytes
    went through deflate + filters and came back bit-exact.

    Scale shape: mapInPandas (Arrow batches, payload column pruned away
    for metadata readers); per-row cost is linear in raster size. The
    per-byte filter loop is honest Python — swap PIL/libpng into the
    kernel body for throughput; every schema/partition/validity
    contract stays put."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import pandas as pd

        def paeth(a: int, b: int, c: int) -> int:
            # PNG Paeth predictor (RFC 2083 §6.6): the neighbor closest
            # to a + b - c, ties broken left, up, upper-left
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            return b if pb <= pc else c

        def decode_one(raw: bytes):
            if raw[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("bad signature")
            pos, ihdr, idat = 8, None, b""
            while pos + 12 <= len(raw):
                (ln,) = struct.unpack(">I", raw[pos : pos + 4])
                typ = raw[pos + 4 : pos + 8]
                data = raw[pos + 8 : pos + 8 + ln]
                if len(data) != ln or pos + 12 + ln > len(raw):
                    raise ValueError("truncated chunk")
                (crc,) = struct.unpack(">I", raw[pos + 8 + ln : pos + 12 + ln])
                if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                    raise ValueError("crc mismatch")
                if typ == b"IHDR":
                    ihdr = data
                elif typ == b"IDAT":
                    idat += data
                elif typ == b"IEND":
                    break
                pos += 12 + ln
            if ihdr is None or len(ihdr) < 13:
                raise ValueError("missing IHDR")
            w, h, depth, color = struct.unpack(">IIBB", ihdr[:10])
            if depth != 8 or color not in (0, 2, 6):
                raise ValueError("unsupported format")
            c = {0: 1, 2: 3, 6: 4}[color]
            stream = zlib.decompress(idat)
            stride = w * c
            if len(stream) != h * (stride + 1):
                raise ValueError("bad stream length")
            prev = bytes(stride)
            px_sum = 0
            checksum = 0
            base = 0  # flat index offset of the current scanline
            for s in range(h):
                line = stream[s * (stride + 1) : (s + 1) * (stride + 1)]
                f = line[0]
                cur = bytearray(line[1:])
                if f == 1:
                    for j in range(stride):
                        cur[j] = (cur[j] + (cur[j - c] if j >= c else 0)) & 0xFF
                elif f == 2:
                    for j in range(stride):
                        cur[j] = (cur[j] + prev[j]) & 0xFF
                elif f == 3:
                    for j in range(stride):
                        left = cur[j - c] if j >= c else 0
                        cur[j] = (cur[j] + ((left + prev[j]) >> 1)) & 0xFF
                elif f == 4:
                    for j in range(stride):
                        a = cur[j - c] if j >= c else 0
                        ul = prev[j - c] if j >= c else 0
                        cur[j] = (cur[j] + paeth(a, prev[j], ul)) & 0xFF
                elif f != 0:
                    raise ValueError("unknown filter")
                for j, v in enumerate(cur):
                    px_sum += v
                    checksum += (base + j + 1) * v
                base += stride
                prev = bytes(cur)
            return int(w), int(h), c, h * stride, px_sum, checksum

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, c, n_px, px_sum, checksum = decode_one(bytes(payload))
                    rows.append((int(rid), True, w, h, c, n_px, px_sum, checksum))
                except Exception:  # noqa: BLE001 - any malformation -> invalid row
                    rows.append(
                        (int(rid), False, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "valid", "width", "height",
                    "n_channels", "n_px", "pixel_sum", "pixel_checksum",
                ],
            )

    return df.select("id", "payload").mapInPandas(
        kernel,
        schema=(
            "id long, valid boolean, width long, height long, "
            "n_channels long, n_px long, pixel_sum long, pixel_checksum long"
        ),
    )


def attach_pcm_wav_payload(df: DataFrame, id_col: str) -> DataFrame:
    """Typed media table whose payloads are COMPLETE, VALID PCM WAV
    files (RIFF + fmt + data, mono s16le @ 16 kHz) with deterministic
    synthetic samples s_i = ((id*31 + i*17) mod 2001) - 1000 over
    n = 64 + id mod 64 frames — a waveform an oracle can re-derive in
    pure SQL, so the real byte-level decode in
    :func:`wav_decode_samples` is verifiable end-to-end. All JVM
    expressions (hex assembly + unhex), no Python in the build."""
    rid = F.col(id_col).cast("long")
    n = (F.lit(64) + rid % 64).cast("long")

    def le(v, nbytes):
        h = F.lpad(F.hex(v), nbytes * 2, "0")
        return F.concat(
            *[F.substring(h, 2 * i + 1, 2) for i in range(nbytes - 1, -1, -1)]
        )

    header = F.concat(
        F.lit("52494646"),  # "RIFF"
        le(n * 2 + 36, 4),
        F.lit("57415645666D742010000000"),  # "WAVE" + "fmt " + 16 LE
        F.lit("0100"),  # PCM
        F.lit("0100"),  # 1 channel
        le(F.lit(16000).cast("long"), 4),
        le(F.lit(32000).cast("long"), 4),  # byte rate
        F.lit("0200"),  # block align
        F.lit("1000"),  # 16 bits/sample
        F.lit("64617461"),  # "data"
        le(n * 2, 4),
    )

    def sample_le16(i):
        v = (rid * 31 + i * 17) % 2001 - 1000
        vv = (v + 65536) % 65536  # 16-bit two's complement
        h = F.lpad(F.hex(vv), 4, "0")
        return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))

    data = F.array_join(
        F.transform(F.sequence(F.lit(0), n - 1), sample_le16), ""
    )
    payload = F.unhex(F.concat(header, data))
    return df.select(
        rid.alias("id"),
        payload.alias("payload"),
        F.lit("audio/wav").alias("media_type"),
        F.lit(1).alias("width"),
        F.lit(1).alias("height"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def wav_decode_samples(df: DataFrame) -> DataFrame:
    """REAL WAV sample decode, stdlib only: walk the RIFF chunk chain
    (not a fixed offset — fmt may be followed by LIST/fact chunks in
    the wild), reject non-PCM/non-16-bit forms, then decode the data
    chunk as little-endian int16 frames. Output is reduced to
    SQL-re-derivable integers (frame count, energy Σ s², peak |s|) so
    an oracle that knows the fixture waveform verifies the byte path
    end-to-end; rms stays OUT of the kernel so the caller computes it
    with engine ROUND semantics. Malformed payloads yield
    ``valid=false`` rows. Scale shape: mapInPandas over Arrow batches,
    per-row cost linear in the audio length."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        def decode_one(raw: bytes):
            if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
                raise ValueError("bad signature")
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(raw):
                typ = raw[pos : pos + 4]
                (ln,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
                body = raw[pos + 8 : pos + 8 + ln]
                if len(body) != ln:
                    raise ValueError("truncated chunk")
                if typ == b"fmt ":
                    fmt = body
                elif typ == b"data":
                    data = body
                pos += 8 + ln + (ln & 1)  # chunks are word-aligned
            if fmt is None or data is None:
                raise ValueError("missing fmt/data")
            audio_fmt, channels = struct.unpack("<HH", fmt[:4])
            bits = struct.unpack("<H", fmt[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError("not 16-bit PCM")
            if len(data) % (2 * channels):
                raise ValueError("ragged frame")
            vals = struct.unpack(f"<{len(data) // 2}h", data)
            n = len(vals)
            sum_sq = sum(v * v for v in vals)
            peak = max((abs(v) for v in vals), default=0)
            return n // channels, int(channels), sum_sq, peak

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    nf, ch, ss, pk = decode_one(bytes(payload))
                    rows.append((int(rid), True, nf, ch, ss, pk))
                except Exception:  # noqa: BLE001 - malformed -> invalid row
                    rows.append((int(rid), False, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=["id", "valid", "n_frames", "n_channels", "sum_sq", "peak"],
            )

    return df.select("id", "payload").mapInPandas(
        kernel,
        schema=(
            "id long, valid boolean, n_frames long, n_channels long, "
            "sum_sq long, peak long"
        ),
    )


def perceptual_dhash(df: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded PNG
    pixels — the image near-dup fingerprint: decode the raster
    (same stdlib chunk/CRC/inflate/unfilter path as
    :func:`decode_real`), reduce to integer luma
    ((299R + 587G + 114B) div 1000; grayscale passes through),
    nearest-neighbor sample a 9x8 grid (x_i = i*w div 9,
    y_j = j*h div 8 — the same integer index rule as
    :func:`resize_images`), and set bit j*8+i iff
    gray[y_j][x_i] > gray[y_j][x_{i+1}]. Identical images hash
    equal regardless of stored size; small pixel perturbations flip
    few bits, so hamming-band grouping (dedup.simhash machinery)
    applies downstream unchanged.

    The 64 bits come back as two BIGINT halves (hash_hi = bits
    32..63, hash_lo = bits 0..31) — both < 2^32, so a SQL oracle that
    knows the fixture pixel rule re-derives them without any codec
    and without signed-overflow edge cases. Undecodable payloads
    yield valid=false rows. mapInPandas Arrow batches; per-row cost
    linear in raster size."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        import numpy as np
        import pandas as pd

        def paeth(a: int, b: int, c: int) -> int:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            return b if pb <= pc else c

        def decode_raster(raw: bytes):
            if raw[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("bad signature")
            pos, ihdr, idat = 8, None, b""
            while pos + 12 <= len(raw):
                (ln,) = struct.unpack(">I", raw[pos : pos + 4])
                typ = raw[pos + 4 : pos + 8]
                data = raw[pos + 8 : pos + 8 + ln]
                if len(data) != ln or pos + 12 + ln > len(raw):
                    raise ValueError("truncated chunk")
                (crc,) = struct.unpack(">I", raw[pos + 8 + ln : pos + 12 + ln])
                if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                    raise ValueError("crc mismatch")
                if typ == b"IHDR":
                    ihdr = data
                elif typ == b"IDAT":
                    idat += data
                elif typ == b"IEND":
                    break
                pos += 12 + ln
            if ihdr is None or len(ihdr) < 13:
                raise ValueError("missing IHDR")
            w, h, depth, color = struct.unpack(">IIBB", ihdr[:10])
            if depth != 8 or color not in (0, 2, 6):
                raise ValueError("unsupported format")
            c = {0: 1, 2: 3, 6: 4}[color]
            stream = zlib.decompress(idat)
            stride = w * c
            if len(stream) != h * (stride + 1):
                raise ValueError("bad stream length")
            prev = bytes(stride)
            raster = bytearray()
            for s in range(h):
                line = stream[s * (stride + 1) : (s + 1) * (stride + 1)]
                f = line[0]
                cur = bytearray(line[1:])
                if f == 1:
                    for j in range(stride):
                        cur[j] = (cur[j] + (cur[j - c] if j >= c else 0)) & 0xFF
                elif f == 2:
                    for j in range(stride):
                        cur[j] = (cur[j] + prev[j]) & 0xFF
                elif f == 3:
                    for j in range(stride):
                        left = cur[j - c] if j >= c else 0
                        cur[j] = (cur[j] + (left + prev[j]) // 2) & 0xFF
                elif f == 4:
                    for j in range(stride):
                        left = cur[j - c] if j >= c else 0
                        ul = prev[j - c] if j >= c else 0
                        cur[j] = (cur[j] + paeth(left, prev[j], ul)) & 0xFF
                elif f != 0:
                    raise ValueError("unknown filter")
                raster += cur
                prev = bytes(cur)
            return w, h, c, bytes(raster)

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, c, raster = decode_raster(bytes(payload))
                except Exception:  # noqa: BLE001 - malformed -> invalid row
                    rows.append((int(rid), False, None, None))
                    continue
                arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, c)
                a32 = arr.astype(np.int64)
                if c == 1:
                    gray = a32[:, :, 0]
                else:
                    gray = (
                        299 * a32[:, :, 0] + 587 * a32[:, :, 1] + 114 * a32[:, :, 2]
                    ) // 1000
                ys = (np.arange(8) * h) // 8
                xs = (np.arange(9) * w) // 9
                g = gray[np.ix_(ys, xs)]
                bits = (g[:, :8] > g[:, 1:]).astype(np.int64)
                pos = np.arange(8)[:, None] * 8 + np.arange(8)[None, :]
                lo = int(np.sum(bits * np.where(pos < 32, 1 << pos, 0)))
                hi = int(np.sum(bits * np.where(pos >= 32, 1 << (pos - 32), 0)))
                rows.append((int(rid), True, hi, lo))
            yield pd.DataFrame(
                rows, columns=["id", "valid", "hash_hi", "hash_lo"]
            )

    return df.select("id", "payload").mapInPandas(
        kernel, schema="id long, valid boolean, hash_hi long, hash_lo long"
    )


def wav_energy_signature(
    df: DataFrame, n_windows: int = 8, n_levels: int = 9
) -> DataFrame:
    """Audio near-dup fingerprint from REAL decoded WAV bytes: the
    energy envelope. The decoded int16 stream splits into
    ``n_windows`` balanced windows (frame i -> window i*n_windows DIV
    n), each window's Σ s² quantizes to an integer level
    ``(energy * n_windows) DIV (total_energy + 1)`` in
    [0, n_windows], and the levels pack base-``n_levels`` into ONE
    long — re-encodings/copies of the same audio collide on it while
    different material doesn't, the audio analogue of the image dHash.
    ALL integer arithmetic, so a SQL oracle that can re-derive the
    waveform verifies the byte-level decode end to end. Returns
    (id, valid, n_frames, signature); malformed payloads yield
    valid=false. Scale: mapInPandas Arrow batches, per-row cost linear
    in audio length, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np
        import pandas as pd

        def decode_pcm(raw: bytes):
            if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
                raise ValueError("bad signature")
            pos, fmt, data = 12, None, None
            while pos + 8 <= len(raw):
                typ = raw[pos : pos + 4]
                (ln,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
                body = raw[pos + 8 : pos + 8 + ln]
                if len(body) != ln:
                    raise ValueError("truncated chunk")
                if typ == b"fmt ":
                    fmt = body
                elif typ == b"data":
                    data = body
                pos += 8 + ln + (ln & 1)
            if fmt is None or data is None:
                raise ValueError("missing fmt/data")
            audio_fmt, channels = struct.unpack("<HH", fmt[:4])
            bits = struct.unpack("<H", fmt[14:16])[0]
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise ValueError("not mono 16-bit PCM")
            return np.frombuffer(data, dtype="<i2").astype(np.int64)

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    s = decode_pcm(bytes(payload))
                    n = len(s)
                    if n == 0:
                        raise ValueError("empty audio")
                    w = (np.arange(n) * n_windows) // n
                    e = np.bincount(w, weights=(s * s).astype(np.float64),
                                    minlength=n_windows).astype(np.int64)
                    total = int(e.sum())
                    lv = (e * n_windows) // (total + 1)
                    sig = 0
                    for i in range(n_windows - 1, -1, -1):
                        sig = sig * n_levels + int(lv[i])
                    rows.append((int(rid), True, n, sig))
                except Exception:  # noqa: BLE001 - malformed -> invalid row
                    rows.append((int(rid), False, None, None))
            yield pd.DataFrame(
                rows, columns=["id", "valid", "n_frames", "signature"]
            )

    return df.select("id", "payload").mapInPandas(
        kernel, schema="id long, valid boolean, n_frames long, signature long"
    )


def attach_video_payload(
    df: DataFrame, id_col: str, text_col: str, n_frames: int = 6
) -> DataFrame:
    """Typed media table whose payloads are multi-frame VIDEO
    containers built from REAL PNG frames: magic ``VID0`` + uint32-BE
    frame count, then per frame a uint32-BE length prefix + the
    complete PNG bytes. Frame f's image is the fixture PNG of the
    TEXT ROTATED LEFT BY f (same length, so the raster geometry is
    constant across a clip while every frame's pixels differ), built
    under the synthetic id ``id*64 + f`` (so the gray/RGB and filter
    rules stay the documented functions of the per-frame id). A SQL
    oracle re-derives every sampled frame's pixels from the rotation
    rule — no codec.

    Assembly is ALL Spark-side: the frame relation explodes (one row
    per (id, f)), frames render through :func:`attach_real_png_payload`
    (mapInPandas), and the container concatenates via
    collect_list + array_sort + F.aggregate(concat) — JVM expressions,
    no driver collect. Returns MEDIA_SCHEMA rows with
    media_type='video/x-fixture'."""
    n = F.length(F.col(text_col))
    frames = (
        df.filter(n > 0)
        .select(
            F.col(id_col).alias("_vid"),
            F.col(text_col).alias("_t"),
            F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("_f"),
        )
        .select(
            "_vid",
            "_f",
            (F.col("_vid") * 64 + F.col("_f")).alias("_pid"),
            F.concat(
                F.expr("substring(_t, _f + 1)"),
                F.expr("substring(_t, 1, _f)"),
            ).alias("_rt"),
        )
    )
    png = attach_real_png_payload(frames, "_pid", "_rt").select(
        F.expr("id DIV 64").alias("_vid"),
        (F.col("id") % 64).alias("_f"),
        F.col("payload").alias("_p"),
    )
    be32 = lambda c: F.unhex(F.lpad(F.hex(c.cast("long")), 8, "0"))  # noqa: E731
    framed = png.select(
        "_vid", "_f", F.concat(be32(F.octet_length("_p")), F.col("_p")).alias("_fp")
    )
    payload = F.concat(
        F.lit(b"VID0"),
        be32(F.size("_frames")),
        F.aggregate(
            F.transform(F.array_sort("_frames"), lambda s: s["_fp"]),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ),
    )
    return (
        framed.groupBy("_vid")
        .agg(F.collect_list(F.struct("_f", "_fp")).alias("_frames"))
        .select(F.col("_vid").alias("id"), payload.alias("payload"))
        .select(
            "id",
            "payload",
            F.lit("video/x-fixture").alias("media_type"),
            F.lit(1).alias("width"),
            F.lit(1).alias("height"),
            F.octet_length("payload").cast("long").alias("n_bytes"),
        )
    )


def video_frame_sample(df: DataFrame, every_k: int = 3) -> DataFrame:
    """Frame sampling over the VID0 container: walk the length-prefixed
    frame chain and emit every ``every_k``-th frame as its own media
    row (frame_id = container_id*64 + frame_idx, ready to pipe into
    :func:`decode_real`) — the decode-only-what-you-keep discipline
    video pipelines run (sampling BEFORE decode bounds codec cost by
    the keep rate, not the clip length). Malformed containers yield a
    single valid=false row. mapInPandas, per-batch Python."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    if raw[:4] != b"VID0" or len(raw) < 8:
                        raise ValueError("bad magic")
                    (nf,) = struct.unpack(">I", raw[4:8])
                    pos = 8
                    for f in range(nf):
                        if pos + 4 > len(raw):
                            raise ValueError("truncated frame table")
                        (ln,) = struct.unpack(">I", raw[pos : pos + 4])
                        body = raw[pos + 4 : pos + 4 + ln]
                        if len(body) != ln:
                            raise ValueError("truncated frame")
                        if f % every_k == 0:
                            rows.append(
                                (int(rid) * 64 + f, f, True, body)
                            )
                        pos += 4 + ln
                    if pos != len(raw):
                        raise ValueError("trailing bytes")
                except Exception:  # noqa: BLE001 - malformed -> invalid row
                    rows.append((int(rid) * 64, -1, False, None))
            yield pd.DataFrame(
                rows, columns=["id", "frame_idx", "valid", "payload"]
            )

    return df.select("id", "payload").mapInPandas(
        kernel, schema="id long, frame_idx int, valid boolean, payload binary"
    )


# --- Real baseline JPEG (grayscale) ------------------------------------------
#
# Standard Annex-K luminance Huffman tables: (bits[1..16], values) —
# public constants from the JPEG specification. The fixture writes them
# into DHT segments and derives its entropy codes canonically from the
# SAME arrays; the decoder rebuilds its decode tables by PARSING the
# DHT segments, so encode/decode consistency is by construction.
JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
JPEG_DC_VALS = list(range(12))
JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: zigzag scan order: ZIGZAG[k] = raster index (row*8+col) of the k-th
#: zigzagged coefficient
JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_canonical_codes(bits: list, vals: list) -> dict:
    """symbol -> (code, length) from the DHT (bits, values) arrays —
    the canonical Huffman assignment of ITU-T T.81 Annex C."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def attach_real_jpeg_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Typed media table whose payload is a COMPLETE, VALID baseline
    JFIF (grayscale, one 8-bit component, no subsampling) built with
    the stdlib only: SOI, APP0, DQT (identity DC quantizer so the DC
    path is integer-exact), SOF0, the two standard Annex-K luminance
    DHT segments, SOS, real Huffman-coded entropy data with 0xFF byte
    stuffing, EOI. The raster is (8*bh x 8*bw) flat 8x8 blocks with
    bw = n%4+1, bh = n%3+1 and block b's value
    v_b = code_point(text[b mod n]) mod 256 (row-major blocks) — DC
    coefficient 8*(v_b - 128), AC all zero (EOB), DC differences coded
    across blocks exactly as the format specifies. A SQL oracle
    re-derives every pixel from the rule, so
    :func:`jpeg_decode_real`'s Huffman + dequant + IDCT path is
    verifiable bit-exactly end to end. Rows with empty text drop."""

    # built DRIVER-side and closure-captured as plain values: a kernel
    # body referencing module-level names would make cloudpickle ship a
    # by-module reference, and executors do not have lakeapi_spark on
    # sys.path (same self-contained-closure rule as the PNG kernels)
    import struct as _struct

    dc_codes = _jpeg_canonical_codes(JPEG_DC_BITS, JPEG_DC_VALS)
    eob_code = _jpeg_canonical_codes(JPEG_AC_BITS, JPEG_AC_VALS)[0x00]

    def _seg(marker: int, data: bytes) -> bytes:
        return _struct.pack(">HH", marker, len(data) + 2) + data

    dqt = _seg(0xFFDB, bytes([0x00]) + bytes([1] * 64))  # table 0, all-1
    dht_dc = _seg(0xFFC4, bytes([0x00]) + bytes(JPEG_DC_BITS) + bytes(JPEG_DC_VALS))
    dht_ac = _seg(0xFFC4, bytes([0x10]) + bytes(JPEG_AC_BITS) + bytes(JPEG_AC_VALS))
    app0 = _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00")
    sos_hdr = _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import pandas as pd

        class BitWriter:
            def __init__(self):
                self.buf = bytearray()
                self.acc = 0
                self.nbits = 0

            def write(self, code: int, length: int) -> None:
                self.acc = (self.acc << length) | (code & ((1 << length) - 1))
                self.nbits += length
                while self.nbits >= 8:
                    byte = (self.acc >> (self.nbits - 8)) & 0xFF
                    self.buf.append(byte)
                    if byte == 0xFF:  # byte stuffing
                        self.buf.append(0x00)
                    self.nbits -= 8
                    self.acc &= (1 << self.nbits) - 1

            def flush(self) -> bytes:
                if self.nbits:
                    pad = 8 - self.nbits
                    self.write((1 << pad) - 1, pad)  # 1-fill per spec
                return bytes(self.buf)

        def seg(marker: int, data: bytes) -> bytes:
            return struct.pack(">HH", marker, len(data) + 2) + data

        for pdf in batches:
            ids, payloads, widths, heights, nbytes = [], [], [], [], []
            for rid, text in zip(pdf["_id"], pdf["_text"]):
                n = len(text)
                if n == 0:
                    continue
                rid = int(rid)
                bw, bh = n % 4 + 1, n % 3 + 1
                w, h = 8 * bw, 8 * bh
                sof0 = seg(
                    0xFFC0,
                    bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]),
                )
                bits = BitWriter()
                prev_dc = 0
                for b in range(bw * bh):
                    v = ord(text[b % n]) % 256
                    dc = 8 * (v - 128)
                    diff = dc - prev_dc
                    prev_dc = dc
                    mag, t = abs(diff), 0
                    while mag >> t:
                        t += 1
                    code, ln = dc_codes[t]
                    bits.write(code, ln)
                    if t:
                        amp = diff if diff >= 0 else diff + (1 << t) - 1
                        bits.write(amp, t)
                    bits.write(*eob_code)  # all 63 AC coefficients zero
                jpg = (
                    b"\xff\xd8" + app0 + dqt + sof0 + dht_dc + dht_ac
                    + sos_hdr + bits.flush() + b"\xff\xd9"
                )
                ids.append(rid)
                payloads.append(jpg)
                widths.append(w)
                heights.append(h)
                nbytes.append(len(jpg))
            yield pd.DataFrame(
                {
                    "id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                    "media_type": pd.Series(["image/jpeg"] * len(ids), dtype="object"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "n_bytes": pd.Series(nbytes, dtype="int64"),
                }
            )

    return df.select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_text")
    ).mapInPandas(kernel, schema=MEDIA_SCHEMA)


def jpeg_decode_real(df: DataFrame) -> DataFrame:
    """REAL baseline JPEG decode for 8-bit GRAYSCALE (one component,
    no subsampling), stdlib + numpy only — the Huffman/DCT sibling of
    the PNG :func:`decode_real`: walk the marker chain, parse DQT
    (zigzag-ordered) and DHT (canonical code reconstruction per ITU-T
    T.81 Annex C), entropy-decode each block's DC difference and
    run-length-coded AC coefficients (EOB/ZRL included) from the
    byte-stuffed scan, dequantize, inverse-zigzag, apply a full 8x8
    float64 IDCT (basis-matrix form), level-shift, clamp — then reduce
    the raster to the same SQL-re-derivable integer stats as the PNG
    path (n_px, pixel_sum, Σ (i+1)·pixel_i). Anything unsupported —
    progressive SOF2, multi-component, restart markers, bad lengths,
    truncation — yields a ``valid=false`` row instead of poisoning the
    batch.

    mapInPandas over Arrow batches; per-row cost linear in coded size.
    The bit-level loops are honest Python — swap libjpeg-turbo into the
    kernel body for throughput; schema/validity contracts stay put."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        import struct

        import numpy as np
        import pandas as pd

        zz = [
            0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
            12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
            35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
            58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
        ]
        # IDCT basis: M[x, u] = C(u)/2 * cos((2x+1) u pi / 16)
        M = np.array(
            [
                [
                    (math.sqrt(0.5) if u == 0 else 1.0)
                    / 2.0
                    * math.cos((2 * x + 1) * u * math.pi / 16.0)
                    for u in range(8)
                ]
                for x in range(8)
            ]
        )

        def build_huff(bits: bytes, vals: bytes) -> dict:
            out, code, k = {}, 0, 0
            for ln in range(1, 17):
                for _ in range(bits[ln - 1]):
                    out[(ln, code)] = vals[k]
                    code += 1
                    k += 1
                code <<= 1
            return out

        class BitReader:
            def __init__(self, data: bytes):
                self.d = data
                self.pos = 0
                self.acc = 0
                self.nbits = 0

            def _fill(self) -> None:
                if self.pos >= len(self.d):
                    raise ValueError("scan truncated")
                b = self.d[self.pos]
                self.pos += 1
                if b == 0xFF:
                    if self.pos >= len(self.d):
                        raise ValueError("dangling 0xFF")
                    nxt = self.d[self.pos]
                    if nxt == 0x00:
                        self.pos += 1  # stuffed byte
                    else:
                        raise ValueError("marker inside scan")
                self.acc = (self.acc << 8) | b
                self.nbits += 8

            def bit(self) -> int:
                if self.nbits == 0:
                    self._fill()
                self.nbits -= 1
                v = (self.acc >> self.nbits) & 1
                self.acc &= (1 << self.nbits) - 1
                return v

            def bits(self, n: int) -> int:
                v = 0
                for _ in range(n):
                    v = (v << 1) | self.bit()
                return v

            def huff(self, table: dict) -> int:
                code, ln = 0, 0
                while ln <= 16:
                    code = (code << 1) | self.bit()
                    ln += 1
                    sym = table.get((ln, code))
                    if sym is not None:
                        return sym
                raise ValueError("bad huffman code")

        def extend(v: int, t: int) -> int:
            return v if v >= (1 << (t - 1)) else v - (1 << t) + 1

        def decode_one(raw: bytes):
            if raw[:2] != b"\xff\xd8":
                raise ValueError("bad SOI")
            pos = 2
            qt: dict = {}
            dc_tabs: dict = {}
            ac_tabs: dict = {}
            w = h = None
            qsel = 0
            scan_start = None
            while pos + 4 <= len(raw):
                if raw[pos] != 0xFF:
                    raise ValueError("lost marker sync")
                marker = raw[pos + 1]
                (ln,) = struct.unpack(">H", raw[pos + 2 : pos + 4])
                data = raw[pos + 4 : pos + 2 + ln]
                if len(data) != ln - 2:
                    raise ValueError("truncated segment")
                if marker == 0xDB:  # DQT (8-bit tables only)
                    p = 0
                    while p < len(data):
                        if data[p] >> 4:
                            raise ValueError("16-bit DQT unsupported")
                        tid = data[p] & 0x0F
                        tab = np.zeros(64)
                        for k in range(64):
                            tab[zz[k]] = data[p + 1 + k]
                        qt[tid] = tab.reshape(8, 8)
                        p += 65
                elif marker == 0xC4:  # DHT
                    p = 0
                    while p < len(data):
                        cls, tid = data[p] >> 4, data[p] & 0x0F
                        bits = data[p + 1 : p + 17]
                        nv = sum(bits)
                        vals = data[p + 17 : p + 17 + nv]
                        (ac_tabs if cls else dc_tabs)[tid] = build_huff(bits, vals)
                        p += 17 + nv
                elif marker == 0xC0:  # SOF0 baseline
                    if data[0] != 8:
                        raise ValueError("non-8-bit precision")
                    h, w = struct.unpack(">HH", data[1:5])
                    if data[5] != 1:
                        raise ValueError("multi-component unsupported")
                    if data[7] != 0x11:
                        raise ValueError("subsampling unsupported")
                    qsel = data[8]
                elif marker in (0xC1, 0xC2, 0xC3):
                    raise ValueError("non-baseline SOF unsupported")
                elif marker == 0xDD:
                    raise ValueError("restart intervals unsupported")
                elif marker == 0xDA:  # SOS
                    if data[0] != 1:
                        raise ValueError("multi-component scan")
                    dc_sel, ac_sel = data[2] >> 4, data[2] & 0x0F
                    scan_start = pos + 2 + ln
                    break
                pos += 2 + ln
            if w is None or scan_start is None or qsel not in qt:
                raise ValueError("missing SOF/SOS/DQT")
            if dc_sel not in dc_tabs or ac_sel not in ac_tabs:
                raise ValueError("missing DHT")
            q = qt[qsel]
            dct, act = dc_tabs[dc_sel], ac_tabs[ac_sel]
            end = raw.rfind(b"\xff\xd9")
            if end < 0:
                raise ValueError("missing EOI")
            br = BitReader(raw[scan_start:end])
            bw, bh = (w + 7) // 8, (h + 7) // 8
            raster = np.zeros((bh * 8, bw * 8), dtype=np.int64)
            prev_dc = 0
            for by in range(bh):
                for bx in range(bw):
                    coeff = np.zeros(64)
                    t = br.huff(dct)
                    diff = extend(br.bits(t), t) if t else 0
                    prev_dc += diff
                    coeff[0] = prev_dc
                    k = 1
                    while k < 64:
                        sym = br.huff(act)
                        if sym == 0x00:  # EOB
                            break
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run != 15:
                                raise ValueError("bad AC symbol")
                            k += 16  # ZRL
                            continue
                        k += run
                        if k >= 64:
                            raise ValueError("AC index overflow")
                        coeff[zz[k]] = extend(br.bits(size), size)
                        k += 1
                    fq = coeff.reshape(8, 8) * q
                    block = M @ fq @ M.T + 128.0
                    px = np.clip(np.rint(block), 0, 255).astype(np.int64)
                    raster[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
            raster = raster[:h, :w]
            flat = raster.reshape(-1)
            idx = np.arange(1, flat.size + 1, dtype=np.int64)
            return (
                int(w), int(h), 1, int(flat.size),
                int(flat.sum()), int((idx * flat).sum()),
            )

        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf["id"], pdf["payload"]):
                try:
                    w, h, c, n_px, px_sum, checksum = decode_one(bytes(payload))
                    rows.append((int(rid), True, w, h, c, n_px, px_sum, checksum))
                except Exception:  # noqa: BLE001 - any malformation -> invalid row
                    rows.append(
                        (int(rid), False, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "valid", "width", "height",
                    "n_channels", "n_px", "pixel_sum", "pixel_checksum",
                ],
            )

    return df.select("id", "payload").mapInPandas(
        kernel,
        schema=(
            "id long, valid boolean, width long, height long, "
            "n_channels long, n_px long, pixel_sum long, pixel_checksum long"
        ),
    )

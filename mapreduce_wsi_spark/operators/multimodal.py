"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched pandas stages over ``mapInPandas``. Nine formats decode
FOR REAL, pure stdlib+numpy with no media libraries: binary PPM (P6);
BMP (uncompressed 24/32bpp with row padding, bottom-up scanlines,
BGR(A) order, plus 8/4/1bpp palette and RLE8/RLE4); PNG (all five color
types,
bit depths 1/2/4/8/16 incl. sub-byte palette/gray packing, both
non-interlaced and Adam7 interlaced — zlib inflate + per-row
Sub/Up/Average/Paeth defilter per pass); JPEG — both baseline
sequential (SOF0) and progressive (SOF2: spectral selection +
successive approximation, T.81 Annex G) — with Huffman entropy decode,
dequant + IDCT, chroma upsampling, YCbCr->RGB; GIF (LZW, palette,
interlaced); TIFF (IFD walk, strips AND §15 tiles — the whole-slide-
image layout — PackBits, TIFF-LZW with early change, Deflate,
Predictor 2); TGA (RLE + raw);
QOI (run/index/diff ops); and WAV audio across PCM16, mu-law/A-law
companding, and IMA-ADPCM block decode — powering real per-format
stats (``decode_ppm_stats`` / ``decode_bmp_stats`` /
``decode_png_stats`` / ``decode_jpeg_stats`` / ``decode_wav_stats``),
real typed feature vectors (``decode_features(real_decode=True)``),
and real nearest-neighbor pixel resize
(``resize_images(real_decode=True)``). The residual stub boundary:
arithmetic-coded/12-bit/lossless JPEG, JPEG-compressed planar/16-bit
TIFF, and MP3-class perceptual audio codecs yield ok=false rows —
never a failed stage — and the byte-level fake kernels remain the
default for plumbing tests over arbitrary payloads. (Uncompressed/
LZW/Deflate/PackBits planar-configuration and 16-bit TIFF decode for
real as of r13.)

Scale notes: payload bytes never pass through a shuffle (featurize before
aggregating); batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory holds
O(batch × payload) not O(partition × payload).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

BLOB_SCHEMA = ("doc_id long, content binary, mime string, n_bytes int")
FEATURES_SCHEMA = ("doc_id long, n_bytes int, ok boolean, "
                   "feature array<double>")
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def to_blob_table(documents: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  mime: str = "text/plain") -> DataFrame:
    """Stand-in blob table: fixture text UTF-8-encoded as the binary payload
    (real pipelines read image/audio bytes from parquet/object storage the
    same way — one binary column + metadata)."""
    return documents.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.col(text_col)).cast("int").alias("n_bytes"))


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for an image/audio feature extractor: an
    8-bucket byte histogram, L1-normalized. STUB — replace with the real
    decoder when the media libraries are available."""
    if not payload:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for byte in payload:
        counts[byte % FEATURE_DIM] += 1
    total = float(len(payload))
    return [c / total for c in counts]


def _real_decode_features(payload: bytes) -> list[float] | None:
    """REAL 8-dim feature vector via magic-byte dispatch over the
    decodable formats: images (PPM/BMP/PNG/JPEG/GIF/TIFF) -> [1, w, h,
    mean_r, mean_g, mean_b, n_pixels, 0]; WAV (PCM16 / G.711 / IMA
    ADPCM) -> [2, rate, channels, n_samples, mean_amp, rms, 0, 0].
    Returns None (ok=false downstream) for MP3-class / unknown formats
    — the remaining stub boundary."""
    img = None
    if payload[:2] == b"P6":
        parsed = _parse_ppm(payload)
        if parsed is not None:
            w, h, rgb = parsed
            img = (w, h, np.frombuffer(rgb, dtype=np.uint8))
    elif payload[:2] == b"BM":
        parsed = _parse_bmp(payload)
        if parsed is not None:
            w, h, px = parsed
            img = (w, h, np.ascontiguousarray(px).reshape(-1))
    elif payload[:8] == PNG_MAGIC:
        parsed = _parse_png(payload)
        if parsed is not None:
            w, h, px = parsed
            img = (w, h, px.reshape(-1))
    elif payload[:2] == b"\xFF\xD8":
        parsed = _parse_jpeg(payload)
        if parsed is not None:
            w, h, px = parsed
            img = (w, h, px.reshape(-1))
    elif payload[:4] == b"GIF8":
        parsed = _parse_gif(payload)
        if parsed is not None:
            w, h, px = parsed
            img = (w, h, px.reshape(-1))
    elif payload[:4] in (b"II*\x00", b"MM\x00*"):
        parsed = _parse_tiff(payload)
        if parsed is not None:
            w, h, px = parsed
            img = (w, h, np.ascontiguousarray(px).reshape(-1))
    elif payload[:4] == b"RIFF":
        parsed = _parse_wav(payload)
        if parsed is not None:
            rate, channels, samples = parsed
            s64 = samples.astype(np.int64)
            n = int(s64.size)
            mean = float(s64.sum()) / n if n else 0.0
            rms = float(np.sqrt(np.dot(s64, s64) / n)) if n else 0.0
            return [2.0, float(rate), float(channels), float(n),
                    mean, rms, 0.0, 0.0]
    if img is None:
        return None
    w, h, flat = img
    means = _channel_means(flat)
    return [1.0, float(w), float(h), means[0], means[1], means[2],
            float(w * h), 0.0]


def decode_features(blobs: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``real_decode=True`` REALLY decodes the supported formats (P6 PPM,
    BMP incl. RLE8/palette, PNG incl. sub-byte depths and Adam7, JPEG
    both baseline and progressive, GIF, PCM16 WAV — magic-byte dispatch
    in ``_real_decode_features``) into a typed 8-dim feature vector;
    payloads outside that set yield ok=false with a NULL feature
    (poison-safe). The default remains the deterministic byte-histogram
    fake, for plumbing tests that feed arbitrary bytes."""

    kernel = _real_decode_features if real_decode else _fake_decode_features

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kernel(bytes(b) if b else b"") for b in pdf["content"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["n_bytes"].astype("int32"),
                "ok": [f is not None for f in feats],
                "feature": feats,
            })

    return blobs.mapInPandas(featurize, FEATURES_SCHEMA)


def sample_frames(blobs: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing: split each payload into n evenly spaced
    chunks ("frames"). For real video this is the seek-and-decode stage;
    the chunking here exercises the same schema/batch shape. Pure SQL
    expressions — the payload never hits Python."""
    total = F.octet_length(F.col("content"))
    frame = F.expr(
        f"transform(sequence(0, {n_frames - 1}), "
        f"i -> named_struct("
        f"'frame_idx', CAST(i AS INT), "
        f"'frame_bytes', substring(content, "
        f"CAST(i * octet_length(content) / {n_frames} AS INT) + 1, "
        f"CAST(octet_length(content) / {n_frames} AS INT))))")
    return (blobs.filter(total > 0)
            .select("doc_id", F.explode(frame).alias("f"))
            .select("doc_id", F.col("f.frame_idx").alias("frame_idx"),
                    F.col("f.frame_bytes").alias("frame_bytes")))


PPM_STATS_SCHEMA = ("doc_id long, img_w int, img_h int, ok boolean, "
                    "mean_r double, mean_g double, mean_b double")


def _channel_means(flat_rgb: "np.ndarray") -> list[float]:
    """Per-channel means over an interleaved RGB uint8 buffer via three
    strided int64 sums — ~12x faster than a float mean over the (n, 3)
    reshape (1D strided reduction vectorizes; the 2D axis-reduction does
    not), and the interpreter-bound per-byte loop both replaced was
    ~140x slower. Integer sum + one divide is also bit-identical to the
    DuckDB oracle's list_sum(...)/n arithmetic."""
    n = flat_rgb.size // 3
    if n == 0:
        return [0.0, 0.0, 0.0]
    return [float(int(flat_rgb[c::3].sum(dtype=np.int64))) / n
            for c in range(3)]


def _parse_ppm(payload: bytes) -> tuple[int, int, bytes] | None:
    """Parse a binary PPM (P6) image: returns (width, height, rgb_bytes) or
    None if the payload is not a well-formed P6. Pure Python — a REAL
    decoder for one trivial format (no media libraries needed); other
    formats stay behind the ``real_decode`` stub in ``decode_features``.

    Format: ``P6`` magic, whitespace-separated width/height/maxval tokens
    (``#`` comment lines allowed), ONE whitespace byte, then raw
    width*height*3 RGB bytes.
    """
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4 and i < len(payload):
        if payload[i:i + 1].isspace():
            i += 1
            continue
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    if len(tokens) < 4 or tokens[0] != b"P6":
        return None
    try:
        w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 255:
        return None
    i += 1  # the single whitespace byte after maxval
    rgb = payload[i:i + w * h * 3]
    if len(rgb) < w * h * 3:
        return None
    return w, h, rgb


def decode_ppm_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of P6 PPM payloads: per-image width,
    height and per-channel pixel means. Malformed payloads yield
    ``ok=false`` with zeroed stats instead of failing the batch — at 100 TB
    a poison blob must never kill the stage."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_ppm(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, rgb = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                means = _channel_means(np.frombuffer(rgb, dtype=np.uint8))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, PPM_STATS_SCHEMA)


BMP_STATS_SCHEMA = PPM_STATS_SCHEMA


def _bmp_rle8_indices(payload: bytes, pos: int, w: int,
                      h: int) -> "np.ndarray | None":
    """Decode a BI_RLE8 pixel stream into an (h, w) uint8 index image
    (bottom-up row order, as stored). Handles all four op kinds from the
    BMP spec: encoded runs (count, value), absolute mode (0, n>=3, n
    literal bytes, word-aligned), end-of-line (0,0), delta skip (0,2,
    dx, dy — skipped pixels stay index 0), end-of-bitmap (0,1). Strict
    bounds: a run crossing a row edge or a stream without EOB returns
    None (poison-safe, never raises)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    n = len(payload)
    while pos + 1 < n:
        c, v = payload[pos], payload[pos + 1]
        pos += 2
        if c:  # encoded run
            if y >= h or x + c > w:
                return None
            out[y, x:x + c] = v
            x += c
        elif v == 0:  # end of line
            x = 0
            y += 1
            if y > h:
                return None
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta: skip right/up (bottom-up storage)
            if pos + 2 > n:
                return None
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
            if x > w or y > h:
                return None
        else:  # absolute mode: v literal palette indices, word-aligned
            if y >= h or x + v > w or pos + v > n:
                return None
            out[y, x:x + v] = np.frombuffer(payload[pos:pos + v],
                                            dtype=np.uint8)
            x += v
            pos += v + (v & 1)
    return None  # ran off the end without an end-of-bitmap escape


def _bmp_rle4_indices(payload: bytes, pos: int, w: int,
                      h: int) -> "np.ndarray | None":
    """Decode a BI_RLE4 pixel stream into an (h, w) uint8 index image
    (bottom-up row order, as stored) — the nibble-packed sibling of
    _bmp_rle8_indices (r11; the header's smallest documented stub).
    Encoded runs alternate the HIGH then LOW nibble of the value byte
    for ``count`` pixels; absolute mode carries n literal nibbles
    packed two per byte (high first), with the byte stream word-
    aligned; EOL (0,0), delta (0,2,dx,dy) and EOB (0,1) escapes are
    identical to RLE8. Strict bounds: a run crossing a row edge or a
    stream without EOB returns None (poison-safe, never raises)."""
    out = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    n = len(payload)
    while pos + 1 < n:
        c, v = payload[pos], payload[pos + 1]
        pos += 2
        if c:  # encoded run: c pixels of alternating hi/lo nibble
            if y >= h or x + c > w:
                return None
            pix = np.empty(c, dtype=np.uint8)
            pix[0::2] = v >> 4
            pix[1::2] = v & 0x0F
            out[y, x:x + c] = pix
            x += c
        elif v == 0:  # end of line
            x = 0
            y += 1
            if y > h:
                return None
        elif v == 1:  # end of bitmap
            return out
        elif v == 2:  # delta: skip right/up (bottom-up storage)
            if pos + 2 > n:
                return None
            x += payload[pos]
            y += payload[pos + 1]
            pos += 2
            if x > w or y > h:
                return None
        else:  # absolute: v literal nibbles, hi first, word-aligned
            nbytes = (v + 1) // 2
            if y >= h or x + v > w or pos + nbytes > n:
                return None
            raw = np.frombuffer(payload[pos:pos + nbytes],
                                dtype=np.uint8)
            nib = np.empty(nbytes * 2, dtype=np.uint8)
            nib[0::2] = raw >> 4
            nib[1::2] = raw & 0x0F
            out[y, x:x + v] = nib[:v]
            x += v
            pos += nbytes + (nbytes & 1)
    return None  # ran off the end without an end-of-bitmap escape


def _unpack_nibble_rows(block: "np.ndarray", w: int) -> "np.ndarray":
    """(h, stride) packed 4bpp rows -> (h, w) uint8 indices, high
    nibble first within each byte."""
    h = block.shape[0]
    nib = np.empty((h, block.shape[1] * 2), dtype=np.uint8)
    nib[:, 0::2] = block >> 4
    nib[:, 1::2] = block & 0x0F
    return nib[:, :w]


def _parse_bmp(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Parse a BMP (BITMAPFILEHEADER + BITMAPINFOHEADER): returns
    (width, height, pixels) with pixels an (h, w, 3) uint8 ndarray in
    top-down RGB order, or None if the payload is not in the supported
    subset. REAL decode of the mainstream interchange layouts — stdlib
    ``struct`` for headers, numpy views for the pixel block: BI_RGB
    24/32bpp (4-byte row padding, bottom-up and top-down scanline
    orders, BGR(A) channel order, alpha dropped), BI_RGB 8bpp palette,
    BI_RGB 8bpp palette, BI_RLE8, and (r11) BI_RGB 4bpp palette,
    BI_RLE4 run-length compressed 4bpp (nibble runs, absolute mode,
    EOL/delta/EOB escapes), 1bpp bilevel (MSB-first bit rows) and
    BI_BITFIELDS 16/32bpp with ARBITRARY channel masks — contiguous
    (565/555/8888) via one shift, non-contiguous (r12) via a
    vectorized PEXT-style bit compaction — plus the OS/2
    BITMAPCOREHEADER legacy layout (12-byte header, 3-byte BGR
    palette triples, 24/8bpp): the BMP family complete, zero mask
    stubs remaining (a zero mask is malformed and returns None)."""
    import struct

    if len(payload) < 26 or payload[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size == 12:  # OS/2 BITMAPCOREHEADER (r11): legacy layout
        w, h = struct.unpack_from("<HH", payload, 18)  # unsigned,
        planes, bpp = struct.unpack_from("<HH", payload, 22)
        # bottom-up only; palette entries are 3-byte BGR triples
        if planes != 1 or not w or not h or data_off < 26:
            return None
        if bpp == 24:
            stride = (w * 3 + 3) & ~3
            end = data_off + stride * h
            if len(payload) < end:
                return None
            scan = (np.frombuffer(payload[data_off:end], dtype=np.uint8)
                    .reshape(h, stride)[:, :w * 3].reshape(h, w, 3))
            return w, h, scan[::-1, :, ::-1]  # flip rows, BGR -> RGB
        if bpp == 8:
            if len(payload) < 26 + 3 * 256:
                return None
            pal = (np.frombuffer(payload[26:26 + 3 * 256],
                                 dtype=np.uint8)
                   .reshape(256, 3)[:, ::-1])  # BGR -> RGB
            stride = (w + 3) & ~3
            end = data_off + stride * h
            if len(payload) < end:
                return None
            idx = (np.frombuffer(payload[data_off:end], dtype=np.uint8)
                   .reshape(h, stride)[:, :w])
            return w, h, pal[idx[::-1]]
        return None
    if hdr_size < 40 or len(payload) < 54:  # other pre-v3: unsupported
        return None
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if planes != 1 or w <= 0 or h == 0 or data_off < 14 + hdr_size:
        return None
    if bpp in (24, 32) and compression == 0:
        bottom_up = h > 0
        h_abs = abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3  # scanlines pad to 4-byte multiples
        end = data_off + stride * h_abs
        if len(payload) < end:
            return None
        scan = (np.frombuffer(payload[data_off:end], dtype=np.uint8)
                .reshape(h_abs, stride)[:, :w * nb].reshape(h_abs, w, nb))
        if bottom_up:
            scan = scan[::-1]
        return w, h_abs, scan[..., 2::-1]  # BGR(A) -> RGB, alpha dropped
    if bpp == 8 and compression in (0, 1):  # palette / BI_RLE8
        (clr_used,) = struct.unpack_from("<I", payload, 46)
        n_pal = clr_used or 256
        pal_off = 14 + hdr_size
        if n_pal > 256 or len(payload) < pal_off + 4 * n_pal:
            return None
        pal = (np.frombuffer(payload[pal_off:pal_off + 4 * n_pal],
                             dtype=np.uint8)
               .reshape(-1, 4)[:, 2::-1])  # BGRX -> RGB
        if n_pal < 256:  # any index decodes (poison-safe), as black
            pal = np.vstack([pal, np.zeros((256 - n_pal, 3), np.uint8)])
        if compression == 0:
            bottom_up = h > 0
            h_abs = abs(h)
            stride = (w + 3) & ~3
            end = data_off + stride * h_abs
            if len(payload) < end:
                return None
            idx = (np.frombuffer(payload[data_off:end], dtype=np.uint8)
                   .reshape(h_abs, stride)[:, :w])
            if bottom_up:
                idx = idx[::-1]
            return w, h_abs, pal[idx]
        if h < 0:  # RLE streams are bottom-up only per spec
            return None
        idx = _bmp_rle8_indices(payload, data_off, w, h)
        if idx is None:
            return None
        return w, h, pal[idx[::-1]]
    if bpp in (16, 32) and compression == 3:  # BI_BITFIELDS (r11)
        # RGB channel masks sit at payload[54:66] for BOTH layouts in
        # the wild: BITMAPINFOHEADER (masks follow the 40-byte header)
        # and BITMAPV4/V5 (masks are header fields at the same file
        # offset). Shift = mask's trailing zeros; width = popcount of
        # the contiguous run; samples scale to 8 bits by exact integer
        # val * 255 // (2^width - 1). Covers 565/555/8888 and any
        # other contiguous-mask layout.
        if len(payload) < 66:
            return None
        masks = struct.unpack_from("<III", payload, 54)
        for mask in masks:
            if mask == 0 or mask >> bpp:
                return None
        if (masks[0] & masks[1]) or (masks[0] & masks[2]) \
                or (masks[1] & masks[2]):
            return None  # overlapping channel masks: malformed header
        bottom_up = h > 0
        h_abs = abs(h)
        nb = bpp // 8
        stride = (w * nb + 3) & ~3
        end = data_off + stride * h_abs
        if len(payload) < end:
            return None
        block = (np.frombuffer(payload[data_off:end], dtype=np.uint8)
                 .reshape(h_abs, stride)[:, :w * nb])
        pix = (block.reshape(h_abs, w, nb).astype(np.uint32)
               << (np.arange(nb, dtype=np.uint32) * 8)).sum(
                   axis=2, dtype=np.uint32)  # little-endian assemble
        chans = []
        for mask in masks:
            shift = (mask & -mask).bit_length() - 1
            width = (mask >> shift).bit_length()
            if (mask >> shift) == (1 << width) - 1:
                v = (pix & mask) >> shift  # contiguous: one shift
            else:
                # non-contiguous mask (r12, the header's last BMP
                # stub): compact the masked bits PEXT-style — bit i of
                # the pixel lands at position rank(i) among the mask's
                # set bits. <= bpp numpy passes, vectorized across all
                # pixels; sample width = the mask's popcount.
                v = np.zeros_like(pix)
                width = 0
                for i in range(bpp):
                    if mask >> i & 1:
                        v |= ((pix >> np.uint32(i)) & np.uint32(1)) \
                            << np.uint32(width)
                        width += 1
            # scale in uint64: v*255 wraps uint32 once popcount >= 25
            chans.append((v.astype(np.uint64) * 255
                          // ((1 << width) - 1)).astype(np.uint8))
        rgb = np.stack(chans, axis=2)
        if bottom_up:
            rgb = rgb[::-1]
        return w, h_abs, rgb
    if bpp == 1 and compression == 0:  # 1bpp bilevel palette (r11)
        (clr_used,) = struct.unpack_from("<I", payload, 46)
        n_pal = clr_used or 2
        pal_off = 14 + hdr_size
        if n_pal > 2 or len(payload) < pal_off + 4 * n_pal:
            return None
        pal = (np.frombuffer(payload[pal_off:pal_off + 4 * n_pal],
                             dtype=np.uint8)
               .reshape(-1, 4)[:, 2::-1])  # BGRX -> RGB
        if n_pal < 2:
            pal = np.vstack([pal, np.zeros((2 - n_pal, 3), np.uint8)])
        bottom_up = h > 0
        h_abs = abs(h)
        stride = ((w + 7) // 8 + 3) & ~3
        end = data_off + stride * h_abs
        if len(payload) < end:
            return None
        block = (np.frombuffer(payload[data_off:end], dtype=np.uint8)
                 .reshape(h_abs, stride))
        bits = np.unpackbits(block, axis=1)[:, :w]  # MSB-first per byte
        if bottom_up:
            bits = bits[::-1]
        return w, h_abs, pal[bits]
    if bpp == 4 and compression in (0, 2):  # 4bpp palette / BI_RLE4
        (clr_used,) = struct.unpack_from("<I", payload, 46)
        n_pal = clr_used or 16
        pal_off = 14 + hdr_size
        if n_pal > 16 or len(payload) < pal_off + 4 * n_pal:
            return None
        pal = (np.frombuffer(payload[pal_off:pal_off + 4 * n_pal],
                             dtype=np.uint8)
               .reshape(-1, 4)[:, 2::-1])  # BGRX -> RGB
        if n_pal < 16:  # any nibble decodes (poison-safe), as black
            pal = np.vstack([pal, np.zeros((16 - n_pal, 3), np.uint8)])
        if compression == 0:
            bottom_up = h > 0
            h_abs = abs(h)
            stride = ((w + 1) // 2 + 3) & ~3
            end = data_off + stride * h_abs
            if len(payload) < end:
                return None
            block = (np.frombuffer(payload[data_off:end], dtype=np.uint8)
                     .reshape(h_abs, stride))
            idx = _unpack_nibble_rows(block, w)
            if bottom_up:
                idx = idx[::-1]
            return w, h_abs, pal[idx]
        if h < 0:  # RLE streams are bottom-up only per spec
            return None
        idx = _bmp_rle4_indices(payload, data_off, w, h)
        if idx is None:
            return None
        return w, h, pal[idx[::-1]]
    return None


def _bmp8_wrap(w: int, h: int, palette, data: bytes,
               compression: int) -> bytes:
    """Assemble an 8bpp BMP (full 256-entry BGRX palette) around an
    already-encoded pixel stream — shared by the two test encoders."""
    import struct

    pal = np.zeros((256, 4), dtype=np.uint8)
    p = np.asarray(palette, dtype=np.uint8)
    pal[:len(p), :3] = p[:, ::-1]  # RGB -> BGR
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, compression,
                       len(data), 0, 0, 0, 0)
    body = info + pal.tobytes() + data
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + len(body), 0, 0,
                           14 + len(info) + pal.nbytes)
    return file_hdr + body


def encode_bmp_pal8(indices: "np.ndarray", palette) -> bytes:
    """Uncompressed 8bpp palette BMP from a TOP-DOWN (h, w) uint8 index
    image (stored bottom-up, rows padded to 4 bytes) — test twin for the
    palette decode path."""
    h, w = indices.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = indices[::-1]
    return _bmp8_wrap(w, h, palette, rows.tobytes(), 0)


def encode_bmp_rle8(indices: "np.ndarray", palette,
                    absolute_mode: bool = False) -> bytes:
    """BI_RLE8 BMP from a TOP-DOWN (h, w) uint8 index image — the test
    twin for _bmp_rle8_indices. Greedy encoded runs (<=255); with
    ``absolute_mode`` non-repeating stretches of >=3 pixels use the
    word-aligned absolute op instead of 1-runs, exercising that decode
    branch. EOL after every row, EOB at the end (delta ops are covered
    by directed hand-built streams in the tests — no mainstream encoder
    emits them)."""
    h, w = indices.shape
    stored = indices[::-1]
    out = bytearray()
    for y in range(h):
        row = stored[y]
        x = 0
        while x < w:
            run = 1
            while x + run < w and run < 255 and row[x + run] == row[x]:
                run += 1
            if absolute_mode and run < 3:
                start = x
                while x < w and x - start < 255:
                    r2 = 1
                    while x + r2 < w and row[x + r2] == row[x]:
                        r2 += 1
                    if r2 >= 3:
                        break
                    x += r2
                lit = bytes(row[start:x])
                if len(lit) >= 3:
                    out += bytes([0, len(lit)]) + lit
                    if len(lit) & 1:
                        out += b"\x00"  # word alignment pad
                else:
                    for v in lit:
                        out += bytes([1, v])
            else:
                out += bytes([run, int(row[x])])
                x += run
        if y < h - 1:
            out += b"\x00\x00"
    out += b"\x00\x01"
    return _bmp8_wrap(w, h, palette, bytes(out), 1)


def _bmp4_wrap(w: int, h: int, palette, data: bytes,
               compression: int) -> bytes:
    """Assemble a 4bpp BMP (full 16-entry BGRX palette) around an
    already-encoded pixel stream — shared by the two r11 test
    encoders (the _bmp8_wrap pattern at 4 bits)."""
    import struct

    pal = np.zeros((16, 4), dtype=np.uint8)
    p = np.asarray(palette, dtype=np.uint8)
    pal[:len(p), :3] = p[:16, ::-1]  # RGB -> BGR
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 4, compression,
                       len(data), 0, 0, 0, 0)
    body = info + pal.tobytes() + data
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + len(body), 0, 0,
                           14 + len(info) + pal.nbytes)
    return file_hdr + body


def _pack_nibbles(row: "np.ndarray") -> bytes:
    """uint8 index row (values < 16) -> packed 4bpp bytes, high nibble
    first, odd tail padded with a zero nibble."""
    r = np.asarray(row, dtype=np.uint8)
    if len(r) & 1:
        r = np.concatenate([r, np.zeros(1, np.uint8)])
    return ((r[0::2] << 4) | r[1::2]).tobytes()


def encode_bmp_bitfields(rgb: "np.ndarray",
                         masks=(0xF800, 0x07E0, 0x001F),
                         bpp: int = 16) -> bytes:
    """BI_BITFIELDS BMP (16/32bpp masked) from a TOP-DOWN (h, w, 3)
    uint8 image — test twin for the masked decode path. Each channel
    keeps its top ``popcount(mask)`` bits (ch >> (8 - width)) and
    DEPOSITS them onto the mask's set bits PDEP-style (for contiguous
    masks that reduces to one shift; for non-contiguous masks — r12 —
    it is the exact writer-side inverse of the decoder's bit
    compaction), little-endian, stored bottom-up with 4-byte row
    stride; the 3 DWORD masks follow the 40-byte info header."""
    import struct

    h, w = rgb.shape[:2]
    nb = bpp // 8
    pix = np.zeros((h, w), dtype=np.uint32)
    for c, mask in enumerate(masks):
        width = bin(mask).count("1")
        stored = (rgb[:, :, c].astype(np.uint32) >> (8 - width))
        out_bit = 0
        for i in range(bpp):
            if mask >> i & 1:
                pix |= (((stored >> np.uint32(out_bit)) & np.uint32(1))
                        << np.uint32(i))
                out_bit += 1
    stride = (w * nb + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        line = bytearray()
        for x in range(w):
            line += int(pix[y, x]).to_bytes(nb, "little")
        rows += line + b"\x00" * (stride - len(line))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 3,
                       len(rows), 0, 0, 0, 0)
    mask_blk = struct.pack("<III", *masks)
    body = info + mask_blk + bytes(rows)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + len(body), 0, 0,
                           14 + len(info) + len(mask_blk))
    return file_hdr + body


def encode_bmp_pal1(indices: "np.ndarray", palette) -> bytes:
    """Uncompressed 1bpp bilevel BMP from a TOP-DOWN (h, w) 0/1 index
    image (stored bottom-up, MSB-first bit packing, rows padded to 4
    bytes) — test twin for the r11 bilevel decode path."""
    import struct

    h, w = indices.shape
    stride = ((w + 7) // 8 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        packed = np.packbits(
            np.asarray(indices[y], dtype=np.uint8)).tobytes()
        rows += packed + b"\x00" * (stride - len(packed))
    pal = np.zeros((2, 4), dtype=np.uint8)
    p = np.asarray(palette, dtype=np.uint8)
    pal[:len(p), :3] = p[:2, ::-1]
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 1, 0,
                       len(rows), 0, 0, 0, 0)
    body = info + pal.tobytes() + bytes(rows)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + len(body), 0, 0,
                           14 + len(info) + pal.nbytes)
    return file_hdr + body


def encode_bmp_pal4(indices: "np.ndarray", palette) -> bytes:
    """Uncompressed 4bpp palette BMP from a TOP-DOWN (h, w) uint8 index
    image (values < 16; stored bottom-up, packed rows padded to 4
    bytes) — test twin for the 4bpp palette decode path."""
    h, w = indices.shape
    stride = ((w + 1) // 2 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):
        packed = _pack_nibbles(indices[y])
        rows += packed + b"\x00" * (stride - len(packed))
    return _bmp4_wrap(w, h, palette, bytes(rows), 0)


def encode_bmp_rle4(indices: "np.ndarray", palette,
                    absolute_mode: bool = False) -> bytes:
    """BI_RLE4 BMP from a TOP-DOWN (h, w) uint8 index image (values
    < 16) — the test twin for _bmp_rle4_indices. Greedy encoded runs
    over ALTERNATING nibble pairs (a run byte carries two indices, so
    a run of [a,b,a,b,...] encodes as one op); with ``absolute_mode``
    non-repeating stretches of >= 3 pixels use the word-aligned
    absolute op. EOL after every row, EOB at the end (deltas covered
    by directed streams in the tests, as for RLE8)."""
    h, w = indices.shape
    stored = indices[::-1]
    out = bytearray()
    for y in range(h):
        row = stored[y]
        x = 0
        while x < w:
            # longest alternating-pair run starting at x
            a = int(row[x])
            b = int(row[x + 1]) if x + 1 < w else a
            run = 1
            while x + run < w and run < 255 and \
                    int(row[x + run]) == (a if run % 2 == 0 else b):
                run += 1
            if absolute_mode and run < 3:
                start = x
                while x < w and x - start < 255:
                    a2 = int(row[x])
                    b2 = int(row[x + 1]) if x + 1 < w else a2
                    r2 = 1
                    while x + r2 < w and \
                            int(row[x + r2]) == (a2 if r2 % 2 == 0
                                                 else b2):
                        r2 += 1
                    if r2 >= 3:
                        break
                    x += 1
                lit = row[start:x]
                if len(lit) >= 3:
                    packed = _pack_nibbles(lit)
                    out += bytes([0, len(lit)]) + packed
                    if len(packed) & 1:
                        out += b"\x00"  # word alignment pad
                else:
                    for v in lit:
                        out += bytes([1, int(v) << 4])
            else:
                out += bytes([run, (a << 4) | b])
                x += run
        if y < h - 1:
            out += b"\x00\x00"
    out += b"\x00\x01"
    return _bmp4_wrap(w, h, palette, bytes(out), 2)


def decode_bmp_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of uncompressed 24bpp BMP payloads:
    per-image width, height and per-channel (RGB) pixel means, padding
    and scanline order handled by ``_parse_bmp``. Malformed/unsupported
    payloads yield ok=false with zeroed stats — poison blobs must never
    kill the stage at 100 TB."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_bmp(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, px = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                # ascontiguousarray: px is a flipped/reversed view; one
                # copy, then the strided sums run on contiguous memory
                means = _channel_means(
                    np.ascontiguousarray(px).reshape(-1))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, BMP_STATS_SCHEMA)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth_predictor(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec §9, Filter type 4): pick whichever of
    left/up/up-left is closest to a + b - c, ties broken a, b, c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


# Adam7 interlace pass geometry: (xstart, ystart, xstep, ystep). Passes
# whose sub-image is empty for the given dims contribute NO bytes (not
# even filter bytes), per the spec.
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _png_defilter(raw: bytes, offset: int, ph: int, stride: int,
                  bpp: int) -> tuple["np.ndarray", int] | None:
    """Defilter one (sub-)image region of ``ph`` scanlines of ``stride``
    bytes each from the inflated stream at ``offset``: each line is
    reconstructed per its filter byte (None/Sub/Up/Average/Paeth)
    operating on BYTES with the ``bpp`` left-offset the spec prescribes.
    Sub is a per-byte-lane modular cumsum and Up a vectorized
    previous-row add; Average/Paeth carry a left-pixel dependency, so
    they fall back to a per-byte scan. Returns (bytes (ph, stride),
    next offset) or None on truncation/bad filter. Filtering context
    resets at the region start — exactly the per-pass independence
    Adam7 requires."""
    need = ph * (stride + 1)
    if len(raw) < offset + need:
        return None
    rows = (np.frombuffer(raw[offset:offset + need], dtype=np.uint8)
            .reshape(ph, stride + 1))
    out = np.zeros((ph, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(ph):
        ftype = int(rows[y, 0])
        row = rows[y, 1:]
        prev = out[y - 1] if y else zero_row
        if ftype == 0:    # None
            out[y] = row
        elif ftype == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]
            for c in range(bpp):
                out[y, c::bpp] = np.cumsum(row[c::bpp], dtype=np.uint8)
        elif ftype == 2:  # Up (uint8 add wraps mod 256, per spec)
            out[y] = row + prev
        elif ftype == 3:  # Average
            cur = out[y]
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = out[y]
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(row[i]) + _paeth_predictor(a, b, c)) & 0xFF
        else:
            return None
    return out, offset + need


def _png_unpack_samples(rows: "np.ndarray", pw: int, nch: int,
                        depth: int) -> "np.ndarray":
    """Packed defiltered bytes (ph, stride) -> samples (ph, pw, nch)
    uint8. Sub-byte depths unpack MSB-first; 16-bit keeps the high byte
    (the standard >>8 preview downsample)."""
    ph = rows.shape[0]
    if depth == 8:
        return rows[:, :pw * nch].reshape(ph, pw, nch)
    if depth == 16:
        return (np.ascontiguousarray(rows.reshape(ph, -1, 2)[:, :pw * nch, 0])
                .reshape(ph, pw, nch))
    # sub-byte (1/2/4, nch == 1): MSB-first bit groups within each byte
    bits = np.unpackbits(rows, axis=1)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits.reshape(ph, -1, depth) * weights).sum(
        axis=2, dtype=np.uint16).astype(np.uint8)
    return samples[:, :pw].reshape(ph, pw, 1)


def _parse_png(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Parse a PNG (all five color types — gray, RGB, palette,
    gray+alpha, RGBA — at 8-bit depth, 16-bit for the non-palette
    types, and sub-byte 1/2/4-bit for gray and palette; BOTH
    non-interlaced and Adam7-interlaced): returns (width, height,
    pixels) with pixels an (h, w, 3) uint8 RGB ndarray, or None outside
    the supported subset. REAL decode from the spec — stdlib ``zlib``
    inflates the concatenated IDAT stream, then each (sub-)image is
    defiltered per scanline (see _png_defilter); Adam7 walks the seven
    passes, each filtered independently, and scatters the sub-images
    into place with strided assignment. Gray replicates to RGB
    (sub-byte samples scale by 255/(2^d-1)); alpha channels drop;
    palette indices look up PLTE. CRCs are not verified (corrupt chunks
    surface as zlib errors or short data -> None)."""
    import struct
    import zlib

    if payload[:8] != PNG_MAGIC:
        return None
    pos = 8
    w = h = depth = ctype = interlace = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(payload):
        (size,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            return None
        if tag == b"IHDR":
            if size < 13:
                return None
            w, h, depth, ctype, comp, filt, interlace = struct.unpack_from(
                ">IIBBBBB", body, 0)
            if comp != 0 or filt != 0:
                return None
        elif tag == b"PLTE":
            if size % 3 != 0 or size == 0:
                return None
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + size  # length + tag + body + CRC
    if (w is None or not idat or w <= 0 or h <= 0
            or interlace not in (0, 1) or ctype not in (0, 2, 3, 4, 6)):
        return None
    if depth not in (1, 2, 4, 8, 16):
        return None
    if depth == 16 and ctype == 3:
        return None
    if depth < 8 and ctype not in (0, 3):  # sub-byte: gray/palette only
        return None
    if ctype == 3 and plte is None:
        return None
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = max(1, nch * depth // 8)  # filter left-offset in BYTES
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None

    def region(offset, pw, ph):
        stride = (pw * nch * depth + 7) // 8
        res = _png_defilter(raw, offset, ph, stride, bpp)
        if res is None:
            return None
        rows, offset = res
        return _png_unpack_samples(rows, pw, nch, depth), offset

    if interlace == 0:
        res = region(0, w, h)
        if res is None:
            return None
        px = res[0]
    else:
        px = np.zeros((h, w, nch), dtype=np.uint8)
        off = 0
        for xs, ys, xst, yst in _ADAM7:
            pw = max(0, (w - xs + xst - 1) // xst)
            ph = max(0, (h - ys + yst - 1) // yst)
            if pw == 0 or ph == 0:
                continue
            res = region(off, pw, ph)
            if res is None:
                return None
            sub, off = res
            px[ys::yst, xs::xst] = sub
    if ctype == 3:
        if int(px.max()) >= plte.shape[0]:
            return None
        px = plte[px[..., 0]]
    elif ctype in (0, 4):
        if depth < 8:  # scale to full range: 255 / (2^d - 1)
            px = px * np.uint16(255 // ((1 << depth) - 1))
            px = px.astype(np.uint8)
        px = np.repeat(px[..., :1], 3, axis=2)
    elif ctype == 6:
        px = px[..., :3]
    return w, h, np.ascontiguousarray(px)


def encode_png(pixels: "np.ndarray", filters: list[int] | None = None) -> bytes:
    """Minimal PNG encoder for test/fixture synthesis: 8-bit RGB,
    non-interlaced, one IDAT. ``filters`` picks the per-row filter type
    (default all 0) — applying the spec's filter forward so the decoder's
    defilter paths (Sub/Up/Average/Paeth) are exercised for real."""
    import struct
    import zlib

    h, w, _ = pixels.shape
    px = pixels.astype(np.int16)
    if filters is None:
        filters = [0] * h
    lines = bytearray()
    for y in range(h):
        ft = filters[y]
        row = px[y].reshape(-1)
        prev = px[y - 1].reshape(-1) if y else np.zeros(w * 3, dtype=np.int16)
        left = np.concatenate([np.zeros(3, dtype=np.int16), row[:-3]])
        upleft = np.concatenate([np.zeros(3, dtype=np.int16), prev[:-3]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - ((left + prev) >> 1)
        elif ft == 4:
            pred = np.array([_paeth_predictor(int(a), int(b), int(c))
                             for a, b, c in zip(left, prev, upleft)],
                            dtype=np.int16)
            filt = row - pred
        else:
            raise ValueError(f"bad filter {ft}")
        lines.append(ft)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(lines)))
            + chunk(b"IEND", b""))


def encode_png_ex(samples: "np.ndarray", depth: int = 8, ctype: int = 0,
                  palette: "np.ndarray | None" = None, interlace: int = 0,
                  filters: list[int] | None = None) -> bytes:
    """Extended PNG test encoder: gray (ctype 0) and palette (ctype 3)
    at depth 1/2/4/8, RGB (ctype 2) at 8 — optionally Adam7-interlaced
    (interlace=1, each pass filtered independently, empty passes
    skipped). ``samples`` is (h, w) for gray/palette or (h, w, 3) for
    RGB; ``filters`` cycles per scanline within each pass, applied
    generically on the PACKED bytes with the spec's bpp offset, so
    every defilter path can be exercised at every depth/interlace
    combination. Twin of _parse_png's extended subset."""
    import struct
    import zlib

    samples = np.asarray(samples)
    h, w = samples.shape[:2]
    nch = 3 if ctype == 2 else 1
    bpp = max(1, nch * depth // 8)
    filters = filters or [0]

    def pack_region(smp):
        ph, pw = smp.shape[:2]
        flat = smp.reshape(ph, pw * nch).astype(np.uint16)
        if depth == 8:
            rows_bytes = flat.astype(np.uint8)
        else:  # pack sub-byte samples MSB-first
            spb = 8 // depth
            pad = (-pw * nch) % spb
            padded = np.pad(flat, ((0, 0), (0, pad)))
            weights = 1 << (depth * np.arange(spb - 1, -1, -1))
            rows_bytes = (padded.reshape(ph, -1, spb) * weights).sum(
                axis=2).astype(np.uint8)
        out = bytearray()
        prev = np.zeros(rows_bytes.shape[1], dtype=np.int16)
        for y in range(ph):
            row = rows_bytes[y].astype(np.int16)
            ft = filters[y % len(filters)]
            left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]]) \
                if row.size else row
            upleft = np.concatenate([np.zeros(bpp, np.int16),
                                     prev[:-bpp]]) if row.size else prev
            if ft == 0:
                filt = row
            elif ft == 1:
                filt = row - left
            elif ft == 2:
                filt = row - prev
            elif ft == 3:
                filt = row - ((left + prev) >> 1)
            elif ft == 4:
                pred = np.array(
                    [_paeth_predictor(int(a), int(b), int(c))
                     for a, b, c in zip(left, prev, upleft)],
                    dtype=np.int16)
                filt = row - pred
            else:
                raise ValueError(f"bad filter {ft}")
            out.append(ft)
            out += (filt & 0xFF).astype(np.uint8).tobytes()
            prev = row
        return bytes(out)

    if interlace == 0:
        data = pack_region(samples)
    else:
        parts = []
        for xs, ys, xst, yst in _ADAM7:
            sub = samples[ys::yst, xs::xst]
            if sub.shape[0] and sub.shape[1]:
                parts.append(pack_region(sub))
        data = b"".join(parts)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    out = PNG_MAGIC + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                             interlace))
    if ctype == 3:
        out += chunk(b"PLTE",
                     np.asarray(palette, dtype=np.uint8).tobytes())
    return out + chunk(b"IDAT", zlib.compress(data)) + chunk(b"IEND", b"")


PNG_STATS_SCHEMA = PPM_STATS_SCHEMA


def decode_png_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of PNG payloads (8-bit gray/RGB/RGBA,
    non-interlaced): per-image width, height and per-channel (RGB) pixel
    means — inflate + defilter handled by ``_parse_png``. Malformed or
    out-of-subset payloads yield ok=false with zeroed stats — poison
    blobs must never kill the stage at 100 TB."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_png(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, px = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                means = _channel_means(px.reshape(-1))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, PNG_STATS_SCHEMA)


WAV_STATS_SCHEMA = ("doc_id long, sample_rate int, n_channels int, "
                    "n_samples int, ok boolean, mean_amp double, "
                    "sum_sq long")


# IMA/DVI ADPCM step-size and index-adaptation tables (public IMA
# "Recommended Practices for Enhancing Digital Audio Compatibility"
# rev 3.00, 1992 — the same 89-entry table every implementation ships).
IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767], dtype=np.int32)
IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8] * 2,
                           dtype=np.int32)


def _ima_adpcm_decode_blocks(data: bytes,
                             block_align: int) -> "np.ndarray | None":
    """REAL IMA/DVI ADPCM decode (WAV audio_format=0x11, mono): each
    ``block_align``-byte block carries a 4-byte header (int16 seed
    predictor, uint8 step index, reserved) plus 4-bit nibbles, LOW
    nibble first. The sample recurrence is inherently sequential WITHIN
    a block (predictor and step index both feed forward), so the
    vectorization axis is ACROSS blocks: one Python iteration per
    nibble position updates every block's state as a numpy lane —
    (n_blocks) wide per step instead of per-sample interpretation, the
    same across-the-batch trick as the JPEG restart segments. Trailing
    partial blocks are dropped (poison-safe truncation); a malformed
    header index returns None."""
    n_blocks = len(data) // block_align
    if n_blocks == 0:
        return None
    if n_blocks < 16:
        # numpy lane steps cost ~µs of dispatch each — on a clip of a
        # few blocks the (identical) scalar walk is 50x+ faster; the
        # two paths are pinned equal in tests
        return _ima_adpcm_decode_scalar(data, block_align, n_blocks)
    blocks = np.frombuffer(
        data[:n_blocks * block_align],
        dtype=np.uint8).reshape(n_blocks, block_align)
    pred = blocks[:, 0:2].copy().view("<i2")[:, 0].astype(np.int32)
    index = blocks[:, 2].astype(np.int32)
    if (index > 88).any():
        return None
    nib_bytes = blocks[:, 4:]
    n_nib = nib_bytes.shape[1] * 2
    nib = np.empty((n_blocks, n_nib), dtype=np.int32)
    nib[:, 0::2] = nib_bytes & 0x0F          # low nibble first
    nib[:, 1::2] = nib_bytes >> 4
    out = np.empty((n_blocks, n_nib + 1), dtype=np.int16)
    out[:, 0] = pred
    for j in range(n_nib):
        n = nib[:, j]
        step = IMA_STEP_TABLE[index]
        vpdiff = (step >> 3)
        vpdiff = vpdiff + np.where(n & 4, step, 0)
        vpdiff = vpdiff + np.where(n & 2, step >> 1, 0)
        vpdiff = vpdiff + np.where(n & 1, step >> 2, 0)
        pred = np.where(n & 8, pred - vpdiff, pred + vpdiff)
        pred = np.clip(pred, -32768, 32767)
        index = np.clip(index + IMA_INDEX_TABLE[n], 0, 88)
        out[:, j + 1] = pred
    return out.reshape(-1)


_IMA_STEP_LIST = [int(v) for v in IMA_STEP_TABLE]
_IMA_INDEX_LIST = [int(v) for v in IMA_INDEX_TABLE]


def _ima_adpcm_decode_scalar(data: bytes, block_align: int,
                             n_blocks: int) -> "np.ndarray | None":
    """Scalar twin of the lane decoder for short clips (same recurrence,
    plain ints — no per-step numpy dispatch overhead)."""
    n_nib = (block_align - 4) * 2
    out = np.empty(n_blocks * (n_nib + 1), dtype=np.int16)
    k = 0
    for b0 in range(0, n_blocks * block_align, block_align):
        blk = data[b0:b0 + block_align]
        pred = int.from_bytes(blk[0:2], "little", signed=True)
        idx = blk[2]
        if idx > 88:
            return None
        out[k] = pred
        k += 1
        for byte in blk[4:]:
            for n in (byte & 0x0F, byte >> 4):
                step = _IMA_STEP_LIST[idx]
                vp = step >> 3
                if n & 4:
                    vp += step
                if n & 2:
                    vp += step >> 1
                if n & 1:
                    vp += step >> 2
                pred = pred - vp if n & 8 else pred + vp
                pred = -32768 if pred < -32768 else (
                    32767 if pred > 32767 else pred)
                idx += _IMA_INDEX_LIST[n]
                idx = 0 if idx < 0 else (88 if idx > 88 else idx)
                out[k] = pred
                k += 1
    return out


def encode_wav_adpcm(samples: "np.ndarray", rate: int = 8000,
                     block_samples: int = 65) -> bytes:
    """Minimal mono IMA ADPCM WAV writer for test/oracle payload
    synthesis: the standard greedy quantizer (successive step halving
    against |diff|) with state carried across blocks, each block
    re-seeding its header from the running (predictor, index). Written
    from the IMA recommended practices like the decoder — and kept
    per-sample Python on purpose, so the roundtrip pins the vectorized
    decoder against an independent construction."""
    import struct

    assert block_samples % 2 == 1, "header sample + even nibble count"
    n_nib = block_samples - 1
    block_align = 4 + n_nib // 2
    samples = np.asarray(samples, dtype=np.int64)
    pred, index = 0, 0
    blocks = []
    for start in range(0, len(samples), block_samples):
        chunk = samples[start:start + block_samples]
        if len(chunk) < block_samples:
            break  # encoder emits full blocks only
        pred = int(np.clip(chunk[0], -32768, 32767))
        body = [struct.pack("<hBB", pred, index, 0)]
        nibs = []
        for s in chunk[1:]:
            step = int(IMA_STEP_TABLE[index])
            diff = int(s) - pred
            code = 8 if diff < 0 else 0
            diff = abs(diff)
            vpdiff = step >> 3
            if diff >= step:
                code |= 4
                diff -= step
                vpdiff += step
            step >>= 1
            if diff >= step:
                code |= 2
                diff -= step
                vpdiff += step
            step >>= 1
            if diff >= step:
                code |= 1
                vpdiff += step
            pred = pred - vpdiff if code & 8 else pred + vpdiff
            pred = max(-32768, min(32767, pred))
            index = max(0, min(88, index + int(IMA_INDEX_TABLE[code])))
            nibs.append(code)
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            body.append(bytes([lo | (hi << 4)]))
        blocks.append(b"".join(body))
    data = b"".join(blocks)
    byte_rate = rate * block_align // block_samples
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate, byte_rate,
                      block_align, 4, 2, block_samples)
    riff = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _parse_wav(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Parse a PCM16 WAV (RIFF) payload: returns (sample_rate, n_channels,
    samples-as-int16-ndarray) or None if malformed. REAL decode of the
    canonical RIFF/fmt/data chunk layout — stdlib ``struct`` for the
    headers, one zero-copy ``np.frombuffer`` for the sample block (the
    per-sample unpack loop was interpreter-bound). Decodes uncompressed
    PCM16 (audio_format=1, 16-bit) and both G.711 companded encodings —
    mu-law (audio_format=7) and A-law (audio_format=6), 8-bit, REAL
    vectorized expansion; other encodings return None (the documented
    stub boundary).
    """
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, rate, channels, bits, fmt = 12, None, None, None, None
    block_align = None
    samples: np.ndarray | None = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if chunk_id == b"fmt " and len(body) >= 16:
            fmt, channels, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
        elif chunk_id == b"data":
            if len(body) < size:
                return None
            if fmt == 1 and bits == 16:
                samples = np.frombuffer(body[:2 * (size // 2)], dtype="<i2")
            elif fmt == 7 and bits == 8:
                # G.711 mu-law expansion (ITU-T, BIAS 0x84), fully
                # vectorized: complement, then
                # t = ((mantissa<<3)+132) << exponent; sign bit of the
                # complemented byte selects 132-t (negative) vs t-132.
                # Table anchors: 0x80 -> +32124, 0x00 -> -32124,
                # 0xFF/0x7F -> 0 (pinned in tests).
                u = (~np.frombuffer(body[:size], dtype=np.uint8)
                     ).astype(np.int32) & 0xFF
                t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
                samples = np.where(u & 0x80, 0x84 - t, t - 0x84)                     .astype(np.int16)
            elif fmt == 6 and bits == 8:
                # G.711 A-law expansion, vectorized: XOR 0x55, then
                # segment 0 -> (mant<<4)+8, else ((mant<<4)+264)<<(seg-1);
                # sign bit of the XORed byte SET means positive.
                # Table anchors: 0xD5 -> +8 (silence), 0x55 -> -8,
                # 0xAA -> +32256 (max) — pinned in tests.
                u = np.frombuffer(body[:size],
                                  dtype=np.uint8).astype(np.int32) ^ 0x55
                seg = (u >> 4) & 0x07
                mant = u & 0x0F
                val = np.where(seg == 0, (mant << 4) + 8,
                               ((mant << 4) + 0x108)
                               << np.maximum(seg - 1, 0))
                samples = np.where(u & 0x80, val, -val).astype(np.int16)
            elif (fmt == 0x11 and bits == 4 and channels == 1
                  and block_align and block_align > 4):
                samples = _ima_adpcm_decode_blocks(body, block_align)
                if samples is None:
                    return None
            else:
                return None
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or channels is None or samples is None:
        return None
    return rate, channels, samples


def decode_wav_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of PCM16 WAV payloads: header fields plus
    per-clip amplitude stats (mean sample value and exact sum of squares —
    the integer core of an RMS/loudness featurizer). Malformed payloads
    yield ok=false with zeroed stats — poison blobs must never kill the
    stage at 100 TB."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "sample_rate", "n_channels", "n_samples",
                     "ok", "mean_amp", "sum_sq")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_wav(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    for k, v in (("sample_rate", 0), ("n_channels", 0),
                                 ("n_samples", 0), ("ok", False),
                                 ("mean_amp", 0.0), ("sum_sq", 0)):
                        rows[k].append(v)
                    continue
                rate, channels, samples = parsed
                n = int(samples.size)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(channels)
                rows["n_samples"].append(n)
                rows["ok"].append(True)
                # int64 accumulate: exact (no float rounding in sum_sq) and
                # one C-side dot instead of a Python per-sample loop
                s64 = samples.astype(np.int64)
                rows["mean_amp"].append(
                    float(s64.sum()) / float(n) if n else 0.0)
                rows["sum_sq"].append(int(np.dot(s64, s64)))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, WAV_STATS_SCHEMA)


# --------------------------------------------------------------------------
# JPEG (JFIF) — REAL decode from ITU-T T.81: marker walk, canonical
# Huffman entropy decode (with 0xFF00 byte-stuffing and RSTn restart
# handling), dequantize + zigzag, 8x8 matrix IDCT, replicate chroma
# upsampling, JFIF YCbCr->RGB. Both baseline sequential (SOF0) and
# progressive (SOF2, Annex G: spectral-selection bands, successive-
# approximation DC/AC first + refinement scans, EOBn end-of-band runs)
# decode; arithmetic coding and 12-bit depth return None — the
# documented boundary. Entropy decode is inherently bit-serial, so the
# hot loop is Python-per-symbol; the block math (dequant/IDCT/color
# convert) is numpy over all blocks at once.
# --------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# orthonormal 8-point DCT-II basis: pixels = _IDCT_M.T @ coeffs @ _IDCT_M
_IDCT_M = np.array(
    [[(np.sqrt(1 / 8.0) if u == 0 else np.sqrt(2 / 8.0))
      * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
     for u in range(8)])

# Annex K (ITU-T T.81) typical Huffman tables, used by the test encoder;
# the decoder builds whatever tables the stream's DHT segments declare.
_STD_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_STD_DC_LUMA_VALS = list(range(12))
_STD_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_STD_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _huff_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(code_length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Inverse view for the encoder: {symbol: (code_length, code)}."""
    return {sym: lc for lc, sym in _huff_table(bits, vals).items()}


def _entropy_segments(payload: bytes, pos: int) \
        -> tuple[list["np.ndarray"], int]:
    """Split the entropy-coded stream starting at ``pos`` into restart
    segments: un-stuffs 0xFF00 (keeping the 0xFF), drops 0xFF fill
    bytes, cuts a segment boundary at each RSTn marker, and stops at any
    other marker. Returns (segments, end) where ``end`` is the offset of
    the terminating marker's 0xFF (len(payload) if none) so a multi-scan
    progressive walk can resume the marker parse there. The scan walks
    only the 0xFF positions (numpy-found), not every byte — on
    compressed data that is ~1/256 of the stream."""
    a = np.frombuffer(payload, dtype=np.uint8)
    n = a.size
    segs: list[np.ndarray] = []
    parts: list[np.ndarray] = []
    i = pos
    end = n
    for j in np.nonzero(a[pos:] == 0xFF)[0]:
        j = int(j) + pos
        if j < i:
            continue  # inside bytes already consumed (stuffed 0x00)
        nxt = int(a[j + 1]) if j + 1 < n else None
        if nxt == 0x00:
            parts.append(a[i:j + 1])      # keep the 0xFF
            i = j + 2                     # skip the stuffed 0x00
        elif nxt == 0xFF:
            parts.append(a[i:j])          # fill byte before a marker
            i = j + 1
        elif nxt is not None and 0xD0 <= nxt <= 0xD7:
            parts.append(a[i:j])          # RSTn: segment boundary
            segs.append(np.concatenate(parts) if parts else a[:0])
            parts = []
            i = j + 2
        else:
            parts.append(a[i:j])          # real marker (or truncated FF)
            end = j
            i = n
            break
    if i < n:
        parts.append(a[i:n])
    segs.append(np.concatenate(parts) if parts else a[:0])
    return segs, end


def _huff_lut(table: dict[tuple[int, int], int]) -> tuple["np.ndarray",
                                                          "np.ndarray"]:
    """Flatten a canonical Huffman table into a 2^16 peek LUT:
    ``lut_sym[peek16]`` / ``lut_len[peek16]`` give the symbol and its
    code length for ANY 16 upcoming bits (len 0 = invalid code). The
    classic table-driven decode — one array index replaces up to 16
    bit-by-bit tree steps."""
    lut_sym = np.zeros(1 << 16, dtype=np.int16)
    lut_len = np.zeros(1 << 16, dtype=np.uint8)
    for (length, code), sym in table.items():
        lo = code << (16 - length)
        hi = (code + 1) << (16 - length)
        lut_sym[lo:hi] = sym
        lut_len[lo:hi] = length
    return lut_sym, lut_len


# LUTs keyed by table content, cached across images: a corpus's JPEGs
# overwhelmingly share their DHT segments (most encoders emit the Annex K
# tables), so the 2^16-entry flatten is paid once per distinct table per
# executor, not once per image — without this, tiny images were dominated
# by LUT construction. Bounded (clear-on-overflow) so adversarial streams
# with unique tables can't grow executor memory.
_LUT_CACHE: dict[tuple, tuple] = {}


def _huff_lut_cached(table: dict[tuple[int, int], int]) -> tuple:
    key = tuple(sorted(table.items()))
    hit = _LUT_CACHE.get(key)
    if hit is None:
        if len(_LUT_CACHE) >= 64:
            _LUT_CACHE.clear()
        hit = _LUT_CACHE[key] = _huff_lut(table)
    return hit


class _BitReader:
    """Table-driven MSB-first reader over entropy-coded JPEG data. The
    stream is pre-split into restart segments (stuffing/markers handled
    once, array-at-a-time, in ``_entropy_segments``); per segment a
    rolling 16-bit peek array is precomputed, so ``decode_symbol`` is
    one LUT index + a bounds check and ``receive`` one shift — replacing
    the bit-at-a-time tree walk whose Python-per-bit loop dominated
    mm_decode_jpeg's bench time. Symbol decode takes the (lut_sym,
    lut_len) pair from ``_huff_lut``."""

    _POW2 = (1 << np.arange(15, -1, -1)).astype(np.int64)

    def __init__(self, payload: bytes, pos: int):
        self.segs, self.end = _entropy_segments(payload, pos)
        self.seg = 0
        self._load()

    # Below this many bytes a segment skips the numpy peek-array build:
    # tiny segments (small images, short restart intervals, progressive
    # scans over few blocks) were dominated by the FIXED cost of
    # unpackbits + sliding_window_view + matmul per segment. A Python
    # bigint carries the whole segment instead; peeks are one shift+mask
    # (O(segment) per shift, so only safe for small segments — large
    # streams keep the O(1)-per-peek precomputed array).
    _INT_PATH_MAX_BYTES = 2048

    def _load(self) -> None:
        if self.seg >= len(self.segs):
            self.peek = None
            self.big = None
            self.nbits = 0
            self.pos = 0
            return
        seg = self.segs[self.seg]
        self.pos = 0
        self.nbits = int(seg.size) * 8
        if seg.size <= self._INT_PATH_MAX_BYTES:
            # 16 zero bits appended so a peek at the tail stays valid
            self.big = int.from_bytes(seg.tobytes(), "big") << 16
            self.peek = None
            return
        from numpy.lib.stride_tricks import sliding_window_view

        bits = np.unpackbits(seg)
        padded = np.concatenate([bits, np.zeros(16, dtype=np.uint8)])
        self.peek = sliding_window_view(padded, 16) @ self._POW2
        self.big = None

    def _peek16(self) -> int:
        if self.peek is not None:
            return int(self.peek[self.pos])
        return (self.big >> (self.nbits - self.pos)) & 0xFFFF

    def decode_symbol(self, lut: tuple["np.ndarray", "np.ndarray"]) \
            -> int | None:
        if (self.peek is None and self.big is None) \
                or self.pos >= self.nbits:
            return None
        v = self._peek16()
        ln = int(lut[1][v])
        if ln == 0 or self.pos + ln > self.nbits:
            return None
        self.pos += ln
        return int(lut[0][v])

    def receive(self, nbits: int) -> int | None:
        if nbits == 0:
            return 0
        if (self.peek is None and self.big is None) \
                or self.pos + nbits > self.nbits:
            return None
        v = self._peek16() >> (16 - nbits)
        self.pos += nbits
        return v

    def restart(self) -> None:
        """Advance to the next restart segment (byte alignment and RSTn
        consumption happened in the pre-split)."""
        self.seg += 1
        self._load()


def _extend(v: int, s: int) -> int:
    """JPEG EXTEND (T.81 F.2.2.1): map s received bits to a signed
    coefficient value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _parse_jpeg(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Parse a JFIF JPEG: returns (width, height, pixels) with pixels an
    (h, w, 3) uint8 RGB ndarray, or None outside the supported subset
    (SOF0 baseline sequential or SOF2 progressive, 8-bit, 1 or 3
    components, Huffman coding; DRI/RSTn honored). Progressive decode
    (T.81 Annex G): the marker walk loops over every SOS, each scan
    merging its spectral band / successive-approximation bits into
    shared per-component coefficient grids, and reconstruction runs once
    at EOI. See the section banner for the pipeline and the remaining
    (arithmetic-coded, 12-bit) boundary."""
    import struct

    if payload[:2] != b"\xFF\xD8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None  # (w, h, comps) comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    progressive = False
    blocks: dict[int, np.ndarray] = {}
    got_scan = False
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte padding before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            return None
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            return None
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:  # 16-bit tables unsupported
                    return None
                if i + 65 > len(body):
                    return None
                qt[tq] = np.frombuffer(body[i + 1:i + 65],
                                       dtype=np.uint8).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = list(body[i + 17:i + 17 + nv])
                if len(vals) != nv:
                    return None
                huff[(tc, th)] = _huff_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                return None
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8 or nc not in (1, 3) or w == 0 or h == 0:
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    return None
                comps.append((cid, hs, vs, tq))
            frame = (w, h, comps)
            if progressive:
                # shared coefficient grids, merged across scans
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                for cid, hs, vs, tq in comps:
                    blocks[cid] = np.zeros((mcuy * vs, mcux * hs, 64),
                                           dtype=np.int32)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/arithmetic/lossless SOF
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                return None
            if progressive:
                scomps = [(body[1 + 2 * s], body[2 + 2 * s] >> 4,
                           body[2 + 2 * s] & 0x0F) for s in range(ns)]
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                newpos = _decode_progressive_scan(
                    payload, pos + 2 + seglen, frame, huff, blocks,
                    scomps, ss, se, ah, al, restart_interval)
                if newpos is None:
                    return None
                got_scan = True
                pos = newpos
                continue
            scan_sel = {}
            for s in range(ns):
                cs, tables = body[1 + 2 * s], body[2 + 2 * s]
                scan_sel[cs] = (tables >> 4, tables & 0x0F)
            return _decode_scan(payload, pos + 2 + seglen, frame, qt,
                                huff, scan_sel, restart_interval)
        pos += 2 + seglen
    if progressive and frame is not None and got_scan:
        return _reconstruct(frame, qt, blocks)
    return None


def _decode_scan(payload, pos, frame, qt, huff, scan_sel, restart_interval):
    w, h, comps = frame
    if any(c[0] not in scan_sel for c in comps):
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    reader = _BitReader(payload, pos)
    # per component: block grid (mcuy*vs, mcux*hs) of 8x8 coeff blocks
    blocks = {}
    for cid, hs, vs, tq in comps:
        if hs == 0 or vs == 0 or tq not in qt:
            return None
        blocks[cid] = np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
    # flatten each referenced Huffman table into its peek LUT once
    luts: dict[tuple[int, int], tuple] = {}
    sel_luts: dict[int, tuple] = {}
    for cid, hs, vs, tq in comps:
        pair = []
        for key in ((0, scan_sel[cid][0]), (1, scan_sel[cid][1])):
            t = huff.get(key)
            if t is None:
                return None
            if key not in luts:
                luts[key] = _huff_lut_cached(t)
            pair.append(luts[key])
        sel_luts[cid] = tuple(pair)
    pred = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.restart()
                pred = {c[0]: 0 for c in comps}
            for cid, hs, vs, tq in comps:
                dc_t, ac_t = sel_luts[cid]
                for by in range(vs):
                    for bx in range(hs):
                        blk = blocks[cid][my * vs + by, mx * hs + bx]
                        s = reader.decode_symbol(dc_t)
                        if s is None:
                            return None
                        if s:
                            v = reader.receive(s)
                            if v is None:
                                return None
                            pred[cid] += _extend(v, s)
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_t)
                            if rs is None:
                                return None
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                return None
                            v = reader.receive(size)
                            if v is None:
                                return None
                            blk[k] = _extend(v, size)
                            k += 1
            mcu_count += 1
    return _reconstruct(frame, qt, blocks)


def _reconstruct(frame, qt, blocks):
    """Shared back half of both JPEG modes: dequantize + un-zigzag +
    matrix IDCT (vectorized over all blocks at once), replicate chroma
    upsample, crop, YCbCr->RGB."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = {}
    for cid, hs, vs, tq in comps:
        if tq not in qt or cid not in blocks:
            return None
        flat = blocks[cid].reshape(-1, 64) * qt[tq][None, :]
        sq = np.zeros_like(flat)
        sq[:, _ZIGZAG] = flat
        co = sq.reshape(-1, 8, 8).astype(np.float64)
        px = np.einsum("ux,nuv,vy->nxy", _IDCT_M, co, _IDCT_M) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        gy, gx = blocks[cid].shape[:2]
        plane = (px.reshape(gy, gx, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(gy * 8, gx * 8))
        # replicate-upsample to full MCU-grid resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                          hmax // hs, axis=1) \
            if (hmax % hs == 0 and vmax % vs == 0) else None
        if plane is None:
            return None
        planes[cid] = plane[:h, :w]
    if len(comps) == 1:
        return w, h, np.repeat(planes[comps[0][0]][..., None], 3, axis=2)
    y, cb, cr = (planes[c[0]].astype(np.float64) for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_progressive_scan(payload, pos, frame, huff, blocks,
                             scomps, ss, se, ah, al, restart_interval):
    """Decode ONE progressive scan (T.81 Annex G, Huffman) into the
    shared per-component coefficient grids, merging with what earlier
    scans produced. Handles all four scan kinds: DC first (diff decode,
    value << Al), DC refinement (one bit per block ORed into bit Al),
    AC first (run-length with EOBn end-of-band runs, spectral band
    Ss..Se), and AC refinement (G.1.2.3 correction-bit walk — the same
    control flow as libjpeg's decode_mcu_AC_refine, reimplemented from
    the spec). DC scans may interleave components; AC scans are
    non-interleaved per G.1.1.1.1 and iterate the component's OWN
    ceil-sized block grid, not the MCU-padded one. Returns the payload
    offset of the marker terminating the scan's entropy data (so the
    caller resumes the marker walk), or None on malformed input."""
    w, h, comps = frame
    byid = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if not scomps or len(scomps) > len(comps):
        return None
    if any(cs not in byid or cs not in blocks for cs, _, _ in scomps):
        return None
    reader = _BitReader(payload, pos)

    def refine_nonzero(blk, k, p1, m1):
        """Correction bit for an already-nonzero coefficient."""
        b = reader.receive(1)
        if b is None:
            return False
        if b and (int(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] >= 0 else m1
        return True

    if ss == 0:  # DC scan (spectral band must be exactly {0})
        if se != 0 or ah > 13 or al > 13 or (ah and ah != al + 1):
            return None
        luts = {}
        if ah == 0:
            for cs, td, _ta in scomps:
                t = huff.get((0, td))
                if t is None:
                    return None
                luts[cs] = _huff_lut_cached(t)
        pred = {cs: 0 for cs, _, _ in scomps}

        def dc_unit(cs, blk):
            if ah == 0:
                s = reader.decode_symbol(luts[cs])
                if s is None or s > 15:
                    return False
                if s:
                    v = reader.receive(s)
                    if v is None:
                        return False
                    pred[cs] += _extend(v, s)
                blk[0] = pred[cs] << al
            else:
                b = reader.receive(1)
                if b is None:
                    return False
                if b:
                    blk[0] |= (1 << al)
            return True

        if len(scomps) == 1:  # non-interleaved: the comp's own grid
            cs = scomps[0][0]
            _cid, hs, vs, _tq = byid[cs]
            bw = -(-(w * hs) // (8 * hmax))
            bh = -(-(h * vs) // (8 * vmax))
            grid = blocks[cs]
            nblk = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and nblk and \
                            nblk % restart_interval == 0:
                        reader.restart()
                        pred = {cs: 0}
                    nblk += 1
                    if not dc_unit(cs, grid[by, bx]):
                        return None
        else:  # interleaved MCU order
            nmcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and nmcu and \
                            nmcu % restart_interval == 0:
                        reader.restart()
                        pred = {cs: 0 for cs, _, _ in scomps}
                    nmcu += 1
                    for cs, _td, _ta in scomps:
                        _cid, hs, vs, _tq = byid[cs]
                        for by in range(vs):
                            for bx in range(hs):
                                blk = blocks[cs][my * vs + by,
                                                 mx * hs + bx]
                                if not dc_unit(cs, blk):
                                    return None
        return reader.end

    # AC scan: single component, band Ss..Se
    if len(scomps) != 1 or ss > se or se > 63 or al > 13 or \
            (ah and ah != al + 1):
        return None
    cs, _td, ta = scomps[0]
    t = huff.get((1, ta))
    if t is None:
        return None
    ac_lut = _huff_lut_cached(t)
    _cid, hs, vs, _tq = byid[cs]
    bw = -(-(w * hs) // (8 * hmax))
    bh = -(-(h * vs) // (8 * vmax))
    grid = blocks[cs]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    nblk = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and nblk and \
                    nblk % restart_interval == 0:
                reader.restart()
                eobrun = 0
            nblk += 1
            blk = grid[by, bx]
            if ah == 0:  # AC first scan at this bit position
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.decode_symbol(ac_lut)
                    if rs is None:
                        return None
                    r, size = rs >> 4, rs & 0x0F
                    if size == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1  # EOBn: this block + n-1
                        if r:
                            v = reader.receive(r)
                            if v is None:
                                return None
                            eobrun += v
                        break
                    k += r
                    if k > se:
                        return None
                    v = reader.receive(size)
                    if v is None:
                        return None
                    blk[k] = _extend(v, size) << al
                    k += 1
            else:  # AC refinement (G.1.2.3)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.decode_symbol(ac_lut)
                        if rs is None:
                            return None
                        r, size = rs >> 4, rs & 0x0F
                        newval = 0
                        if size == 0:
                            if r < 15:  # EOBn (correction bits follow)
                                eobrun = 1 << r
                                if r:
                                    v = reader.receive(r)
                                    if v is None:
                                        return None
                                    eobrun += v
                                break
                            # r == 15: ZRL — skip 16 zero-history coefs
                        else:
                            if size != 1:
                                return None
                            b = reader.receive(1)
                            if b is None:
                                return None
                            newval = p1 if b else m1
                        # advance over nonzero-history coefs (append a
                        # correction bit to each) and r zero-history ones
                        while k <= se:
                            if blk[k] != 0:
                                if not refine_nonzero(blk, k, p1, m1):
                                    return None
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:
                                return None
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    # end-of-band: remaining nonzero coefs still carry
                    # correction bits (for this and eobrun-1 more blocks)
                    while k <= se:
                        if blk[k] != 0:
                            if not refine_nonzero(blk, k, p1, m1):
                                return None
                        k += 1
                    eobrun -= 1
    return reader.end


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        # bulk-shift: append the whole code, then peel complete bytes
        # (measured ~6x over the former bit-at-a-time loop — this is
        # the hot path of every JPEG fixture-encode stage)
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s per spec
        return bytes(self.out)


def encode_jpeg_dc(blocks: "np.ndarray", block_w: int,
                   gray: bool = True, restart_every: int = 0) -> bytes:
    """Minimal baseline-JFIF encoder for test/fixture synthesis: every
    8x8 block is UNIFORM (one value per block, level-shifted DC only, all
    quant entries 1), so decode is exactly lossless — DCT of a constant
    block is pure DC, which survives quantize/dequantize/IDCT bit-exactly.
    ``blocks`` is a (n_blocks,) uint8 array of per-block values laid out
    row-major on a ``block_w``-wide grid; gray=False triplicates them as
    Y with flat chroma (a color 4:4:4 stream whose RGB equals the Y
    plane). Standard Annex K tables; one interleaved scan."""
    import struct

    bh = len(blocks) // block_w
    assert bh * block_w == len(blocks)
    w, h = block_w * 8, bh * 8
    dc_codes = _huff_codes(_STD_DC_LUMA_BITS, _STD_DC_LUMA_VALS)
    ac_codes = _huff_codes(_STD_AC_LUMA_BITS, _STD_AC_LUMA_VALS)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    ncomp = 1 if gray else 3
    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, b"\x00" + bytes([1] * 64))  # DQT id 0, all ones
    if restart_every:
        out += seg(0xDD, struct.pack(">H", restart_every))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for c in range(ncomp):
        sof += struct.pack(">BBB", c + 1, 0x11, 0)
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(_STD_DC_LUMA_BITS)
               + bytes(_STD_DC_LUMA_VALS))
    out += seg(0xC4, b"\x10" + bytes(_STD_AC_LUMA_BITS)
               + bytes(_STD_AC_LUMA_VALS))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += b"\x00\x3F\x00"
    out += seg(0xDA, sos)

    wr = _BitWriter()
    pred = [0] * ncomp
    eob_len, eob_code = ac_codes[0x00]

    def put_dc(comp: int, dc: int) -> None:
        diff = dc - pred[comp]
        pred[comp] = dc
        mag = abs(diff)
        s = mag.bit_length()
        length, code = dc_codes[s]
        wr.write(code, length)
        if s:
            wr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        wr.write(eob_code, eob_len)

    rst = 0
    for i, val in enumerate(blocks):
        if restart_every and i and i % restart_every == 0:
            if wr.n:  # 0-pad to the byte: can't create a stuffed 0xFF
                wr.write(0, 8 - wr.n)
            wr.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            pred[:] = [0] * ncomp
        dc = 8 * (int(val) - 128)
        put_dc(0, dc)
        if not gray:
            put_dc(1, 0)  # flat Cb=128
            put_dc(2, 0)  # flat Cr=128
    out += wr.flush()
    out += b"\xFF\xD9"
    return bytes(out)


# --------------------------------------------------------------------------
# Full-coefficient JPEG test encoders (baseline AND progressive). Unlike
# encode_jpeg_dc (uniform DC-only blocks), these take ARBITRARY quantized
# coefficient blocks, so the equivalence pin "progressive decode ==
# baseline decode of the same coefficients" exercises every entropy path:
# spectral-selection bands, successive-approximation first/refinement
# scans, EOBn runs with buffered correction bits, ZRL-vs-EOB folding, and
# restarts. Per-scan Huffman tables are built from the scan's own symbol
# set (every distinct symbol at code length 8 — canonical and valid since
# a scan never emits >255 distinct symbols, and code 0xFF is never
# reached). The AC refinement emitter follows T.81 G.1.2.3 (the same
# buffered-bit control flow libjpeg uses), reimplemented from the spec.
# --------------------------------------------------------------------------


def _scan_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """Canonical one-length Huffman table covering a scan's symbols:
    returns (bits, vals, codes) with codes {sym: (length, code)}."""
    syms = sorted(set(symbols))
    assert 0 < len(syms) <= 255
    bits = [0] * 16
    bits[7] = len(syms)
    codes = {s: (8, i) for i, s in enumerate(syms)}
    return bits, syms, codes


def _seg(marker: int, body: bytes) -> bytes:
    import struct
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _jpeg_frame_header(w, h, comps_geo, sof_marker, restart_every):
    import struct
    out = bytearray(b"\xFF\xD8")
    out += _seg(0xDB, b"\x00" + bytes([1] * 64))  # unit quant, id 0
    if restart_every:
        out += _seg(0xDD, struct.pack(">H", restart_every))
    sof = struct.pack(">BHHB", 8, h, w, len(comps_geo))
    for i, (hs, vs) in enumerate(comps_geo):
        sof += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0)
    out += _seg(sof_marker, sof)
    return out


def _write_scan_ops(ops: list) -> bytes:
    """Second pass: materialize a scan's op list (symbols resolved via
    the table built from pass one) into stuffed entropy bytes."""
    wr = _BitWriter()
    rst = 0
    for op in ops:
        if op[0] == "s":
            ln, code = op[2][op[1]]
            wr.write(code, ln)
        elif op[0] == "b":
            wr.write(op[1], op[2])
        else:  # restart: 1-pad to byte (stuffing handled by the writer)
            if wr.n:
                wr.write((1 << (8 - wr.n)) - 1, 8 - wr.n)
            wr.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
    return wr.flush()


def _emit_coef_bits(ops, v):
    """Append the EXTEND bits for a signed coefficient value v of
    magnitude size s (assumes v != 0); returns s."""
    s = abs(v).bit_length()
    ops.append(("b", v if v >= 0 else v + (1 << s) - 1, s))
    return s


def encode_jpeg_coeffs(comps, w, h, restart_every: int = 0) -> bytes:
    """Baseline-sequential encoder over arbitrary quantized coefficient
    blocks: ``comps`` is [(grid, hs, vs)] with grid an (mcuy*vs,
    mcux*hs, 64) integer array in zigzag order; unit quant tables, one
    interleaved scan, dynamic one-length Huffman tables."""
    geo = [(hs, vs) for _g, hs, vs in comps]
    hmax = max(h_ for h_, _ in geo)
    vmax = max(v_ for _, v_ in geo)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for grid, hs, vs in comps:
        assert grid.shape == (mcuy * vs, mcux * hs, 64)
    ops: list = []
    dc_syms: list[int] = []
    ac_syms: list[int] = []
    pred = [0] * len(comps)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_every and nmcu and nmcu % restart_every == 0:
                ops.append(("r",))
                pred = [0] * len(comps)
            nmcu += 1
            for ci, (grid, hs, vs) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        blk = grid[my * vs + by, mx * hs + bx]
                        dc = int(blk[0])
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = abs(diff).bit_length()
                        dc_syms.append(s)
                        ops.append(("s", s, "dc"))
                        if s:
                            _emit_coef_bits(ops, diff)
                        r = 0
                        for k in range(1, 64):
                            v = int(blk[k])
                            if v == 0:
                                r += 1
                                continue
                            while r > 15:
                                ac_syms.append(0xF0)
                                ops.append(("s", 0xF0, "ac"))
                                r -= 16
                            pre = len(ops)
                            s = _emit_coef_bits(ops, v)
                            sym = (r << 4) | s
                            ac_syms.append(sym)
                            ops.insert(pre, ("s", sym, "ac"))
                            r = 0
                        if r:
                            ac_syms.append(0x00)
                            ops.append(("s", 0x00, "ac"))
    dc_bits, dc_vals, dc_codes = _scan_table(dc_syms)
    ac_bits, ac_vals, ac_codes = _scan_table(ac_syms)
    tables = {"dc": dc_codes, "ac": ac_codes}
    resolved = [("s", op[1], tables[op[2]]) if op[0] == "s" else op
                for op in ops]
    out = _jpeg_frame_header(w, h, geo, 0xC0, restart_every)
    out += _seg(0xC4, b"\x00" + bytes(dc_bits) + bytes(dc_vals))
    out += _seg(0xC4, b"\x10" + bytes(ac_bits) + bytes(ac_vals))
    sos = bytes([len(comps)])
    for ci in range(len(comps)):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3F\x00"
    out += _seg(0xDA, sos)
    out += _write_scan_ops(resolved)
    out += b"\xFF\xD9"
    return bytes(out)


def encode_jpeg_progressive(comps, w, h, scans, restart_every: int = 0,
                            max_eobrun: int = 0x7FFF) -> bytes:
    """Progressive (SOF2) encoder over arbitrary quantized coefficient
    blocks, for fixture synthesis and the decode-equivalence pin.
    ``comps`` as in encode_jpeg_coeffs; ``scans`` is a scan script
    [(comp_idxs, ss, se, ah, al)] — DC scans (ss == 0) may list several
    components (interleaved); AC scans exactly one. The script must
    follow T.81 successive-approximation rules (first scan of a band has
    ah == 0; each refinement has ah == al + 1). EOBn runs accumulate up
    to ``max_eobrun`` (cap it low to force multi-EOBn streams)."""
    geo = [(hs, vs) for _g, hs, vs in comps]
    hmax = max(h_ for h_, _ in geo)
    vmax = max(v_ for _, v_ in geo)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for grid, hs, vs in comps:
        assert grid.shape == (mcuy * vs, mcux * hs, 64)
    out = _jpeg_frame_header(w, h, geo, 0xC2, restart_every)
    for comp_idxs, ss, se, ah, al in scans:
        ops: list = []
        syms: list[int] = []

        def sym(s):
            syms.append(s)
            ops.append(("s", s, None))

        if ss == 0:
            assert se == 0
            pred = {ci: 0 for ci in comp_idxs}

            def dc_unit(ci, blk):
                v = int(blk[0]) >> al  # arithmetic shift per G.1.2.1
                if ah == 0:
                    diff = v - pred[ci]
                    pred[ci] = v
                    s = abs(diff).bit_length()
                    sym(s)
                    if s:
                        _emit_coef_bits(ops, diff)
                else:
                    ops.append(("b", v & 1, 1))

            def dc_restart():
                ops.append(("r",))
                for ci in pred:
                    pred[ci] = 0

            if len(comp_idxs) == 1:
                ci = comp_idxs[0]
                grid, hs, vs = comps[ci]
                bw = -(-(w * hs) // (8 * hmax))
                bh = -(-(h * vs) // (8 * vmax))
                nblk = 0
                for by in range(bh):
                    for bx in range(bw):
                        if restart_every and nblk and \
                                nblk % restart_every == 0:
                            dc_restart()
                        nblk += 1
                        dc_unit(ci, grid[by, bx])
            else:
                nmcu = 0
                for my in range(mcuy):
                    for mx in range(mcux):
                        if restart_every and nmcu and \
                                nmcu % restart_every == 0:
                            dc_restart()
                        nmcu += 1
                        for ci in comp_idxs:
                            grid, hs, vs = comps[ci]
                            for by in range(vs):
                                for bx in range(hs):
                                    dc_unit(ci, grid[my * vs + by,
                                                     mx * hs + bx])
        else:
            assert len(comp_idxs) == 1 and 1 <= ss <= se <= 63
            ci = comp_idxs[0]
            grid, hs, vs = comps[ci]
            bw = -(-(w * hs) // (8 * hmax))
            bh = -(-(h * vs) // (8 * vmax))
            eobrun = 0
            be_bits: list[int] = []

            def flush_eob():
                nonlocal eobrun, be_bits
                if eobrun:
                    n = eobrun.bit_length() - 1
                    sym(n << 4)
                    if n:
                        ops.append(("b", eobrun - (1 << n), n))
                    eobrun = 0
                for b in be_bits:
                    ops.append(("b", b, 1))
                be_bits = []

            nblk = 0
            for by in range(bh):
                for bx in range(bw):
                    if restart_every and nblk and \
                            nblk % restart_every == 0:
                        flush_eob()
                        ops.append(("r",))
                    nblk += 1
                    blk = grid[by, bx]
                    if ah == 0:  # first scan at this bit position
                        r = 0
                        for k in range(ss, se + 1):
                            v = int(blk[k])
                            t = (abs(v) >> al)  # magnitude point xform
                            if t == 0:
                                r += 1
                                continue
                            flush_eob()
                            while r > 15:
                                sym(0xF0)
                                r -= 16
                            tv = t if v >= 0 else -t
                            pre = len(ops)
                            s = _emit_coef_bits(ops, tv)
                            ops.insert(pre, ("s", (r << 4) | s, None))
                            syms.append((r << 4) | s)
                            r = 0
                        if r:
                            eobrun += 1
                            if eobrun == max_eobrun:
                                flush_eob()
                    else:  # refinement scan (G.1.2.3)
                        ab = [abs(int(blk[k])) >> al
                              for k in range(ss, se + 1)]
                        eob = ss - 1
                        for i, t in enumerate(ab):
                            if t == 1:
                                eob = ss + i
                        r = 0
                        br: list[int] = []
                        for k in range(ss, se + 1):
                            t = ab[k - ss]
                            if t == 0:
                                r += 1
                                continue
                            while r > 15 and k <= eob:
                                flush_eob()
                                sym(0xF0)
                                r -= 16
                                for b in br:
                                    ops.append(("b", b, 1))
                                br = []
                            if t > 1:
                                br.append(t & 1)
                                continue
                            flush_eob()
                            sym((r << 4) | 1)
                            ops.append(("b", 1 if int(blk[k]) >= 0
                                        else 0, 1))
                            for b in br:
                                ops.append(("b", b, 1))
                            br = []
                            r = 0
                        if r > 0 or br:
                            eobrun += 1
                            be_bits.extend(br)
                            if eobrun == max_eobrun:
                                flush_eob()
            flush_eob()
        if syms:
            bits, vals, codes = _scan_table(syms)
            tc = 0x00 if ss == 0 else 0x10
            out += _seg(0xC4, bytes([tc]) + bytes(bits) + bytes(vals))
        else:
            codes = {}
        resolved = [("s", op[1], codes) if op[0] == "s" else op
                    for op in ops]
        sos = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += _seg(0xDA, sos)
        out += _write_scan_ops(resolved)
    out += b"\xFF\xD9"
    return bytes(out)


JPEG_STATS_SCHEMA = PPM_STATS_SCHEMA


def decode_jpeg_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of baseline JFIF payloads: per-image
    width, height and per-channel (RGB) pixel means — Huffman entropy
    decode, dequant, IDCT and color conversion handled by ``_parse_jpeg``.
    Malformed or non-baseline payloads yield ok=false with zeroed stats —
    poison blobs must never kill the stage at 100 TB."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_jpeg(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, px = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                means = _channel_means(px.reshape(-1))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, JPEG_STATS_SCHEMA)


AUDIO_FRAMES_SCHEMA = ("doc_id long, frame_idx int, n int, sum_amp long, "
                       "sum_sq long, n_cross int")


def audio_frame_stats(blobs: DataFrame, frame_len: int = 4) -> DataFrame:
    """Framewise audio features over REAL-decoded PCM16 WAV payloads: the
    clip splits into consecutive ``frame_len``-sample frames (trailing
    partial frame dropped) and each frame emits its exact integer energy
    core (sum of amplitudes + sum of squares — numerators of frame mean
    and RMS) and a mean-crossing count: positions where the signal
    crosses the CLIP mean between adjacent samples, the integer-exact
    form of zero-crossing rate for unsigned/offset PCM. All comparisons
    are integer (``n*s > S`` instead of ``s > S/n``), so the result is
    bit-reproducible in any engine. Undecodable payloads emit no frames
    (flag them upstream via decode_wav_stats' ok column — same poison
    boundary). One Arrow-batched map stage; payload bytes never shuffle:
    at 100 TB the frames (4 small ints each) are what hits downstream
    aggregation, not the audio."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "frame_idx", "n", "sum_amp", "sum_sq",
                     "n_cross")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_wav(bytes(payload) if payload else b"")
                if parsed is None:
                    continue
                _, _, samples = parsed
                s64 = samples.astype(np.int64)
                n = int(s64.size)
                nf = n // frame_len
                if nf == 0:
                    continue
                total = int(s64.sum())
                fr = s64[:nf * frame_len].reshape(nf, frame_len)
                sum_amp = fr.sum(axis=1)
                sum_sq = (fr * fr).sum(axis=1)
                above = (fr * n) > total
                n_cross = (above[:, 1:] != above[:, :-1]).sum(axis=1)
                rows["doc_id"].extend([doc_id] * nf)
                rows["frame_idx"].extend(range(nf))
                rows["n"].extend([frame_len] * nf)
                rows["sum_amp"].extend(int(v) for v in sum_amp)
                rows["sum_sq"].extend(int(v) for v in sum_sq)
                rows["n_cross"].extend(int(v) for v in n_cross)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, AUDIO_FRAMES_SCHEMA)


def _decode_image(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Magic-byte dispatch over the decodable image formats (PPM, BMP,
    PNG, baseline JPEG, GIF, TIFF): returns (w, h, pixels) with pixels
    an (h, w, 3) uint8 RGB ndarray, or None outside the real-decode
    boundary. The uint8 contract is NORMALIZED here: a 16-bit TIFF
    (the one decoder that yields uint16) is reduced to its high byte
    (>> 8 — the exact inverse of the 8->16 v*257 bit-replication
    scaling), so downstream uint8-assuming kernels (dhash luma,
    area_downscale's uint8 cast, the 256-wide luma histogram bins)
    never see out-of-range samples. Callers that want native 16-bit
    samples use _parse_tiff / decode_tiff_stats directly."""
    if payload[:2] == b"P6":
        parsed = _parse_ppm(payload)
        if parsed is None:
            return None
        w, h, rgb = parsed
        return w, h, np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[:8] == PNG_MAGIC:
        return _parse_png(payload)
    if payload[:2] == b"\xFF\xD8":
        return _parse_jpeg(payload)
    if payload[:4] == b"GIF8":
        return _parse_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        parsed = _parse_tiff(payload)
        if parsed is None:
            return None
        w, h, px = parsed
        if px.dtype == np.uint16:
            px = (px >> 8).astype(np.uint8)
        return w, h, px
    return None


# ITU-R 601-ish luma in /256 fixed point (77+151+28 = 256): integer-exact
# on both engine and oracle sides, no float rounding in the hash bits.
_LUMA_WEIGHTS = np.array([77, 151, 28], dtype=np.int64)

DHASH_SCHEMA = "doc_id long, img_w int, img_h int, ok boolean, dhash long"


def _dhash_value(px: "np.ndarray") -> int:
    """Difference hash over decoded pixels: fixed-point luma, then one bit
    per horizontally adjacent pair (1 iff left < right), row-major,
    MSB-first — h*(w-1) bits. The canonical 9x8 dHash is this with a
    resize in front (compose with resize_images)."""
    luma = (px.astype(np.int64) @ _LUMA_WEIGHTS) >> 8
    bits = (luma[:, :-1] < luma[:, 1:]).astype(np.int64).reshape(-1)
    weights = np.int64(1) << np.arange(bits.size - 1, -1, -1, dtype=np.int64)
    return int((bits * weights).sum())


def image_dhash(blobs: DataFrame) -> DataFrame:
    """Arrow-batched perceptual difference-hash over REAL-decoded image
    payloads (PPM/BMP/PNG/baseline JPEG by magic dispatch): the standard
    near-duplicate-image fingerprint — visually similar images differ in
    a few bits, so dedup becomes hamming distance on a 64-bit-class key
    instead of pixel comparison. Undecodable payloads yield ok=false with
    dhash 0 (poison-safe). Pair generation is ``dhash_near_dup_pairs``."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "img_w", "img_h", "ok",
                                    "dhash")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                img = _decode_image(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if img is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    rows["dhash"].append(0)
                    continue
                w, h, px = img
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                rows["dhash"].append(_dhash_value(px))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(hashes, DHASH_SCHEMA)


def dhash_near_dup_pairs(hashes: DataFrame, n_bits: int,
                         max_hamming: int = 2,
                         id_col: str = "doc_id",
                         hash_col: str = "dhash",
                         max_bucket: int | None = 1000) -> DataFrame:
    """Near-duplicate image pairs by hamming distance over dHash values,
    WITHOUT the all-pairs cross product: split the n_bits hash into
    ``max_hamming + 1`` bit-bands — two hashes within hamming r must
    agree on at least one band (pigeonhole) — and self-join per band on
    the band value. Only bucket collisions are verified with an exact
    popcount(xor), all JVM-side. The same banding that MinHash-LSH uses
    for text, applied to perceptual hashes: candidate count scales with
    bucket occupancy, not corpus^2. Returns (id_a, id_b, hamming) with
    id_a < id_b, exact and deduplicated.

    ``max_bucket`` (r9 valve; r10 made 1000 the PRODUCTION default —
    None restores exact cliques): the degenerate-bucket valve shared
    with ``lsh_candidate_pairs`` / ``simhash_near_pairs`` — an
    identical-hash image cluster (resized logo spam at corpus scale)
    makes one band bucket of m rows emit m^2/2 join rows BEFORE the
    popcount filter can drop anything. Oversized buckets switch to
    min-id-hub star pairs (still exactly hamming-verified);
    connectivity within an identical-hash bucket is preserved exactly,
    a mixed oversized bucket may lose member-member edges the hub
    fails — the stated recall trade of the default."""
    n_bands = max_hamming + 1
    band_size = -(-n_bits // n_bands)
    mask = (1 << band_size) - 1
    bands = F.array(*[
        F.shiftright(F.col(hash_col).cast("long"), i * band_size)
        .bitwiseAND(F.lit(mask))
        for i in range(n_bands)])
    keyed = (hashes.select(F.col(id_col).alias("id"),
                           F.col(hash_col).alias("h"),
                           F.posexplode(bands).alias("band_idx", "band_val")))
    star = None
    if max_bucket is not None:
        sizes = (keyed.groupBy("band_idx", "band_val")
                 .agg(F.count(F.lit(1)).alias("__bs"),
                      F.min("id").alias("__hub"),
                      F.min_by("h", "id").alias("__hub_h")))
        sized = keyed.join(sizes, ["band_idx", "band_val"])
        keyed = (sized.filter(F.col("__bs") <= max_bucket)
                 .select("id", "h", "band_idx", "band_val"))
        star = (sized.filter((F.col("__bs") > max_bucket)
                             & (F.col("id") != F.col("__hub")))
                .select(F.col("__hub").alias("id_a"),
                        F.col("id").alias("id_b"),
                        F.bit_count(F.col("__hub_h").bitwiseXOR(F.col("h")))
                        .cast("int").alias("hamming"))
                .filter(F.col("hamming") <= max_hamming))
    left = keyed.select(F.col("id").alias("id_a"), F.col("h").alias("h_a"),
                        "band_idx", "band_val")
    right = keyed.select(F.col("id").alias("id_b"), F.col("h").alias("h_b"),
                         "band_idx", "band_val")
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    # verify BEFORE the pair-dedup: the popcount filter is free (no
    # shuffle), so the distinct only moves surviving pairs — and a pair
    # within hamming r collides on <= r+1 bands, so the dedup input is
    # at most (r+1) x the output, independent of bucket density
    pairs = (left.join(right, ["band_idx", "band_val"])
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("hamming", ham.cast("int"))
             .filter(F.col("hamming") <= max_hamming)
             .select("id_a", "id_b", "hamming"))
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


RESIZED_SCHEMA = "doc_id long, width int, height int, ok boolean, pixels binary"


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: nearest-neighbor sample
    of the raw bytes down/up to width*height "pixels" — for plumbing
    tests over arbitrary (non-image) payloads. The real path is
    ``_real_resize``."""
    n = width * height
    if not payload:
        return bytes(n)
    step = len(payload) / n
    return bytes(payload[min(int(i * step), len(payload) - 1)]
                 for i in range(n))


def _real_resize(payload: bytes, width: int, height: int) -> bytes | None:
    """REAL nearest-neighbor image resize over decoded pixels (P6 PPM,
    uncompressed 24bpp BMP, PNG, or baseline JPEG by magic dispatch):
    output is width*height*3
    RGB bytes, row-major top-down. src pixel = floor(dst_idx * src/dst)
    per axis — the canonical NN mapping. None for undecodable payloads."""
    if payload[:2] == b"P6":
        parsed = _parse_ppm(payload)
        if parsed is None:
            return None
        w, h, rgb = parsed
        px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    elif payload[:2] == b"BM":
        parsed = _parse_bmp(payload)
        if parsed is None:
            return None
        w, h, px = parsed
    elif payload[:8] == PNG_MAGIC:
        parsed = _parse_png(payload)
        if parsed is None:
            return None
        w, h, px = parsed
    elif payload[:2] == b"\xFF\xD8":
        parsed = _parse_jpeg(payload)
        if parsed is None:
            return None
        w, h, px = parsed
    else:
        return None
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return px[rows][:, cols].tobytes()


def resize_images(blobs: DataFrame, width: int = 16, height: int = 16,
                  real_decode: bool = False) -> DataFrame:
    """Arrow-batched resize over the binary column: every payload maps to a
    fixed width*height buffer — the normalization step before batching
    image tensors for training. Output size is constant per row, so
    downstream batch shapes are static (what a tensor collator needs).

    ``real_decode=True`` REALLY decodes PPM/BMP/PNG/JPEG and resamples actual
    pixels (``_real_resize``: width*height*3 RGB bytes); undecodable
    payloads yield ok=false with an all-zero buffer instead of failing
    the batch. The default byte-sampling fake stays for plumbing tests
    over arbitrary payloads."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels, oks = [], []
            for b in pdf["content"]:
                payload = bytes(b) if b else b""
                if real_decode:
                    out = _real_resize(payload, width, height)
                    oks.append(out is not None)
                    pixels.append(out if out is not None
                                  else bytes(width * height * 3))
                else:
                    oks.append(True)
                    pixels.append(_fake_resize(payload, width, height))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "width": [width] * len(pdf),
                "height": [height] * len(pdf),
                "ok": oks,
                "pixels": pixels,
            })

    return blobs.mapInPandas(do_resize, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# GIF (GIF87a/89a, palette + LZW)
# ---------------------------------------------------------------------------

GIF_STATS_SCHEMA = PPM_STATS_SCHEMA


def _gif_lzw_decode(data: bytes, min_code: int,
                    max_pixels: int) -> list[int] | None:
    """REAL GIF-variant LZW decode (GIF89a spec, Appendix F): variable
    code width starting at min_code+1, LSB-first bit packing, clear/end
    control codes, dictionary capped at 4096 entries (deferred-clear
    tolerated). Returns the palette-index stream or None on a malformed
    stream. Dictionary ops are per-code Python — GIF payloads in this
    engine are thumbnails; a tiled-media production path would lift this
    into a C/numba kernel exactly like the JPEG Huffman note."""
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    table: list[tuple[int, ...]] = []
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = nbits = 0
    pos = 0

    def reset():
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = min_code + 1
        prev = None

    reset()
    while len(out) < max_pixels:
        while nbits < width:
            if pos >= len(data):
                return None
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            reset()
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or code >= clear:
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                if code in (clear, end):
                    return None
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                return None
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
    return out


def _gif_interlace_order(h: int) -> "np.ndarray":
    """GIF89a Appendix E four-pass interlace: the storage order of the
    image rows (pass 1: every 8th from row 0; pass 2: every 8th from
    row 4; pass 3: every 4th from row 2; pass 4: every 2nd from row
    1). Returns the row indices in stored order — decode scatters
    stored rows back to these positions; the encoder twin gathers."""
    return np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                           np.arange(2, h, 4), np.arange(1, h, 2)])


def _parse_gif(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Parse a GIF87a/89a payload: logical screen descriptor, global or
    local color table, extension-block skipping, REAL LZW decode of the
    FIRST image frame (four-pass interlaced or sequential), palette
    lookup to an (h, w, 3) uint8 RGB array. Missing palettes and
    malformed streams return None (ok=false downstream, the poison-safe
    convention); animation frames beyond the first are ignored (frame
    sampling is sample_frames' job, not the decoder's)."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(payload):
            return None
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x3B:          # trailer before any image frame
            return None
        if b0 == 0x21:          # extension: label byte + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 != 0x2C or pos + 9 > len(payload):
            return None
        _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        interlaced = bool(iflags & 0x40)
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(payload):
                return None
            pal = np.frombuffer(payload[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None or pos >= len(payload) or iw == 0 or ih == 0:
            return None
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            return None
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        idx = _gif_lzw_decode(bytes(data), min_code, iw * ih)
        if idx is None or len(idx) < iw * ih:
            return None
        codes = np.asarray(idx[:iw * ih], dtype=np.int64)
        if codes.max(initial=0) >= pal.shape[0]:
            return None
        grid = codes.reshape(ih, iw)
        if interlaced:  # scatter stored rows to their display positions
            out = np.empty_like(grid)
            out[_gif_interlace_order(ih)] = grid
            grid = out
        return iw, ih, pal[grid].reshape(ih, iw, 3)
    return None


def _gif_lzw_encode(indices: list[int], min_code: int) -> bytes:
    """Real LZW encoder (greedy longest-match), the test-fixture twin of
    ``_gif_lzw_decode`` — exercises dictionary growth, width bumps and
    the 4096 reset for real instead of emitting literal-only streams."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    emit(clear, width)
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    buf: tuple[int, ...] = ()
    for i in indices:
        cand = buf + (i,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        if next_code == 4096:
            # Dictionary full: codes stop at 0xFFF (GIF89a App. F), so
            # reset BEFORE assigning — never mint a 13-bit entry. The
            # decoder mirrors this: its lazy append stops at len 4096,
            # so the code just emitted adds nothing on either side.
            emit(clear, width)
            table = {(j,): j for j in range(clear)}
            next_code = end + 1
            width = min_code + 1
        else:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        buf = (i,)
    if buf:
        emit(table[buf], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(rgb: "np.ndarray", interlaced: bool = False) -> bytes:
    """Minimal GIF89a writer for test/oracle payload synthesis: global
    color table from first-appearance color order (<= 256 distinct),
    one frame (optionally four-pass interlaced: rows gathered into
    Appendix E storage order, flag set in the image descriptor), real
    LZW stream, plus a comment extension so decoders must exercise the
    block-skip path."""
    import struct

    h, w, _ = rgb.shape
    if interlaced:
        rgb = rgb[_gif_interlace_order(h)]
    flat = [tuple(int(v) for v in px) for px in rgb.reshape(-1, 3)]
    index: dict[tuple[int, int, int], int] = {}
    for px in flat:
        index.setdefault(px, len(index))
    n_colors = len(index)
    if n_colors > 256:
        raise ValueError("encode_gif: > 256 distinct colors")
    size_field = max(0, (max(n_colors, 2) - 1).bit_length() - 1)
    table_n = 2 << size_field
    min_code = max(2, size_field + 1)
    gct = bytearray()
    for px, _ in sorted(index.items(), key=lambda kv: kv[1]):
        gct += bytes(px)
    gct += b"\x00" * (3 * table_n - len(gct))
    indices = [index[px] for px in flat]
    stream = _gif_lzw_encode(indices, min_code)
    blocks = bytearray()
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return (b"GIF89a"
            + struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
            + bytes(gct)
            + b"\x21\xFE\x04test\x00"          # comment extension
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                     0x40 if interlaced else 0)
            + bytes([min_code]) + bytes(blocks)
            + b"\x3B")


def decode_gif_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of GIF payloads (first frame,
    sequential or interlaced): per-image width, height and RGB means;
    malformed / out-of-subset payloads yield ok=false rows."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_gif(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, px = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                means = _channel_means(px.reshape(-1))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, GIF_STATS_SCHEMA)


def _packbits_decode(data: bytes, expected: int) -> bytes | None:
    """Apple PackBits (TIFF compression 32773): control byte n in
    0..127 copies n+1 literals, 129..255 repeats the next byte 257-n
    times, 128 is a no-op. Control-byte-granular loop (not per output
    byte); truncated streams return None."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            if i + n + 1 > len(data):
                return None
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:
            if i >= len(data):
                return None
            out += data[i:i + 1] * (257 - n)
            i += 1
    return bytes(out[:expected]) if len(out) >= expected else None


def _packbits_encode(data: bytes) -> bytes:
    """Real PackBits encoder (test/oracle twin): runs of >= 3 equal
    bytes become repeat packets, everything else literal packets, both
    capped at 128."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while (i + run < n and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while (i + run < n and run < 128
                   and data[i + run] == data[i]):
                run += 1
            if run >= 3:
                break
            i += run
        i = min(i, lit_start + 128)
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


_TIFF_TYPE = {1: ("B", 1), 3: ("H", 2), 4: ("I", 4)}


def _tiff_lzw_decode(seg: bytes, expected: int) -> bytes | None:
    """TIFF-variant LZW (TIFF 6.0 §13, r11): MSB-first bit packing,
    9->12-bit variable code width with the TIFF "early change" (the
    width bumps one code EARLIER than vanilla LZW — when the table
    reaches 2^width - 1, not 2^width), Clear=256 resets the table and
    width, EOI=257 terminates. The first code after a Clear must be a
    literal; a code beyond table-size+1, a missing EOI, or output
    overrun returns None (poison-safe, never raises)."""
    CLEAR, EOI = 256, 257
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    bitbuf = nbits = pos = 0
    prev: bytes | None = None
    out = bytearray()
    n = len(seg)
    while True:
        while nbits < width:
            if pos >= n:
                return None  # ran out without an EOI code
            bitbuf = (bitbuf << 8) | seg[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == EOI:
            break
        if code == CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:  # first code after Clear: literal only
            if code > 255:
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            return None
        out += entry
        prev = entry
        # early change, phase-matched to the encoder: the decoder adds
        # no entry for the first code after a Clear, so its table runs
        # ONE behind the writer's next_code — the width must bump at
        # 2^width - 2 (writer bumps at next_code == 2^width - 1)
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if len(out) > expected:
            return None
    return bytes(out) if len(out) == expected else None


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (test/oracle twin for
    _tiff_lzw_decode): greedy longest-match, Clear emitted up front
    and whenever the code space fills (next code 4094 — the 12-bit
    early-change ceiling), EOI at the end, MSB-first packing, width
    bumps when the NEXT code to assign reaches 2^width - 1 (mirroring
    the decoder's early change)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitacc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitacc, nbits
        bitacc = (bitacc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitacc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    codes: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    emit(CLEAR, width)
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in codes:
            w += c
            continue
        emit(codes[w], width)
        codes[w + c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        elif next_code == 4094:  # table full: reset mid-stream
            emit(CLEAR, width)
            codes = {bytes([i]): i for i in range(256)}
            next_code, width = 258, 9
        w = c
    if w:
        emit(codes[w], width)
        # the decoder adds a table entry for this final code too and
        # applies its early-change check before reading EOI; at this
        # point (no writer-side add) next_code equals the decoder's
        # table size, so the mirror check uses the decoder's threshold
        if next_code == (1 << width) - 2 and width < 12:
            width += 1
    emit(EOI, width)
    if nbits:
        out.append((bitacc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_undo_predictor2(raw: bytes, w: int, h: int, spp: int,
                          dtype="uint8") -> bytes:
    """Undo TIFF Predictor 2 (horizontal differencing, §14): each
    sample is stored as the delta to the previous sample of the SAME
    channel in the row; reconstruction is a per-row per-channel
    modulo-2^bits cumulative sum (one vectorized numpy pass). For
    16-bit samples pass the byte-order-qualified dtype ('<u2'/'>u2'):
    differencing is defined on SAMPLE values, so the undo decodes in
    file order, cumsums in sample space, and re-emits file-order
    bytes."""
    dt = np.dtype(dtype)
    a = np.frombuffer(raw, dtype=dt).reshape(h, w, spp)
    return np.cumsum(a, axis=1, dtype=dt).astype(dt).tobytes()


def tiff_page_offsets(payload: bytes) -> list[int]:
    """Walk the IFD chain (r11): offsets of every page's IFD — the
    pyramid levels of a whole-slide image. Bounded walk (a cycle or a
    truncated pointer ends it); empty list for non-TIFF payloads."""
    import struct

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        return []
    if len(payload) < 8:
        return []
    (off,) = struct.unpack_from(bo + "I", payload, 4)
    seen: list[int] = []
    while off and off + 2 <= len(payload) and off not in seen \
            and len(seen) < 64:
        seen.append(off)
        (n,) = struct.unpack_from(bo + "H", payload, off)
        nxt_at = off + 2 + 12 * n
        if nxt_at + 4 > len(payload):
            break
        (off,) = struct.unpack_from(bo + "I", payload, nxt_at)
    return seen


def _parse_tiff(payload: bytes,
                page: int = 0) -> tuple[int, int, "np.ndarray"] | None:
    """REAL baseline-TIFF decode (TIFF 6.0 §3-4 + §15 tiles, Baseline
    Grayscale/RGB subset at 8 bits): either byte order ('II' little /
    'MM' big), first IFD walk with inline-vs-offset value resolution,
    STRIP assembly across RowsPerStrip boundaries or TILE assembly
    (TileWidth/TileLength/TileOffsets/TileByteCounts — the layout
    whole-slide images actually ship in; edge tiles padded to full
    size per spec and cropped on placement), Compression 1 (none),
    32773 (PackBits), 5 (TIFF-LZW), 8/32946 (Deflate), 7 (new-style
    JPEG-in-TIFF per TIFF Technote 2, r12 — each tile/strip a
    self-contained JFIF stream decoded through the repo's own T.81
    decoder; this is the Aperio-SVS whole-slide layout), Predictor 2
    (sample-space), PhotometricInterpretation 0/1 (gray, 0 =
    WhiteIsZero inverted) or 2 (RGB), BitsPerSample 8 or uniform 16
    (r13 — samples read in the file byte order, returned native
    uint16), PlanarConfiguration 1 (chunky) or 2 (r13 — plane-major
    segment list per §12, each plane an independent 1-sample image).
    Anything outside — other depths, old-style Compression 6, shared
    JPEGTables (tag 347), JPEG x planar/16-bit — returns None
    (ok=false downstream)."""
    import struct

    if payload[:4] == b"II*\x00":
        bo = "<"
    elif payload[:4] == b"MM\x00*":
        bo = ">"
    else:
        return None
    if len(payload) < 8:
        return None
    if page == 0:
        (ifd_off,) = struct.unpack_from(bo + "I", payload, 4)
    else:  # pyramid level selection via the IFD chain (r11)
        pages = tiff_page_offsets(payload)
        if page >= len(pages):
            return None
        ifd_off = pages[page]
    if ifd_off + 2 > len(payload):
        return None
    (n_entries,) = struct.unpack_from(bo + "H", payload, ifd_off)
    tags: dict[int, tuple[int, ...]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        if off + 12 > len(payload):
            return None
        tag, typ, cnt = struct.unpack_from(bo + "HHI", payload, off)
        if typ not in _TIFF_TYPE:
            continue
        ch, width = _TIFF_TYPE[typ]
        size = width * cnt
        if size <= 4:
            vals_off = off + 8
        else:
            (vals_off,) = struct.unpack_from(bo + "I", payload, off + 8)
        if vals_off + size > len(payload):
            return None
        tags[tag] = struct.unpack_from(bo + str(cnt) + ch, payload,
                                       vals_off)
    w = tags.get(256, (0,))[0]
    h = tags.get(257, (0,))[0]
    comp = tags.get(259, (1,))[0]
    photo = tags.get(262, (1,))[0]
    spp = tags.get(277, (1,))[0]
    bps = tags.get(258, (8,) * spp)
    offsets, counts = tags.get(273), tags.get(279)
    rps = tags.get(278, (h,))[0]
    pred = tags.get(317, (1,))[0]
    planar = tags.get(284, (1,))[0]
    tw = tags.get(322, (0,))[0]
    th = tags.get(323, (0,))[0]
    t_offs, t_cnts = tags.get(324), tags.get(325)
    tiled = bool(tw and th and t_offs is not None
                 and t_cnts is not None)
    bits = bps[0] if bps else 0
    if (not w or not h
            or spp not in (1, 3) or len(bps) != spp
            or bits not in (8, 16) or any(b != bits for b in bps)
            or (photo == 2) != (spp == 3) or photo not in (0, 1, 2)
            or comp not in (1, 32773, 5, 8, 32946, 7)
            or pred not in (1, 2)
            or planar not in (1, 2)
            or (comp == 7 and (pred != 1 or bits != 8
                               or planar == 2))):
        return None
    if spp == 1:
        planar = 1  # one component: the layouts coincide (§12)
    bpsz = bits // 8
    sdt = np.uint8 if bits == 8 else np.dtype(bo + "u2")

    def seg_bytes(so: int, sc: int, exp: int,
                  dims: tuple[int, int] | None = None) -> bytes | None:
        seg = payload[so:so + sc]
        if len(seg) < sc:
            return None
        if comp == 1:
            return bytes(seg[:exp]) if len(seg) >= exp else None
        if comp == 5:  # TIFF LZW (r11)
            return _tiff_lzw_decode(seg, exp)
        if comp in (8, 32946):  # Deflate / legacy Adobe deflate (r11)
            import zlib
            try:
                dec = zlib.decompress(seg)
            except zlib.error:
                return None
            return dec if len(dec) == exp else None
        if comp == 7:  # JPEG-in-TIFF (Technote 2; r12 — the SVS layout)
            # each tile/strip is a self-contained JFIF stream; its
            # decoded geometry must equal the segment's expected
            # (rows, cols) exactly — a transposed or mis-sized stream
            # is a malformed file, not a crop
            dec = _parse_jpeg(bytes(seg))
            if dec is None or dims is None:
                return None
            jw, jh, px = dec
            if (jh, jw) != dims:
                return None
            raw = (np.ascontiguousarray(px[:, :, 0]).tobytes()
                   if spp == 1 else px.tobytes())
            return raw if len(raw) == exp else None
        return _packbits_decode(seg, exp)

    # planar config 2 (§12, r13): the segment list is plane-major —
    # each plane decodes as an independent 1-sample image, then the
    # planes stack. seg_spp is the per-SEGMENT sample count.
    n_planes = spp if planar == 2 else 1
    seg_spp = 1 if planar == 2 else spp

    if tiled:  # §15 — the whole-slide-image layout
        across = (w + tw - 1) // tw
        down = (h + th - 1) // th
        per_plane = across * down
        if (len(t_offs) != len(t_cnts)
                or len(t_offs) != per_plane * n_planes):
            return None
        out = np.zeros((h, w, spp), dtype=sdt)
        exp = th * tw * seg_spp * bpsz
        for idx, (so, sc) in enumerate(zip(t_offs, t_cnts)):
            dec = seg_bytes(so, sc, exp, (th, tw))
            if dec is None:
                return None
            if pred == 2:  # per-tile rows (tile_w-sample rows)
                dec = _tiff_undo_predictor2(dec, tw, th, seg_spp, sdt)
            tile = np.frombuffer(dec, dtype=sdt).reshape(
                th, tw, seg_spp)
            pl, tidx = divmod(idx, per_plane)
            r0 = (tidx // across) * th
            c0 = (tidx % across) * tw
            nr = min(th, h - r0)
            nc = min(tw, w - c0)
            if planar == 2:
                out[r0:r0 + nr, c0:c0 + nc, pl] = tile[:nr, :nc, 0]
            else:
                out[r0:r0 + nr, c0:c0 + nc] = tile[:nr, :nc]
        a = out.reshape(-1)
    else:
        if (offsets is None or counts is None
                or len(offsets) != len(counts) or not rps):
            return None
        per_plane = (h + rps - 1) // rps
        if len(offsets) != per_plane * n_planes:
            return None
        plane_arrays = []
        for pl in range(n_planes):
            raw = bytearray()
            row = 0
            for so, sc in zip(offsets[pl * per_plane:
                                      (pl + 1) * per_plane],
                              counts[pl * per_plane:
                                     (pl + 1) * per_plane]):
                nrows = min(rps, h - row)
                if nrows <= 0:
                    return None
                row += nrows
                dec = seg_bytes(so, sc, nrows * w * seg_spp * bpsz,
                                (nrows, w))
                if dec is None:
                    return None
                raw += dec
            if row < h or len(raw) != w * h * seg_spp * bpsz:
                return None
            if pred == 2:  # horizontal differencing
                raw = _tiff_undo_predictor2(bytes(raw), w, h,
                                            seg_spp, sdt)
            plane_arrays.append(
                np.frombuffer(bytes(raw), dtype=sdt).reshape(
                    h, w, seg_spp))
        a = (np.concatenate(plane_arrays, axis=2) if planar == 2
             else plane_arrays[0]).reshape(-1)
    native = np.uint8 if bits == 8 else np.uint16
    a = a.astype(native)  # drop the file byte order for callers
    if spp == 1:
        g = a.reshape(h, w)
        if photo == 0:
            g = native((1 << bits) - 1) - g
        return w, h, np.repeat(g[:, :, None], 3, axis=2)
    return w, h, a.reshape(h, w, 3)


def _tiff_diff2(block: "np.ndarray") -> "np.ndarray":
    """Forward Predictor-2 differencing of an (h, w, spp) uint8 or
    uint16 block (per row, per channel, mod 2^bits) — writer-side twin
    of _tiff_undo_predictor2."""
    out_dt = block.dtype
    a = block.astype(np.int32)
    d = a.copy()
    d[:, 1:] = a[:, 1:] - a[:, :-1]
    return (d % (1 << (8 * out_dt.itemsize))).astype(out_dt)


def encode_tiff(img: "np.ndarray", endian: str = "<",
                compression: int = 1,
                rows_per_strip: int | None = None,
                predictor: int = 1,
                tile: tuple[int, int] | None = None,
                planar: bool = False,
                bits: int = 8) -> bytes:
    """Minimal baseline-TIFF writer for test/oracle payload synthesis:
    either byte order, gray (h, w) or RGB (h, w, 3) uint8 (or uint16
    when ``bits=16`` — samples packed in the FILE byte order, tag 258
    = [16]*spp), compression none / real PackBits / TIFF LZW / Deflate
    (r11), optional Predictor 2 horizontal differencing (sample-space
    for 16-bit, per spec §14), multi-strip via ``rows_per_strip`` OR
    tiled via ``tile=(tile_w, tile_h)`` (§15 — edge tiles zero-padded
    to full size as the spec requires), chunky or PLANAR component
    layout (``planar=True`` -> tag 284 = 2: segment list is
    plane-major — all of component 0's strips/tiles, then component
    1's, per spec §12; r13). Layout: header, segment data, out-of-line
    value arrays, IFD last (tags ascending as the spec requires) — so
    the parser's inline-vs-offset resolution and strip/tile reassembly
    all get exercised."""
    import zlib

    assert endian in ("<", ">")
    assert bits in (8, 16)
    dt = np.uint8 if bits == 8 else np.dtype(endian + "u2")
    img = np.asarray(img).astype(dt)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    assert not (planar and gray), "planar layout needs spp == 3"

    def pack(raw: bytes) -> bytes:
        if compression == 32773:
            return _packbits_encode(raw)
        if compression == 5:
            return _tiff_lzw_encode(raw)
        if compression in (8, 32946):
            return zlib.compress(raw)
        return raw

    full = img.reshape(h, w, spp)
    # planar: each plane is encoded as an independent 1-sample image;
    # the segment list concatenates the planes' segments plane-major
    planes = ([full[:, :, p:p + 1] for p in range(spp)] if planar
              else [full])
    strips = []
    rps = rows_per_strip or h
    for pl in planes:
        pspp = pl.shape[2]
        if tile is not None:
            tw, th = tile
            for r0 in range(0, h, th):
                for c0 in range(0, w, tw):
                    block = np.zeros((th, tw, pspp), dtype=dt)
                    part = pl[r0:r0 + th, c0:c0 + tw]
                    block[:part.shape[0], :part.shape[1]] = part
                    if predictor == 2:
                        block = _tiff_diff2(block)
                    strips.append(pack(block.tobytes()))
        else:
            enc = _tiff_diff2(pl) if predictor == 2 else pl
            strips += [pack(enc[r0:r0 + rps].tobytes())
                       for r0 in range(0, h, rps)]
    return _tiff_single_ifd(endian, w, h, spp, 1 if gray else 2,
                            compression, strips,
                            rows_per_strip=None if tile else rps,
                            tile=tile, predictor=predictor,
                            planar=planar, bits=bits)


def _tiff_single_ifd(endian: str, w: int, h: int, spp: int,
                     photometric: int, compression: int, strips,
                     rows_per_strip: int | None = None,
                     tile: tuple[int, int] | None = None,
                     predictor: int = 1, planar: bool = False,
                     bits: int = 8) -> bytes:
    """Wrap pre-encoded segments (strips or tiles) in a one-IFD TIFF
    container — factored from encode_tiff (r12) so codec writers that
    produce STRUCTURED segments (JPEG-in-TIFF: each segment is a JFIF
    stream, not a packed raster) share the header/offset/IFD layout.
    Layout: header, segment data, out-of-line arrays, IFD last."""
    import struct

    pos = 8
    strip_offs = []
    for s in strips:
        strip_offs.append(pos)
        pos += len(s)

    entries = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * spp),
        (259, 3, [compression]), (262, 3, [photometric]),
        (277, 3, [spp]),
    ]
    if planar:
        entries.append((284, 3, [2]))
    if tile is not None:
        entries += [(322, 4, [tile[0]]), (323, 4, [tile[1]]),
                    (324, 4, strip_offs),
                    (325, 4, [len(s) for s in strips])]
    else:
        entries += [(273, 4, strip_offs), (278, 4, [rows_per_strip]),
                    (279, 4, [len(s) for s in strips])]
    if predictor != 1:
        entries.append((317, 3, [predictor]))
    entries.sort()
    extra = bytearray()
    ifd = bytearray(struct.pack(endian + "H", len(entries)))
    extra_base = pos
    # first pass: compute where out-of-line arrays land
    ext_offs = {}
    for tag, typ, vals in entries:
        ch, width = _TIFF_TYPE[typ]
        if width * len(vals) > 4:
            ext_offs[tag] = extra_base + len(extra)
            extra += struct.pack(endian + str(len(vals)) + ch, *vals)
    ifd_off = extra_base + len(extra)
    for tag, typ, vals in entries:
        ch, width = _TIFF_TYPE[typ]
        ent = struct.pack(endian + "HHI", tag, typ, len(vals))
        if width * len(vals) <= 4:
            packed = struct.pack(endian + str(len(vals)) + ch, *vals)
            ent += packed + b"\x00" * (4 - len(packed))
        else:
            ent += struct.pack(endian + "I", ext_offs[tag])
        ifd += ent
    ifd += struct.pack(endian + "I", 0)  # no next IFD
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    return (magic + struct.pack(endian + "I", ifd_off)
            + b"".join(strips) + bytes(extra) + bytes(ifd))


def encode_tiff_jpeg(vals: "np.ndarray", endian: str = "<",
                     tile: bool = False) -> bytes:
    """JPEG-in-TIFF writer (Compression 7, TIFF Technote 2) — the
    layout whole-slide images actually ship (Aperio SVS: JPEG-coded
    tiles inside a pyramidal TIFF). ``vals`` is a (bh, bw) uint8 grid
    of 8x8-block values; the image is (bh*8, bw*8) RGB where block
    (r, c) is uniform at vals[r, c] — the encode_jpeg_dc losslessness
    trick (a constant block is pure DC and survives quantize/IDCT
    bit-exactly), so the lossy codec becomes oracle-checkable.
    tile=True writes 16x16 TILES (one 2x2-block JFIF stream each);
    else 8-row STRIPS (one block row per stream). Every segment is a
    self-contained JFIF stream per Technote 2 (no shared JPEGTables
    tag)."""
    vals = np.asarray(vals, dtype=np.uint8)
    bh, bw = vals.shape
    w, h = bw * 8, bh * 8
    if tile:
        assert bh % 2 == 0 and bw % 2 == 0
        segs = [encode_jpeg_dc(vals[r:r + 2, c:c + 2].reshape(-1),
                               block_w=2, gray=False)
                for r in range(0, bh, 2) for c in range(0, bw, 2)]
        return _tiff_single_ifd(endian, w, h, 3, 2, 7, segs,
                                tile=(16, 16))
    segs = [encode_jpeg_dc(vals[r], block_w=bw, gray=False)
            for r in range(bh)]
    return _tiff_single_ifd(endian, w, h, 3, 2, 7, segs,
                            rows_per_strip=8)


def encode_tiff_pyramid(imgs, endian: str = "<",
                        compression: int = 1,
                        tile: tuple[int, int] | None = None,
                        predictor: int = 1,
                        planar: bool = False,
                        bits: int = 8) -> bytes:
    """Multi-page (pyramidal) TIFF writer — the whole-slide-image
    shape: one IFD per resolution level, chained via the next-IFD
    pointer, each level independently tiled/compressed. Test twin for
    tiff_page_offsets + _parse_tiff(page=n). Layout: header, then per
    page its segment data, then all out-of-line arrays, then all IFDs
    chained at the end. r13: ``planar=True`` writes every level with
    plane-major segment lists (tag 284 = 2), ``bits=16`` packs 16-bit
    samples in the file byte order — the depth/layout combination
    microscopy pyramids actually ship."""
    import zlib

    assert endian in ("<", ">")
    assert bits in (8, 16)
    dt = np.uint8 if bits == 8 else np.dtype(endian + "u2")

    def pack(raw: bytes) -> bytes:
        if compression == 32773:
            return _packbits_encode(raw)
        if compression == 5:
            return _tiff_lzw_encode(raw)
        if compression in (8, 32946):
            return zlib.compress(raw)
        return raw

    pages = []
    for img in imgs:
        img = np.asarray(img).astype(dt)
        gray = img.ndim == 2
        h, w = img.shape[:2]
        spp = 1 if gray else 3
        assert not (planar and gray), "planar layout needs spp == 3"
        full = img.reshape(h, w, spp)
        planes = ([full[:, :, p:p + 1] for p in range(spp)] if planar
                  else [full])
        segs = []
        for pl in planes:
            pspp = pl.shape[2]
            if tile is not None:
                tw, th = tile
                for r0 in range(0, h, th):
                    for c0 in range(0, w, tw):
                        block = np.zeros((th, tw, pspp), dtype=dt)
                        part = pl[r0:r0 + th, c0:c0 + tw]
                        block[:part.shape[0], :part.shape[1]] = part
                        if predictor == 2:
                            block = _tiff_diff2(block)
                        segs.append(pack(block.tobytes()))
            else:
                raw = (pl if predictor != 2
                       else _tiff_diff2(pl)).tobytes()
                segs.append(pack(raw))
        pages.append(dict(w=w, h=h, spp=spp,
                          photometric=1 if gray else 2,
                          compression=compression, segs=segs,
                          rows_per_strip=None if tile else h,
                          tile=tile, predictor=predictor,
                          planar=planar, bits=bits))

    return _tiff_ifd_chain(endian, pages)


def _tiff_ifd_chain(endian: str, pages: list[dict]) -> bytes:
    """Assemble a chained-IFD (multi-page) TIFF from per-page dicts
    (w, h, spp, photometric, compression, segs, rows_per_strip | tile,
    predictor) — factored from encode_tiff_pyramid (r12) so the
    JPEG-in-TIFF pyramid writer (the full Aperio-SVS shape) shares the
    layout: header, per-page segment data, all out-of-line arrays,
    then all IFDs chained at the end."""
    import struct

    # lay out: segments first (offsets known immediately)
    pos = 8
    seg_offs: list[list[int]] = []
    for pg in pages:
        offs = []
        for sg in pg["segs"]:
            offs.append(pos)
            pos += len(sg)
        seg_offs.append(offs)

    # build per-page entry lists (values final, offsets known)
    def page_entries(i):
        pg = pages[i]
        e = [(256, 4, [pg["w"]]), (257, 4, [pg["h"]]),
             (258, 3, [pg.get("bits", 8)] * pg["spp"]),
             (259, 3, [pg["compression"]]),
             (262, 3, [pg["photometric"]]),
             (277, 3, [pg["spp"]])]
        if pg.get("planar"):
            e.append((284, 3, [2]))
        if pg["tile"] is not None:
            e += [(322, 4, [pg["tile"][0]]), (323, 4, [pg["tile"][1]]),
                  (324, 4, seg_offs[i]),
                  (325, 4, [len(sg) for sg in pg["segs"]])]
        else:
            e += [(273, 4, seg_offs[i]),
                  (278, 4, [pg["rows_per_strip"]]),
                  (279, 4, [len(sg) for sg in pg["segs"]])]
        if pg["predictor"] != 1:
            e.append((317, 3, [pg["predictor"]]))
        e.sort()
        return e

    all_entries = [page_entries(i) for i in range(len(pages))]
    # out-of-line arrays for every page, then the chained IFDs
    extra = bytearray()
    extra_base = pos
    ext_offs: list[dict[int, int]] = []
    for ents in all_entries:
        eo = {}
        for tag, typ, vals in ents:
            ch, width = _TIFF_TYPE[typ]
            if width * len(vals) > 4:
                eo[tag] = extra_base + len(extra)
                extra += struct.pack(endian + str(len(vals)) + ch,
                                     *vals)
        ext_offs.append(eo)
    ifd_base = extra_base + len(extra)
    ifd_offs = []
    posi = ifd_base
    for ents in all_entries:
        ifd_offs.append(posi)
        posi += 2 + 12 * len(ents) + 4
    ifds = bytearray()
    for i, ents in enumerate(all_entries):
        ifds += struct.pack(endian + "H", len(ents))
        for tag, typ, vals in ents:
            ch, width = _TIFF_TYPE[typ]
            ent = struct.pack(endian + "HHI", tag, typ, len(vals))
            if width * len(vals) <= 4:
                packed = struct.pack(endian + str(len(vals)) + ch,
                                     *vals)
                ent += packed + b"\x00" * (4 - len(packed))
            else:
                ent += struct.pack(endian + "I", ext_offs[i][tag])
            ifds += ent
        nxt = ifd_offs[i + 1] if i + 1 < len(all_entries) else 0
        ifds += struct.pack(endian + "I", nxt)
    magic = b"II*\x00" if endian == "<" else b"MM\x00*"
    body = b"".join(sg for pg in pages for sg in pg["segs"])
    return (magic + struct.pack(endian + "I", ifd_offs[0])
            + body + bytes(extra) + bytes(ifds))


def encode_tiff_jpeg_pyramid(vals_levels, endian: str = "<",
                             tile: bool = False) -> bytes:
    """The FULL Aperio-SVS shape: a chained-IFD pyramid whose every
    level is JPEG-coded (Compression 7) — vals_levels is a list of
    (bh, bw) uint8 block-value grids, one per resolution level; each
    level becomes a (bh*8, bw*8) RGB page of uniform 8x8 blocks
    written as 8-row JPEG strips or (tile=True) 16x16 JPEG tiles,
    every segment a self-contained JFIF stream. Decode twin:
    _parse_tiff(page=n) reads any level's comp-7 tags and runs the
    T.81 decoder per segment."""
    pages = []
    for vals in vals_levels:
        vals = np.asarray(vals, dtype=np.uint8)
        bh, bw = vals.shape
        w, h = bw * 8, bh * 8
        if tile and bh % 2 == 0 and bw % 2 == 0:
            segs = [encode_jpeg_dc(vals[r:r + 2, c:c + 2].reshape(-1),
                                   block_w=2, gray=False)
                    for r in range(0, bh, 2) for c in range(0, bw, 2)]
            pages.append(dict(w=w, h=h, spp=3, photometric=2,
                              compression=7, segs=segs,
                              rows_per_strip=None, tile=(16, 16),
                              predictor=1))
        else:
            segs = [encode_jpeg_dc(vals[r], block_w=bw, gray=False)
                    for r in range(bh)]
            pages.append(dict(w=w, h=h, spp=3, photometric=2,
                              compression=7, segs=segs,
                              rows_per_strip=8, tile=None,
                              predictor=1))
    return _tiff_ifd_chain(endian, pages)


TIFF_STATS_SCHEMA = PPM_STATS_SCHEMA


def decode_tiff_stats(blobs: DataFrame, page: int = 0) -> DataFrame:
    """Arrow-batched REAL decode of baseline TIFF payloads (both byte
    orders, none/PackBits/LZW/Deflate, strips or §15 tiles, gray/RGB):
    per-image width, height and per-channel means; malformed /
    out-of-subset payloads yield ok=false rows. ``page`` selects a
    pyramid level via the IFD chain (r12: the whole-slide-image read
    path — page 0 is the base resolution, higher pages the reduced
    levels encode_tiff_pyramid writes)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_tiff(bytes(payload) if payload else b"",
                                     page=page)
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, px = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                means = _channel_means(np.ascontiguousarray(px)
                                       .reshape(-1))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, TIFF_STATS_SCHEMA)


AREA_RESIZED_SCHEMA = ("doc_id long, out_w int, out_h int, ok boolean, "
                       "pixels binary")


def area_downscale_images(blobs: DataFrame, factor: int = 2) -> DataFrame:
    """REAL area-average (antialiased) downscale by an integer factor —
    the resize a training pipeline actually wants (nearest-neighbor
    aliases hard; box-filter averaging is the standard anti-aliased
    integer-factor reduction): every ``factor x factor`` input block
    becomes one output pixel holding the FLOOR of the block mean per
    channel (exact integer arithmetic — sum >> 2k, no float rounding to
    disagree across engines). Decodes any supported image format by
    magic dispatch; images whose dimensions don't divide by ``factor``
    and undecodable payloads yield ok=false with an empty buffer
    (poison-safe). Vectorized: one reshape-sum per image, no per-pixel
    Python."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "out_w", "out_h", "ok", "pixels")}
            for doc_id, b in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(b) if b else b""
                parsed = _decode_image(payload)
                rows["doc_id"].append(doc_id)
                if (parsed is None or parsed[0] % factor
                        or parsed[1] % factor):
                    rows["out_w"].append(0)
                    rows["out_h"].append(0)
                    rows["ok"].append(False)
                    rows["pixels"].append(b"")
                    continue
                w, h, px = parsed
                s = (np.ascontiguousarray(px).astype(np.int64)
                     .reshape(h // factor, factor, w // factor, factor, 3)
                     .sum(axis=(1, 3)))
                out = (s // (factor * factor)).astype(np.uint8)
                rows["out_w"].append(w // factor)
                rows["out_h"].append(h // factor)
                rows["ok"].append(True)
                rows["pixels"].append(out.tobytes())
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(do_resize, AREA_RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# TGA (Truevision TGA 2.0, public spec): 24-bit truecolor, uncompressed
# (type 2) and RLE (type 10), both row origins. The simplest widely-
# deployed RLE container — exercises the packet walk (repetition vs raw,
# 128-pixel cap) without palette/entropy machinery.
# ---------------------------------------------------------------------------

def _parse_tga(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Parse a 24bpp TGA payload (types 2 and 10, no colormap): header,
    optional image-ID skip, BGR pixel stream (RLE packets for type 10 —
    repetition packets replicate one pixel, raw packets carry literals,
    both capped at 128 pixels), bottom-up row order unless descriptor
    bit 5 (top-to-bottom) is set. Malformed payloads return None (the
    poison-safe convention)."""
    if len(payload) < 18:
        return None
    idlen, cmap, itype = payload[0], payload[1], payload[2]
    if cmap != 0 or itype not in (2, 10):
        return None
    w = int.from_bytes(payload[12:14], "little")
    h = int.from_bytes(payload[14:16], "little")
    depth, desc = payload[16], payload[17]
    if w == 0 or h == 0 or depth != 24:
        return None
    pos = 18 + idlen
    npx = w * h
    if itype == 2:
        need = npx * 3
        if pos + need > len(payload):
            return None
        flat = np.frombuffer(payload[pos:pos + need], dtype=np.uint8)
    else:
        out = np.empty(npx * 3, dtype=np.uint8)
        filled = 0
        while filled < npx:
            if pos >= len(payload):
                return None
            c = payload[pos]
            pos += 1
            cnt = min((c & 0x7F) + 1, npx - filled)
            if c & 0x80:          # repetition packet: one pixel, cnt x
                if pos + 3 > len(payload):
                    return None
                px = np.frombuffer(payload[pos:pos + 3], np.uint8)
                pos += 3
                out[filled * 3:(filled + cnt) * 3] = np.tile(px, cnt)
            else:                 # raw packet: cnt literal pixels
                need = cnt * 3
                if pos + need > len(payload):
                    return None
                out[filled * 3:(filled + cnt) * 3] = np.frombuffer(
                    payload[pos:pos + need], np.uint8)
                pos += need
            filled += cnt
        flat = out
    img = flat.reshape(h, w, 3)[:, :, ::-1]   # BGR -> RGB
    if not (desc & 0x20):                      # bottom-up storage
        img = img[::-1]
    return w, h, np.ascontiguousarray(img)


def encode_tga(rgb: "np.ndarray", rle: bool = False,
               top_down: bool = True) -> bytes:
    """Minimal 24bpp TGA writer for test/oracle payload synthesis:
    type 2 (raw BGR) or type 10 (real RLE — maximal repetition runs,
    literal packets broken before the next run, both capped at 128),
    either row origin. Ships its own encoder so roundtrip tests
    exercise every decoder branch."""
    import struct

    h, w, _ = rgb.shape
    img = rgb if top_down else rgb[::-1]
    bgr = np.ascontiguousarray(img[:, :, ::-1]).reshape(-1, 3)
    desc = 0x20 if top_down else 0
    head = (bytes([0, 0, 10 if rle else 2]) + bytes(5)
            + struct.pack("<HHHH", 0, 0, w, h) + bytes([24, desc]))
    if not rle:
        return head + bgr.tobytes()
    px = [bytes(p) for p in bgr]
    out = bytearray(head)
    i, n = 0, len(px)
    while i < n:
        run = 1
        while i + run < n and px[i + run] == px[i] and run < 128:
            run += 1
        if run >= 2:
            out.append(0x80 | (run - 1))
            out += px[i]
            i += run
        else:
            j = i + 1
            while (j < n and (j - i) < 128
                   and (j + 1 >= n or px[j] != px[j + 1])):
                j += 1
            out.append((j - i) - 1)
            for k in range(i, j):
                out += px[k]
            i = j
    return bytes(out)


TGA_STATS_SCHEMA = PPM_STATS_SCHEMA


def decode_tga_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of TGA payloads (types 2/10, both row
    origins): per-image width, height and per-channel means; malformed
    payloads yield ok=false rows."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_tga(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, px = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                means = _channel_means(np.ascontiguousarray(px)
                                       .reshape(-1))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, TGA_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# QOI ("Quite OK Image", qoiformat.org, public domain spec): the modern
# single-pass byte-oriented codec — 64-entry hash index, delta (DIFF/
# LUMA) ops, run-length op, literal RGB/RGBA fallbacks. One tight
# per-op walk; no entropy coder, no filters.
# ---------------------------------------------------------------------------

_QOI_END = bytes(7) + b"\x01"


def _qoi_hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def _parse_qoi(payload: bytes) -> tuple[int, int, "np.ndarray"] | None:
    """Decode a QOI payload (3-channel, linear or sRGB flag accepted):
    14-byte header, op-chunk walk maintaining the previous pixel, the
    64-entry seen-pixel index and RUN expansion, terminated by the
    7x00+01 end marker (verified). Per-op Python like the GIF LZW walk
    — QOI payloads here are thumbnails; the production seam is the
    same C-kernel swap note."""
    if len(payload) < 14 + 8 or payload[:4] != b"qoif":
        return None
    w = int.from_bytes(payload[4:8], "big")
    h = int.from_bytes(payload[8:12], "big")
    channels, cspace = payload[12], payload[13]
    if w == 0 or h == 0 or channels not in (3, 4) or cspace > 1:
        return None
    if payload[-8:] != _QOI_END:
        return None
    npx = w * h
    out = np.empty((npx, 3), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos, i, end = 14, 0, len(payload) - 8
    while i < npx:
        if pos >= end:
            return None
        op = payload[pos]
        pos += 1
        if op == 0xFE:            # QOI_OP_RGB
            if pos + 3 > end:
                return None
            r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
            pos += 3
        elif op == 0xFF:          # QOI_OP_RGBA
            if pos + 4 > end:
                return None
            r, g, b, a = (payload[pos], payload[pos + 1],
                          payload[pos + 2], payload[pos + 3])
            pos += 4
        else:
            tag = op >> 6
            if tag == 0:          # QOI_OP_INDEX
                r, g, b, a = index[op & 0x3F]
            elif tag == 1:        # QOI_OP_DIFF (bias 2)
                r = (r + ((op >> 4) & 3) - 2) & 0xFF
                g = (g + ((op >> 2) & 3) - 2) & 0xFF
                b = (b + (op & 3) - 2) & 0xFF
            elif tag == 2:        # QOI_OP_LUMA (bias 32 / 8)
                if pos >= end:
                    return None
                dg = (op & 0x3F) - 32
                b2 = payload[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0x0F) - 8) & 0xFF
            else:                 # QOI_OP_RUN (bias -1)
                run = min((op & 0x3F) + 1, npx - i)
                out[i:i + run] = (r, g, b)
                i += run
                # run repeats the PREVIOUS pixel: index already holds it
                continue
        index[_qoi_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b)
        i += 1
    return w, h, out.reshape(h, w, 3)


def encode_qoi(rgb: "np.ndarray") -> bytes:
    """Reference-faithful QOI encoder (greedy, per the spec's reference
    flow): RUN first, then INDEX, then DIFF, then LUMA, else literal
    RGB. 3-channel header; ships as the roundtrip twin so every decode
    op is exercised by synthetic payloads."""
    import struct

    h, w, _ = rgb.shape
    px = rgb.reshape(-1, 3)
    out = bytearray(b"qoif" + struct.pack(">II", w, h) + bytes([3, 0]))
    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b in px.tolist():
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        hidx = _qoi_hash(r, g, b, 255)
        if index[hidx] == (r, g, b, 255):
            out.append(hidx)
        else:
            index[hidx] = (r, g, b, 255)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2)
                           | (db + 2))
            elif (-32 <= dg <= 31 and -8 <= dr - dg <= 7
                  and -8 <= db - dg <= 7):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes([0xFE, r, g, b])
        pr, pg, pb = r, g, b
        index[_qoi_hash(pr, pg, pb, pa)] = (pr, pg, pb, pa)
    if run:
        out.append(0xC0 | (run - 1))
    return bytes(out) + _QOI_END


QOI_STATS_SCHEMA = PPM_STATS_SCHEMA


def decode_qoi_stats(blobs: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode of QOI payloads: per-image width,
    height and per-channel means; malformed payloads yield ok=false
    rows."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_qoi(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    for k in ("mean_r", "mean_g", "mean_b"):
                        rows[k].append(0.0)
                    continue
                w, h, px = parsed
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                means = _channel_means(np.ascontiguousarray(px)
                                       .reshape(-1))
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(means[ch])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, QOI_STATS_SCHEMA)


def encode_avi_mjpeg(frames: list[bytes], w: int, h: int,
                     fps: int = 10) -> bytes:
    """Minimal RIFF/AVI writer around MJPEG frames (Microsoft AVI RIFF
    spec + OpenDML): RIFF('AVI ') -> LIST(hdrl){avih, LIST(strl){strh
    'vids'/'MJPG', strf BITMAPINFOHEADER}} -> LIST(movi){'00dc' chunks,
    word-aligned} -> idx1. Fixture/test synthesis twin of
    ``_parse_avi`` — a mis-parsed header, chunk bound, or pad byte
    breaks the roundtrip."""
    import struct

    n = len(frames)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    bufsize = max((len(f) for f in frames), default=0)
    avih = struct.pack("<14I", 1_000_000 // fps, 0, 0, 0x10, n, 0, 1,
                       bufsize, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n,
                          bufsize, 0xFFFFFFFF, 0)
            + struct.pack("<4h", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh)
                     + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx, off = bytearray(), 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_avi(payload: bytes
               ) -> tuple[int, int, int, int, list[bytes]] | None:
    """REAL RIFF/AVI container walk for MJPEG video: validates the RIFF
    envelope, reads avih (fps, frame count, dims), requires one 'vids'
    stream with MJPG handler + MJPG biCompression, collects the movi
    '00dc'/'00db' chunks in order with word-aligned advance, and
    cross-checks idx1 (when present) and dwTotalFrames against the
    chunks actually found. Returns (fps, w, h, n_frames, frames) or
    None — compressed frame payloads come back undecoded so the caller
    samples BEFORE paying any JPEG decode cost."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF":
        return None
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if payload[8:12] != b"AVI " or 8 + riff_size > len(payload):
        return None
    end = 8 + riff_size

    fps = w = h = n_decl = None
    vids_mjpg = False
    frames: list[bytes] = []
    idx1_count = None

    def walk(lo: int, hi: int, depth: int) -> bool:
        nonlocal fps, w, h, n_decl, vids_mjpg, idx1_count
        pos = lo
        stream_fcc = None
        while pos + 8 <= hi:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_lo, body_hi = pos + 8, pos + 8 + size
            if body_hi > hi:
                return False
            if fourcc == b"LIST":
                if size < 4:
                    return False
                ltype = payload[body_lo:body_lo + 4]
                if ltype == b"movi":
                    if not _avi_movi(payload, body_lo + 4, body_hi,
                                     frames):
                        return False
                elif not walk(body_lo + 4, body_hi, depth + 1):
                    return False
            elif fourcc == b"avih":
                if size < 56:
                    return False
                vals = struct.unpack_from("<14I", payload, body_lo)
                if vals[0] == 0:
                    return False
                fps = round(1_000_000 / vals[0])
                n_decl, w, h = vals[4], vals[8], vals[9]
            elif fourcc == b"strh":
                if size < 8:
                    return False
                stream_fcc = (payload[body_lo:body_lo + 4],
                              payload[body_lo + 4:body_lo + 8])
            elif fourcc == b"strf":
                if stream_fcc and stream_fcc[0] == b"vids":
                    if size < 40:
                        return False
                    comp = payload[body_lo + 16:body_lo + 20]
                    if stream_fcc[1] == b"MJPG" and comp == b"MJPG":
                        vids_mjpg = True
            elif fourcc == b"idx1":
                idx1_count = size // 16
            pos = body_hi + (size % 2)
        return True

    if not walk(12, end, 0):
        return None
    if (fps is None or not vids_mjpg or n_decl != len(frames)
            or (idx1_count is not None and idx1_count != len(frames))):
        return None
    return fps, w, h, len(frames), frames


def _avi_movi(payload: bytes, lo: int, hi: int,
              frames: list[bytes]) -> bool:
    import struct

    pos = lo
    while pos + 8 <= hi:
        fourcc = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > hi:
            return False
        if fourcc[2:4] in (b"dc", b"db"):
            frames.append(payload[pos + 8:pos + 8 + size])
        pos += 8 + size + (size % 2)
    return pos == hi or pos + 8 > hi


VIDEO_FRAMES_SCHEMA = ("doc_id long, frame_idx int, n_frames int, "
                       "fps int, img_w int, img_h int, ok boolean, "
                       "mean_r double, mean_g double, mean_b double")


def sample_video_frames(blobs: DataFrame, stride: int = 2) -> DataFrame:
    """Video frame sampling over MJPEG-in-AVI payloads: walk the RIFF
    container, keep every ``stride``-th frame, JPEG-decode ONLY the
    sampled frames (the container walk skips chunk-to-chunk without
    touching skipped entropy data — the whole point of frame sampling
    at 100 TB), and emit per-sampled-frame channel means. Malformed
    containers yield one ok=false row with frame_idx=-1; a sampled
    frame that fails JPEG decode yields its own ok=false row. Arrow
    mapInPandas; payload bytes never shuffle."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "frame_idx", "n_frames", "fps",
                     "img_w", "img_h", "ok",
                     "mean_r", "mean_g", "mean_b")}

            def emit(doc_id, fi, nf, fps, w, h, ok, m):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(fi)
                rows["n_frames"].append(nf)
                rows["fps"].append(fps)
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(ok)
                for ch, k in enumerate(("mean_r", "mean_g", "mean_b")):
                    rows[k].append(m[ch] if m is not None else 0.0)

            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_avi(bytes(payload) if payload else b"")
                if parsed is None:
                    emit(doc_id, -1, 0, 0, 0, 0, False, None)
                    continue
                fps, w, h, nf, frames = parsed
                for fi in range(0, nf, stride):
                    dec = _parse_jpeg(frames[fi])
                    if dec is None:
                        emit(doc_id, fi, nf, fps, 0, 0, False, None)
                        continue
                    fw, fh, px = dec
                    means = _channel_means(px.reshape(-1))
                    emit(doc_id, fi, nf, fps, fw, fh, True, means)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, VIDEO_FRAMES_SCHEMA)


SOBEL_STATS_SCHEMA = ("doc_id long, img_w int, img_h int, ok boolean, "
                      "n_interior int, sum_grad long, mean_grad double")


def edge_sobel_stats(blobs: DataFrame) -> DataFrame:
    """Edge-energy feature extraction over REAL-decoded P6 PPM payloads:
    integer luminance ((r+g+b) // 3), 3x3 Sobel Gx/Gy over interior
    pixels, per-image L1 gradient magnitude sum (|gx|+|gy| — exact
    integers end to end) and its mean. Images with no interior (w or h
    < 3) report n_interior=0 with a 0 sum; undecodable payloads report
    ok=false. One Arrow map stage, numpy-vectorized convolution."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok",
                     "n_interior", "sum_grad", "mean_grad")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_ppm(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["img_w"].append(0)
                    rows["img_h"].append(0)
                    rows["ok"].append(False)
                    rows["n_interior"].append(0)
                    rows["sum_grad"].append(0)
                    rows["mean_grad"].append(0.0)
                    continue
                w, h, raw = parsed
                px = (np.frombuffer(raw, dtype=np.uint8)
                      .reshape(h, w, 3).astype(np.int64))
                g = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                if w < 3 or h < 3:
                    rows["n_interior"].append(0)
                    rows["sum_grad"].append(0)
                    rows["mean_grad"].append(0.0)
                    continue
                gx = (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:]
                      - g[:-2, :-2] - 2 * g[1:-1, :-2] - g[2:, :-2])
                gy = (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:]
                      - g[:-2, :-2] - 2 * g[:-2, 1:-1] - g[:-2, 2:])
                mag = np.abs(gx) + np.abs(gy)
                n_int = mag.size
                s = int(mag.sum())
                rows["n_interior"].append(n_int)
                rows["sum_grad"].append(s)
                rows["mean_grad"].append(s / n_int)
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, SOBEL_STATS_SCHEMA)


DOMINANT_COLOR_SCHEMA = ("doc_id long, img_w int, img_h int, ok boolean, "
                         "dom_bin int, dom_count int, "
                         "dom_r double, dom_g double, dom_b double")


def dominant_color_stats(blobs: DataFrame) -> DataFrame:
    """Dominant-color extraction over REAL-decoded P6 PPMs: quantize
    every pixel into the fixed 4x4x4 RGB cube (bin = (r>>6)<<4 |
    (g>>6)<<2 | (b>>6) — no training, engine-portable), take the modal
    bin (ties -> lowest bin id) and the exact mean color of the pixels
    inside it. The content-based shard key / thumbnail descriptor next
    to dHash: dHash answers "same image?", the dominant cube answers
    "what does it look like?". One Arrow map stage, numpy bincount;
    undecodable payloads report ok=false."""
    import numpy as np

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "img_w", "img_h", "ok", "dom_bin",
                     "dom_count", "dom_r", "dom_g", "dom_b")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_ppm(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    for k, v in (("img_w", 0), ("img_h", 0),
                                 ("ok", False), ("dom_bin", -1),
                                 ("dom_count", 0), ("dom_r", 0.0),
                                 ("dom_g", 0.0), ("dom_b", 0.0)):
                        rows[k].append(v)
                    continue
                w, h, raw = parsed
                px = (np.frombuffer(raw, dtype=np.uint8)
                      .reshape(-1, 3).astype(np.int64))
                bins = ((px[:, 0] >> 6) << 4 | (px[:, 1] >> 6) << 2
                        | (px[:, 2] >> 6))
                counts = np.bincount(bins, minlength=64)
                dom = int(counts.argmax())  # argmax -> first (lowest) max
                sel = px[bins == dom]
                rows["img_w"].append(w)
                rows["img_h"].append(h)
                rows["ok"].append(True)
                rows["dom_bin"].append(dom)
                rows["dom_count"].append(int(counts[dom]))
                rows["dom_r"].append(float(sel[:, 0].sum()) / len(sel))
                rows["dom_g"].append(float(sel[:, 1].sum()) / len(sel))
                rows["dom_b"].append(float(sel[:, 2].sum()) / len(sel))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, DOMINANT_COLOR_SCHEMA)


GOERTZEL_SCHEMA = ("doc_id long, n_samples int, ok boolean, "
                   "e_dc decimal(38,0), e_k2 decimal(38,0)")

# 2*cos(2*pi*k/N) in integer nanos for N=16: k=0 -> 2.0 exactly,
# k=2 -> sqrt(2) = 1.414213562... (truncated, a shared plan constant
# both engines spell identically)
_GOERTZEL_COEFFS = ((("e_dc"), 2_000_000_000), (("e_k2"), 1_414_213_562))


def goertzel_energy(blobs: DataFrame) -> DataFrame:
    """Single-bin DFT energy (Goertzel, 1958) over REAL-decoded PCM16
    WAV clips — the tone-detection / spectral-peak primitive that needs
    no FFT: s[n] = x[n] + coeff*s[n-1] - s[n-2], then
    E = s1^2 + s2^2 - coeff*s1*s2. Evaluated in EXACT integer nanos
    (x scaled by 1e9; each coeff*s product divided back by 1e9 with
    TRUNCATION toward zero — SQL integer-division semantics, NOT
    Python floor: s goes negative mid-recurrence and DuckDB's // is a
    truncating divide) so the 16-step recurrence walks bit-identical
    values in any engine — the DuckDB twin replays it as a recursive
    CTE over HUGEINTs, the same scheme as the ADPCM predictor. Two
    bins ship: DC (coeff exactly 2.0 — a pure-integer sanity anchor)
    and k=2 of N=16 (coeff = sqrt 2 in nanos). Energies emitted as
    DECIMAL(38,0) in nanos^2 units: no float conversion anywhere,
    nothing to get ulp-wrong. Arrow map stage; payloads never
    shuffle."""
    from decimal import Decimal

    def tdiv(a: int, b: int) -> int:
        # truncate toward zero, matching SQL integer division
        return -((-a) // b) if a < 0 else a // b

    def run(samples, coeff: int) -> int:
        s1 = s2 = 0
        for x in samples:
            s = int(x) * 10**9 + tdiv(coeff * s1, 10**9) - s2
            s2, s1 = s1, s
        return s1 * s1 + s2 * s2 - tdiv(coeff * s1, 10**9) * s2

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "n_samples", "ok", "e_dc", "e_k2")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                parsed = _parse_wav(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if parsed is None:
                    rows["n_samples"].append(0)
                    rows["ok"].append(False)
                    rows["e_dc"].append(Decimal(0))
                    rows["e_k2"].append(Decimal(0))
                    continue
                _, _, smp = parsed
                rows["n_samples"].append(len(smp))
                rows["ok"].append(True)
                for name, coeff in _GOERTZEL_COEFFS:
                    rows[name].append(Decimal(run(smp, coeff)))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(stats, GOERTZEL_SCHEMA)


# Fixed-point DCT-II basis for N=4, scale 2^14: CQ[u][x] =
# round(cos(pi*(2x+1)*u/8) * 16384). Plan-literal integers shared with
# the DuckDB twin (phash_cq_sql_list), so the transform is EXACT
# integer arithmetic on both engines — no libm cos in any data path.
PHASH_CQ: tuple[tuple[int, ...], ...] = (
    (16384, 16384, 16384, 16384),
    (15137, 6270, -6270, -15137),
    (11585, -11585, -11585, 11585),
    (6270, -15137, 15137, -6270),
)

PHASH_SCHEMA = "doc_id long, ok boolean, phash long"


def phash_cq_sql_list() -> str:
    """The CQ table as a flat 16-element SQL list literal (row-major
    cq[u*4 + x + 1]) for the oracle twin."""
    flat = [str(v) for row in PHASH_CQ for v in row]
    return "[" + ", ".join(flat) + "]"


def _phash_value(px: "np.ndarray") -> int:
    """DCT perceptual hash over a 4x4 decoded image: fixed-point luma
    (the dhash weights), exact integer 2D DCT-II via the scaled CQ
    basis (T = CQ @ L @ CQ^T — every coefficient an exact int64), then
    one bit per AC coefficient (row-major over (v, u), DC skipped):
    1 iff coef > median of the 15 ACs (the 8th smallest — exact
    integer order statistic). MSB-first, 15 bits. Unlike dHash
    (adjacent-pixel gradients), pHash keys on the low-frequency
    spectrum, so it survives brightness scaling and high-frequency
    noise — the second standard perceptual fingerprint."""
    cq = np.array(PHASH_CQ, dtype=np.int64)
    luma = (px.astype(np.int64) @ _LUMA_WEIGHTS) >> 8
    t = cq @ luma @ cq.T
    acs = t.reshape(-1)[1:]
    med = np.sort(acs)[7]
    bits = (acs > med).astype(np.int64)
    weights = np.int64(1) << np.arange(14, -1, -1, dtype=np.int64)
    return int((bits * weights).sum())


def image_phash(blobs: DataFrame) -> DataFrame:
    """Arrow-batched DCT perceptual hash over REAL-decoded 4x4 image
    payloads (magic dispatch, same decoder as image_dhash). Non-4x4 or
    undecodable payloads yield ok=false, phash 0 (poison-safe) — the
    production shape resizes to the hash grid first (compose with
    resize_images)."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "ok", "phash")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                img = _decode_image(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if img is None or img[0] != 4 or img[1] != 4:
                    rows["ok"].append(False)
                    rows["phash"].append(0)
                    continue
                rows["ok"].append(True)
                rows["phash"].append(_phash_value(img[2]))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(hashes, PHASH_SCHEMA)


LUMA_HIST_SCHEMA = "doc_id long, bin int, n int"


def image_luma_histogram(blobs: DataFrame, n_bins: int = 16) -> DataFrame:
    """Arrow-batched per-image luma histogram over REAL-decoded
    payloads (same decoder/dispatch as image_dhash): fixed-point luma
    (the dhash weights), bins of width 256/n_bins, one (doc_id, bin,
    count) row per occupied bin — the pixel-statistics base for
    exposure audits and the entropy feature (plans/q_llm.py::
    mm_image_entropy computes Shannon entropy from these counts
    JVM-side). Undecodable payloads emit no rows (poison-safe:
    downstream left-joins decide the default)."""
    width = 256 // n_bins

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "bin": [], "n": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                img = _decode_image(bytes(payload) if payload else b"")
                if img is None:
                    continue
                luma = ((img[2].astype(np.int64) @ _LUMA_WEIGHTS)
                        >> 8)
                binned = np.clip(luma.reshape(-1) // width, 0,
                                 n_bins - 1)
                vals, counts = np.unique(binned, return_counts=True)
                for b, c in zip(vals, counts):
                    rows["doc_id"].append(doc_id)
                    rows["bin"].append(int(b))
                    rows["n"].append(int(c))
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(hist, LUMA_HIST_SCHEMA)


LUMA_VEC_SCHEMA = "doc_id long, ok boolean, luma array<long>"


def image_luma_vector(blobs: DataFrame) -> DataFrame:
    """Arrow-batched per-pixel luma vector over REAL-decoded payloads
    (row-major int64 list; the dhash fixed-point weights) — the
    pixel-level handle for pairwise metrics computed JVM-side (SSIM in
    plans/q_llm.py::mm_image_ssim). Undecodable payloads yield
    ok=false with an empty list."""

    def vecs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "ok": [], "luma": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                img = _decode_image(bytes(payload) if payload else b"")
                rows["doc_id"].append(doc_id)
                if img is None:
                    rows["ok"].append(False)
                    rows["luma"].append([])
                    continue
                luma = ((img[2].astype(np.int64) @ _LUMA_WEIGHTS) >> 8)
                rows["ok"].append(True)
                rows["luma"].append([int(v) for v in luma.reshape(-1)])
            yield pd.DataFrame(rows)

    return blobs.mapInPandas(vecs, LUMA_VEC_SCHEMA)

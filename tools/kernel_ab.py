#!/usr/bin/env python3
"""A/B micro-benchmark for the media decode kernels: the numpy-vectorized
channel-mean / amplitude-stats inner loops (multimodal.py) vs the
per-element pure-Python loops they replaced in round 4. Runs on synthetic
payloads, no Spark — isolates the kernel cost that dominates an Arrow
batch at media scale. Prints one JSON line with per-kernel timings and
speedups."""

from __future__ import annotations

import json
import os
import struct
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_wsi_spark.operators.multimodal import (
    _STD_AC_LUMA_BITS,
    _STD_AC_LUMA_VALS,
    _BitReader,
    _huff_lut,
    _huff_table,
    _parse_ppm,
    _parse_wav,
)


def old_ppm_means(rgb: bytes, n: int) -> list[float]:
    return [sum(rgb[3 * p + ch] for p in range(n)) / float(n)
            for ch in range(3)]


def new_ppm_means(rgb: bytes) -> list[float]:
    from mapreduce_wsi_spark.operators.multimodal import _channel_means
    return _channel_means(np.frombuffer(rgb, dtype=np.uint8))


def old_wav_stats(data: bytes) -> tuple[float, int]:
    n = len(data) // 2
    samples = list(struct.unpack_from(f"<{n}h", data, 0))
    return sum(samples) / float(n), sum(s * s for s in samples)


def new_wav_stats(data: bytes) -> tuple[float, int]:
    s64 = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return float(s64.sum()) / s64.size, int(np.dot(s64, s64))


def old_jpeg_symbols(data: bytes, table: dict, n_syms: int) -> list[int]:
    """Reference: the bit-at-a-time canonical tree walk the r5
    table-driven reader replaced (incl. 0xFF00 un-stuffing)."""
    acc = nbits = pos = 0
    out = []

    def read_bit():
        nonlocal acc, nbits, pos
        if nbits == 0:
            if pos >= len(data):
                return None
            b = data[pos]
            if b == 0xFF and pos + 1 < len(data) and data[pos + 1] == 0x00:
                pos += 2
            else:
                pos += 1
            acc = b
            nbits = 8
        nbits -= 1
        return (acc >> nbits) & 1

    for _ in range(n_syms):
        code = 0
        for length in range(1, 17):
            bit = read_bit()
            if bit is None:
                return out
            code = (code << 1) | bit
            sym = table.get((length, code))
            if sym is not None:
                out.append(sym)
                break
    return out


def new_jpeg_symbols(data: bytes, lut, n_syms: int) -> list[int]:
    rd = _BitReader(data, 0)
    out = []
    for _ in range(n_syms):
        s = rd.decode_symbol(lut)
        if s is None:
            break
        out.append(s)
    return out


def timeit(fn, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    rng = np.random.default_rng(7)
    # 256x256 image / 1 s of 44.1 kHz audio: realistic per-row payloads
    w = h = 256
    rgb = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    pcm = rng.integers(-32768, 32768, size=44_100,
                       dtype=np.int16).astype("<i2").tobytes()

    ppm_payload = b"P6\n%d %d\n255\n" % (w, h) + rgb
    wav_payload = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
                   + b"fmt " + struct.pack("<I", 16)
                   + struct.pack("<HHIIHH", 1, 1, 44_100, 88_200, 2, 16)
                   + b"data" + struct.pack("<I", len(pcm)) + pcm)
    assert _parse_ppm(ppm_payload) is not None
    assert _parse_wav(wav_payload) is not None

    ppm_old = timeit(lambda: old_ppm_means(rgb, w * h), 3)
    ppm_new = timeit(lambda: new_ppm_means(rgb), 3)
    wav_old = timeit(lambda: old_wav_stats(pcm), 3)
    wav_new = timeit(lambda: new_wav_stats(pcm), 3)
    assert np.allclose(old_ppm_means(rgb, w * h), new_ppm_means(rgb))
    assert old_wav_stats(pcm)[1] == new_wav_stats(pcm)[1]

    # JPEG entropy decode: ~200k Annex-K AC symbols in one stream — the
    # per-symbol Huffman stage isolated from block math
    from mapreduce_wsi_spark.operators.multimodal import _BitWriter, _huff_codes
    table = _huff_table(_STD_AC_LUMA_BITS, _STD_AC_LUMA_VALS)
    codes = _huff_codes(_STD_AC_LUMA_BITS, _STD_AC_LUMA_VALS)
    syms = [int(v) for v in rng.choice(_STD_AC_LUMA_VALS, size=200_000)]
    wr = _BitWriter()
    for sym in syms:
        ln, code = codes[sym]
        wr.write(code, ln)
    stream = wr.flush()
    lut = _huff_lut(table)
    assert old_jpeg_symbols(stream, table, len(syms)) == syms
    assert new_jpeg_symbols(stream, lut, len(syms)) == syms
    huf_old = timeit(lambda: old_jpeg_symbols(stream, table, len(syms)), 3)
    huf_new = timeit(lambda: new_jpeg_symbols(stream, lut, len(syms)), 3)

    print(json.dumps({
        "ppm_mean_old_sec": round(ppm_old, 6),
        "ppm_mean_new_sec": round(ppm_new, 6),
        "ppm_speedup": round(ppm_old / ppm_new, 1),
        "wav_stats_old_sec": round(wav_old, 6),
        "wav_stats_new_sec": round(wav_new, 6),
        "wav_speedup": round(wav_old / wav_new, 1),
        "jpeg_huffman_old_sec": round(huf_old, 6),
        "jpeg_huffman_new_sec": round(huf_new, 6),
        "jpeg_huffman_speedup": round(huf_old / huf_new, 1),
    }))


if __name__ == "__main__":
    main()

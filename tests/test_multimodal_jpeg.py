"""Baseline-JPEG codec tests: the registered query's DC/EOB path is
oracle-checked end-to-end (jpeg_decode_stats); these tests cover what the
SQL-built fixture deliberately doesn't put on the wire — nonzero AC
coefficients, ZRL runs, a varied (zigzag-ordered) quantization table,
restart markers with DC-predictor reset, and the loud-error scope — each
against an INDEPENDENT reference (explicit cosine-sum IDCT, no shared
code with the decoder's matrix form)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from reddit_sentiment_spark_streaming_pipeline_spark.operators.multimodal import (
    _ZIGZAG,
    decode_image,
    decode_jpeg,
    jpeg_media_table,
)


class BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def tobytes(self, pad_with_ones: bool = True) -> bytes:
        bits = list(self.bits)
        while len(bits) % 8:
            bits.append(1 if pad_with_ones else 0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i:i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:  # byte stuffing
                out.append(0x00)
        return bytes(out)


def _segments(w: int, h: int, quant_zz: list[int],
              dht_segments: list[bytes]) -> tuple[bytes, bytes]:
    """(header bytes through SOS, EOI) for a 1-component baseline JPEG."""
    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes(quant_zz)
    out += b"\xff\xdb" + (len(dqt) + 2).to_bytes(2, "big") + dqt
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes(
        [1, 1, 0x11, 0]
    )
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for seg in dht_segments:
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos
    return bytes(out), b"\xff\xd9"


def _dht(tc: int, th: int, by_length: dict[int, list[int]]) -> bytes:
    counts = [len(by_length.get(ln, [])) for ln in range(1, 17)]
    syms = [s for ln in range(1, 17) for s in by_length.get(ln, [])]
    return bytes([tc << 4 | th]) + bytes(counts) + bytes(syms)


def _codes(by_length: dict[int, list[int]]) -> dict[int, tuple[int, int]]:
    """symbol -> (length, canonical code), matching JPEG's DHT rules."""
    out = {}
    code = 0
    for ln in range(1, 17):
        for s in by_length.get(ln, []):
            out[s] = (ln, code)
            code += 1
        code <<= 1
    return out


def _reference_idct(nat: np.ndarray) -> np.ndarray:
    """Explicit JPEG IDCT as the spec's double cosine sum — shares no
    code with the decoder's separable matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                for u in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * nat[v, u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[y, x] = s / 4
    return np.clip(np.rint(out) + 128, 0, 255)


DC_TBL = {2: [0x02]}                      # one symbol: category 2
AC_TBL = {2: [0x01, 0xF0], 3: [0x00]}     # (run0,size1), ZRL, EOB


def _encode_block(bw: BitWriter, dc_diff: int) -> None:
    dc = _codes(DC_TBL)
    ln, code = dc[0x02]
    bw.write(code, ln)
    amp = dc_diff if dc_diff > 0 else dc_diff + 3  # category-2 EXTEND
    bw.write(amp, 2)


def test_ac_zrl_and_varied_quant_table():
    # coefficients (zigzag order): DC=-2, zz1=+1, 16-zero ZRL, zz18=-1, EOB
    quant_zz = list(range(1, 65))  # varied: proves zigzag-ordered dequant
    ac = _codes(AC_TBL)
    bw = BitWriter()
    _encode_block(bw, -2)
    ln, code = ac[0x01]; bw.write(code, ln); bw.write(1, 1)   # zz1 = +1
    ln, code = ac[0xF0]; bw.write(code, ln)                    # ZRL
    ln, code = ac[0x01]; bw.write(code, ln); bw.write(0, 1)   # zz18 = -1
    ln, code = ac[0x00]; bw.write(code, ln)                    # EOB
    head, eoi = _segments(8, 8, quant_zz,
                          [_dht(0, 0, DC_TBL), _dht(1, 0, AC_TBL)])
    w, h, px = decode_jpeg(head + bw.tobytes() + eoi)
    assert (w, h) == (8, 8)

    nat = np.zeros((8, 8))
    for zz_pos, coef in ((0, -2), (1, 1), (18, -1)):
        natural = _ZIGZAG[zz_pos]
        nat[natural // 8, natural % 8] = coef * quant_zz[zz_pos]
    expected = _reference_idct(nat)
    assert np.array_equal(px.reshape(8, 8), expected.astype(np.uint8))


def test_restart_marker_resets_dc_prediction():
    # two 8x8 MCUs separated by RST0: each carries dc_diff = -2, so with
    # a correct predictor reset BOTH decode to DC=-2 (identical rasters);
    # without the reset the second block would sit at -4
    quant_zz = [16] * 64
    ac = _codes(AC_TBL)

    def one_block() -> bytes:
        bw = BitWriter()
        _encode_block(bw, -2)
        ln, code = ac[0x00]; bw.write(code, ln)
        return bw.tobytes()

    entropy = one_block() + b"\xff\xd0" + one_block()
    head, eoi = _segments(16, 8, quant_zz,
                          [_dht(0, 0, DC_TBL), _dht(1, 0, AC_TBL)])
    w, h, px = decode_jpeg(head + entropy + eoi)
    raster = px.reshape(8, 16)
    left, right = raster[:, :8], raster[:, 8:]
    assert np.array_equal(left, right)
    nat = np.zeros((8, 8)); nat[0, 0] = -2 * 16
    assert np.array_equal(left, _reference_idct(nat).astype(np.uint8))


def test_builder_payload_matches_closed_form(spark):
    rows = (
        jpeg_media_table(spark, "/root/testdata/sf0.001")
        .orderBy("media_id").limit(3).collect()
    )
    assert rows
    for r in rows:
        w, h, px = decode_jpeg(bytes(r.payload))
        assert (w, h) == (r.w, r.h)
        raster = px.reshape(h, w)
        import hashlib

        nb = (w // 8) * (h // 8)
        hexstream = "".join(
            hashlib.md5(f"jpg{r.media_id}:{i}".encode()).hexdigest()
            for i in range((nb + 15) // 16)
        )
        for k in range(nb):
            lum = 2 + int(hexstream[2 * k: 2 * k + 2], 16) % 253
            d = lum - 128
            sq = (d + 1) // 2 if d >= 0 else -((-d + 1) // 2)
            expected = min(max(2 * sq + 128, 0), 255)
            by, bx = divmod(k, w // 8)
            block = raster[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            assert np.all(block == expected), (r.media_id, k)
        # and through the dispatcher
        w2, h2, px2 = decode_image(bytes(r.payload))
        assert (w2, h2) == (w, h) and np.array_equal(px, px2)


def test_scope_errors_are_loud():
    quant_zz = [16] * 64
    head, eoi = _segments(8, 8, quant_zz,
                          [_dht(0, 0, DC_TBL), _dht(1, 0, AC_TBL)])
    # multi-component SOF0: patch ncomp to 3
    bad = bytearray(head)
    sof_at = bad.find(b"\xff\xc0")
    bad[sof_at + 9] = 3
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg(bytes(bad[:sof_at + 10]) + eoi)
    # progressive (SOF2) refused
    prog = bytearray(head)
    prog[sof_at + 1] = 0xC2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog) + eoi)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x00\x11")

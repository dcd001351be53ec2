"""Unit tests for the pure-python PNG codec (sparkflow.llm.png) and the
real-pixels multimodal resize path built on it.

The decode tests are INDEPENDENT of the encoder where it matters: a
spec-assembled byte string (signature, IHDR, IDAT built by hand with
struct + zlib) must decode to known pixels, so an encoder/decoder pair
that round-trips a shared bug cannot pass."""

from __future__ import annotations

import struct
import zlib

import pytest

from sparkflow.llm.png import _paeth, decode_png, encode_png


def _hand_png(width, height, color_type, filtered_rows):
    """Assemble a PNG from the spec with no help from encode_png:
    filtered_rows is a list of (filter_type, row_bytes)."""

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(bytes([ft]) + bytes(row) for ft, row in filtered_rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_hand_assembled_filter0():
    # 3x2 greyscale, unfiltered rows: pixels are exactly the row bytes
    png = _hand_png(3, 2, 0, [(0, [10, 20, 30]), (0, [40, 50, 60])])
    w, h, ch, raw = decode_png(png)
    assert (w, h, ch) == (3, 2, 1)
    assert list(raw) == [10, 20, 30, 40, 50, 60]


def test_decode_hand_assembled_sub_up_filters():
    # row 0: Sub filter — deltas vs left neighbor; row 1: Up vs row 0
    # expected row0 = [5, 5+3, 8+250 mod 256] = [5, 8, 2]
    # expected row1 = [5+1, 8+2, 2+3] = [6, 10, 5]
    png = _hand_png(3, 2, 0, [(1, [5, 3, 250]), (2, [1, 2, 3])])
    _, _, _, raw = decode_png(png)
    assert list(raw) == [5, 8, 2, 6, 10, 5]


def test_decode_hand_assembled_average_paeth():
    # row 0 Average: recon[i] = x + (left + up)//2, up = 0
    #   [10, 4+(10+0)//2, 6+(9+0)//2] = [10, 9, 10]
    # row 1 Paeth vs row 0: recon[i] = x + paeth(left, up, ul)
    #   i0: 2 + paeth(0,10,0)=2+10=12
    #   i1: 3 + paeth(12,9,10): p=11, pa=1,pb=2,pc=1 -> a=12 -> 15
    #   i2: 4 + paeth(15,10,9): p=16, pa=1,pb=6,pc=7 -> a=15 -> 19
    png = _hand_png(3, 2, 0, [(3, [10, 4, 6]), (4, [2, 3, 4])])
    _, _, _, raw = decode_png(png)
    assert list(raw) == [10, 9, 10, 12, 15, 19]


def test_paeth_matches_spec_reference():
    def spec(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        elif pb <= pc:
            return b
        return c

    for a in range(0, 256, 17):
        for b in range(0, 256, 19):
            for c in range(0, 256, 23):
                assert _paeth(a, b, c) == spec(a, b, c)


def test_decode_multi_idat():
    # the IDAT zlib stream may be split across chunks at any byte
    full = _hand_png(3, 2, 0, [(0, [1, 2, 3]), (0, [4, 5, 6])])
    # rebuild with the IDAT payload split in two chunks
    sig, rest = full[:8], full[8:]
    chunks = []
    pos = 0
    while pos < len(rest):
        (ln,) = struct.unpack(">I", rest[pos : pos + 4])
        chunks.append((rest[pos + 4 : pos + 8], rest[pos + 8 : pos + 8 + ln]))
        pos += 12 + ln

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    out = sig
    for tag, payload in chunks:
        if tag == b"IDAT":
            mid = len(payload) // 2
            out += chunk(b"IDAT", payload[:mid]) + chunk(b"IDAT", payload[mid:])
        else:
            out += chunk(tag, payload)
    _, _, _, raw = decode_png(out)
    assert list(raw) == [1, 2, 3, 4, 5, 6]


@pytest.mark.parametrize("color_type,ch", [(0, 1), (2, 3), (6, 4)])
def test_roundtrip_all_filters(color_type, ch):
    # height 7 >= 5 so the encoder's per-row filter cycle covers all
    # five filter types; width*ch > ch so Sub/Paeth see real neighbors
    w, h = 6, 7
    pixels = bytes((i * 37 + 11) % 256 for i in range(w * h * ch))
    png = encode_png(pixels, w, h, color_type)
    dw, dh, dch, raw = decode_png(png)
    assert (dw, dh, dch) == (w, h, ch)
    assert raw == pixels


def test_roundtrip_extremes():
    for pixels in (bytes(48), bytes([255] * 48)):
        assert decode_png(encode_png(pixels, 8, 6))[3] == pixels


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png at all .............")
    # interlaced: IHDR interlace byte = 1
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 1)

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bad)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0))
        )


def test_encode_rejects_wrong_buffer_size():
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_png(bytes(10), 4, 4)


def test_png_fixtures_through_binary_file_source(spark, tmp_path):
    """Deterministic PNG fixtures staged to disk, ingested via Spark's
    binaryFile source, decoded in mapInPandas — the multimodal entry
    path end to end with real image bytes."""
    import pandas as pd

    expected = {}
    for i in range(4):
        w, h = 8 + i, 6 + i
        pixels = bytes((p * (i + 3)) % 256 for p in range(w * h))
        (tmp_path / f"img_{i}.png").write_bytes(encode_png(pixels, w, h))
        expected[f"img_{i}.png"] = (w, h, sum(pixels))

    df = spark.read.format("binaryFile").load(str(tmp_path))

    def decode(batches):
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                w, h, ch, raw = decode_png(bytes(content))
                rows.append((path.rsplit("/", 1)[-1], w, h, sum(raw)))
            yield pd.DataFrame(
                rows, columns=["name", "w", "h", "pixel_sum"]
            )

    out = df.select("path", "content").mapInPandas(
        decode, schema="name STRING, w INT, h INT, pixel_sum BIGINT"
    ).toPandas()
    got = {r["name"]: (r["w"], r["h"], r["pixel_sum"]) for _, r in out.iterrows()}
    assert got == expected


def test_multimodal_resize_real_pixels(spark, sf_small):
    """The operator's checksum must equal an independent pure-python
    recomputation from the text (no PNG involved on the check side)."""
    import sparkflow
    from sparkflow.catalog import table as cat_table
    from sparkflow.llm.multimodal import _IMG_H, _IMG_W, _render_pixels

    out = (
        sparkflow.QUERIES["llm_multimodal_resize"](spark, sf_small)
        .toPandas()
        .set_index("doc_id")
    )
    docs = cat_table(spark, sf_small, "documents").select("doc_id", "text").toPandas()
    assert len(out) == len(docs)
    for _, row in docs.iterrows():
        px = _render_pixels(row["text"])
        checksum = 0
        for r in range(0, _IMG_H, 2):
            for c in range(0, _IMG_W, 2):
                a = px[r * _IMG_W + c]
                b = px[r * _IMG_W + c + 1]
                cc = px[(r + 1) * _IMG_W + c]
                d = px[(r + 1) * _IMG_W + c + 1]
                checksum += (a + b + cc + d) // 4
        got = out.loc[row["doc_id"]]
        assert int(got["thumb_checksum"]) == checksum, row["doc_id"]
        assert (int(got["thumb_w"]), int(got["thumb_h"])) == (
            _IMG_W // 2,
            _IMG_H // 2,
        )

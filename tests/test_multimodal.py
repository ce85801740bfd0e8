"""Multimodal plumbing: metadata sniff (real), decode stubs (fake path)."""
import pytest

from pysemanticcomplexity_spark.operators import multimodal


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [
        (0, b"\x89PNG\r\n\x1a\nrestofpng"),
        (1, b"\xff\xd8\xff\xe0JFIFdata"),
        (2, b"GIF89a..."),
        (3, b"<html><body>hi</body></html>"),
        (4, b"randombytes" * 20),
        (5, b""),
    ]
    return spark.createDataFrame(rows, "id long, payload binary")


def test_binary_metadata(spark, blobs):
    out = {r["id"]: (r["n_bytes"], r["format"])
           for r in multimodal.binary_metadata(blobs).collect()}
    assert out[0][1] == "png"
    assert out[1][1] == "jpeg"
    assert out[2][1] == "gif"
    assert out[3][1] == "html"
    assert out[4][1] == "unknown"
    assert out[0][0] == len(b"\x89PNG\r\n\x1a\nrestofpng")


def test_decode_images_fake_path(spark, blobs):
    out = {r["id"]: r for r in
           multimodal.decode_images(blobs, fake=True).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}
    for r in out.values():
        assert r["channels"] == 3
        assert len(r["features"]) == 8
        assert all(0.0 <= f <= 1.0 for f in r["features"])
    # deterministic across runs
    out2 = {r["id"]: r["features"] for r in
            multimodal.decode_images(blobs, fake=True).collect()}
    assert all(out[k]["features"] == out2[k] for k in out)


def test_decode_images_real_path_raises(spark, blobs):
    import pyspark.errors
    with pytest.raises(Exception) as err:
        multimodal.decode_images(blobs, fake=False).collect()
    assert "NotImplementedError" in str(err.value) or "decode" in str(err.value)


def test_frame_sample_fake(spark, blobs):
    out = multimodal.frame_sample(blobs, every_n=2, fake=True).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["id"], []).append(r["frame_idx"])
    assert by_id[4] == sorted(by_id[4])
    assert len(by_id[4]) >= 2


def _bmp_bytes(pixels_rgb, top_down=False):
    """Minimal 24-bit uncompressed BMP from an h x w x 3 RGB numpy array."""
    import struct
    import numpy as np
    h, w, _ = pixels_rgb.shape
    row_size = (w * 3 + 3) // 4 * 4
    data_off = 14 + 40
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", data_off + img_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24,
                       0, img_size, 2835, 2835, 0, 0)
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        row = pixels_rgb[r, :, ::-1].tobytes()          # RGB -> BGR on disk
        rows.append(row + b"\0" * (row_size - len(row)))
    return header + info + b"".join(rows)


def test_real_ppm_and_bmp_decode(spark):
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import decode_images

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3) * 4
    ppm = b"P6\n3 2\n255\n" + px.tobytes()
    bmp_up = _bmp_bytes(px)
    bmp_down = _bmp_bytes(px, top_down=True)

    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp_up)), (3, bytearray(bmp_down))],
        "id long, payload binary")
    got = {r["id"]: r for r in decode_images(df).collect()}

    flat = px.reshape(-1, 3).astype(float)
    want = list(flat.mean(axis=0) / 255) + list(flat.std(axis=0) / 255) \
        + [2 / 3, flat.mean() / 255]
    for i in (1, 2, 3):                       # all three encode the SAME image
        r = got[i]
        assert (r["height"], r["width"], r["channels"]) == (2, 3, 3)
        assert r["features"] == pytest.approx(want, abs=1e-6), i


def test_bmp_row_padding_handled(spark):
    """width=3 rows are 9 bytes, padded to 12 on disk; padding must not
    leak into the statistics (constant-color image -> zero stds)."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import decode_images
    px = np.full((5, 3, 3), 200, dtype=np.uint8)
    df = spark.createDataFrame([(1, bytearray(_bmp_bytes(px)))],
                               "id long, payload binary")
    r = decode_images(df).collect()[0]
    assert (r["height"], r["width"]) == (5, 3)
    assert r["features"][:3] == pytest.approx([200 / 255] * 3, abs=1e-6)
    assert r["features"][3:6] == pytest.approx([0.0] * 3, abs=1e-9)


def test_corrupt_jpeg_raises_and_fake_covers(spark):
    from pysemanticcomplexity_spark.operators.multimodal import decode_images
    jpeg = bytearray(bytes.fromhex("FFD8FFE0") + b"\0" * 64)
    df = spark.createDataFrame([(1, jpeg)], "id long, payload binary")
    with pytest.raises(Exception, match="JPEG"):
        decode_images(df).collect()
    # but the fake path still covers it (plumbing exercised)
    assert decode_images(df, fake=True).count() == 1


def _png_chunk(typ, data):
    import binascii
    import struct
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", binascii.crc32(typ + data) & 0xFFFFFFFF))


def _png_bytes(px, filters=(0,), color_type=2):
    """Minimal PNG encoder for test goldens: 8-bit, non-interlaced, one
    IDAT; applies the requested scanline filter per row (cycled) so the
    decoder's filter reversal is exercised against ground-truth pixels."""
    import struct
    import zlib as _zlib

    import numpy as np
    h, w, nch = px.shape
    chunk = _png_chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b""
    prev = np.zeros(w * nch, dtype=np.int64)
    for y in range(h):
        cur = px[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        enc = cur.copy()
        if f == 1:
            for i in range(w * nch - 1, nch - 1, -1):
                enc[i] = (cur[i] - cur[i - nch]) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            for i in range(w * nch):
                a = cur[i - nch] if i >= nch else 0
                enc[i] = (cur[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(w * nch):
                a = cur[i - nch] if i >= nch else 0
                b, c = prev[i], (prev[i - nch] if i >= nch else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = cur
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_all_filters_roundtrip():
    """Pure-unit check: every PNG filter type (None/Sub/Up/Average/Paeth)
    reverses to the exact original pixels."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_png
    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for filters in [(0,), (1,), (2,), (3,), (4,), (0, 1, 2, 3, 4)]:
        h, w, got = _decode_png(_png_bytes(px, filters=filters))
        assert (h, w) == (7, 5)
        assert (got == px).all(), filters


def test_png_decode_rgba_and_spark_path(spark):
    """RGBA PNG through the full mapInPandas path: geometry, channels=4,
    features computed over the RGB planes only."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import decode_images
    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    rgba = np.dstack([rgb, np.full((4, 6, 1), 128, dtype=np.uint8)])
    payload = _png_bytes(rgba, filters=(4, 2, 1, 3), color_type=6)
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "id long, payload binary")
    r = decode_images(df).collect()[0]
    assert (r["height"], r["width"], r["channels"]) == (4, 6, 4)
    flat = rgb.reshape(-1, 3).astype(float)
    want = list(flat.mean(axis=0) / 255) + list(flat.std(axis=0) / 255) \
        + [4 / 6, flat.mean() / 255]
    assert r["features"] == pytest.approx(want, abs=1e-6)


def test_png_decode_rejects_out_of_scope():
    """Invalid depths raise NotImplementedError; corrupt or
    layout-inconsistent PNGs raise ValueError."""
    import struct

    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_png
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _png_bytes(px)
    # claiming Adam7 over non-interlaced scanline data is a size mismatch
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="interlaced data size"):
        _decode_png(bytes(interlaced))
    deep = bytearray(good)
    deep[8 + 8 + 8] = 16                    # 16-bit claim over 8-bit data
    with pytest.raises(ValueError, match="size mismatch"):
        _decode_png(bytes(deep))
    weird = bytearray(good)
    weird[8 + 8 + 8] = 3                    # depth 3 is not a PNG depth
    with pytest.raises(NotImplementedError, match="depth"):
        _decode_png(bytes(weird))
    with pytest.raises(ValueError, match="IHDR"):
        _decode_png(b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 0) + b"IEND" * 4)


# ---- GIF (real decode: LZW + palettes + interlace) ----

def _lzw_encode(indices, mcs):
    """Spec LZW encoder (variable width, table growth, CLEAR at 4096) used
    only to build test GIFs; intentionally written against the GIF spec
    rather than mirroring the decoder's structure."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = [clear]
    table = {(i,): i for i in range(clear)}
    nxt, width_sizes = end + 1, []
    buf = tuple()
    for sym in indices:
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        codes.append(table[buf])
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == 4096:
            codes.append(clear)
            table = {(i,): i for i in range(clear)}
            nxt = end + 1
        buf = (sym,)
    if buf:
        codes.append(table[buf])
    codes.append(end)
    # pack LSB-first; the code width the DECODER uses when reading code k
    # depends on its table size at that moment: it grows after the decoder
    # appends entry 2^width - 1. Replay that here.
    bits, acc, nbits = bytearray(), 0, 0
    width, tsize, prev_was_clear = mcs + 1, end + 1, True
    out_bits = []
    for code in codes:
        out_bits.append((code, width))
        if code == clear:
            width, tsize, prev_was_clear = mcs + 1, end + 1, True
        elif code != end:
            if prev_was_clear:
                prev_was_clear = False
            else:
                tsize += 1
                if tsize == (1 << width) and width < 12:
                    width += 1
    for code, w in out_bits:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        bits.append(acc & 0xFF)
    return bytes(bits)


def _gif_bytes(idx, palette, interlace=False, local_table=False,
               extensions=True):
    """Minimal GIF89a with the index array `idx` (h, w) over `palette`
    (n, 3). Palette size is padded to a power of two >= 4."""
    import numpy as np
    h, w = idx.shape
    n = max(4, 1 << (int(np.ceil(np.log2(len(palette))))))
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    size_bits = int(np.log2(n)) - 1
    mcs = max(2, int(np.log2(n)))
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    if local_table:
        out += bytes([0x00, 0, 0])            # no global table
    else:
        out += bytes([0x80 | size_bits, 0, 0]) + pal.tobytes()
    if extensions:                            # graphic-control + comment
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        out += b"\x21\xfe\x05hello\x00"
    flags = (0x80 | size_bits if local_table else 0) | (0x40 if interlace else 0)
    out += b"\x2c" + b"\x00\x00\x00\x00" + w.to_bytes(2, "little") \
        + h.to_bytes(2, "little") + bytes([flags])
    if local_table:
        out += pal.tobytes()
    if interlace:
        order = (list(range(0, h, 8)) + list(range(4, h, 8))
                 + list(range(2, h, 4)) + list(range(1, h, 2)))
        stored = idx[order]
    else:
        stored = idx
    data = _lzw_encode([int(x) for x in stored.reshape(-1)], mcs)
    out += bytes([mcs])
    for off in range(0, len(data), 255):
        block = data[off:off + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"
    return bytes(out)


def test_gif_lzw_hand_golden():
    """3 pixels [1, 2, 1], mcs=2: codes CLEAR(4),1,2,1,END(5) at 3 bits
    each, LSB-first -> bytes 0b01001100, 0b00101001 = 0x4C 0xA1... derive:
    stream 100 | 001 | 010 | 001 | 101 packed LSB-first:
    byte0 = 100 + 001<<3 + (010&0b11)<<6 = 0b10001100 = 0x8C
    byte1 = 010>>2 + 001<<1 + 101<<4 = 0b1010010 = 0x52"""
    from pysemanticcomplexity_spark.operators.multimodal import _lzw_decode
    assert _lzw_decode(bytes([0x8C, 0x52]), 2, 3) == bytes([1, 2, 1])


def test_gif_decode_roundtrip_matrix():
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_gif
    rng = np.random.RandomState(11)
    for h, w, ncolors in [(1, 1, 4), (3, 4, 4), (7, 5, 16), (16, 16, 64),
                          (33, 9, 256), (64, 64, 256)]:
        palette = rng.randint(0, 256, (ncolors, 3)).astype(np.uint8)
        idx = rng.randint(0, ncolors, (h, w))
        for interlace in (False, True):
            for local in (False, True):
                buf = _gif_bytes(idx, palette, interlace=interlace,
                                 local_table=local)
                gh, gw, px = _decode_gif(buf)
                assert (gh, gw) == (h, w), (h, w, interlace, local)
                assert (px == palette[idx]).all(), (h, w, interlace, local)


def test_gif_lzw_table_growth_beyond_initial_width():
    """A long low-entropy sequence forces many table appends and at least
    one code-width increase; round-trip must stay exact."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_gif
    idx = np.tile(np.array([[0, 0, 1, 1, 2, 2, 3, 3]] * 2), (16, 16))[:64, :64]
    palette = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                       np.uint8)
    buf = _gif_bytes(idx, palette)
    gh, gw, px = _decode_gif(buf)
    assert (px == palette[idx]).all()


def test_gif_decode_spark_path(spark):
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import decode_images
    palette = np.array([[10, 20, 30], [200, 100, 0], [0, 0, 0], [255, 255, 255]],
                       np.uint8)
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 0, 0]])
    df = spark.createDataFrame(
        [(7, bytearray(_gif_bytes(idx, palette)))], "id long, payload binary")
    r = decode_images(df).collect()[0]
    assert (r["height"], r["width"], r["channels"]) == (3, 4, 3)
    flat = palette[idx].reshape(-1, 3).astype(float)
    want = list(flat.mean(0) / 255) + list(flat.std(0) / 255) \
        + [3 / 4, flat.mean() / 255]
    assert r["features"] == pytest.approx(want, abs=1e-6)


def test_gif_truncated_falls_back_or_raises(spark):
    from pysemanticcomplexity_spark.operators.multimodal import decode_images
    df = spark.createDataFrame([(1, bytearray(b"GIF89a..."))],
                               "id long, payload binary")
    with pytest.raises(Exception):
        decode_images(df).collect()
    assert decode_images(df, fake=True).count() == 1


# ---- JPEG (real baseline decode: huffman + IDCT) ----

def _jpeg_canonical(symbols):
    """All symbols at one code length L with 2^L > n (canonical: code i for
    symbol i). Returns (bits[16], values, {sym: (code, L)})."""
    n = len(symbols)
    L = 1
    while (1 << L) <= n:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    return bits, list(symbols), {s: (i, L) for i, s in enumerate(symbols)}


def _jpeg_bytes(px, quant=None, restart=None, sampling=None):
    """Independent baseline-JPEG encoder (spec-written, not decoder-mirrored):
    forward DCT, zigzag, quantization, canonical Huffman over the symbols
    actually used, byte stuffing. px: (h, w, 3) uint8 RGB or (h, w) gray.
    quant: 64 natural-order ints (default all-ones = numerically lossless
    up to DCT/IDCT float rounding). restart: emit DRI + RSTn every that
    many MCUs (byte-aligned, DC predictors reset). sampling: per-component
    (h, v) factors, e.g. ((2, 2), (1, 1), (1, 1)) for 4:2:0 (chroma is
    box-averaged down)."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import (
        _ZIGZAG, _idct_matrix)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(float)]
    else:
        r, g, b = (px[..., i].astype(float) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    samp = sampling or tuple((1, 1) for _ in planes)
    hmax = max(sh for sh, _ in samp)
    vmax = max(sv for _, sv in samp)
    q = np.ones(64, int) if quant is None else np.asarray(quant, int)
    m = _idct_matrix()

    def pad_to(plane, ph, pw):
        out = np.empty((ph, pw))
        ys, xs = plane.shape
        out[:ys, :xs] = plane
        out[ys:, :xs] = plane[-1:, :]
        out[:ys, xs:] = plane[:, -1:]
        out[ys:, xs:] = plane[-1, -1]
        return out

    comp_planes = []
    for ci, plane in enumerate(planes):
        sh, sv = samp[ci]
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:                    # box-average downsample
            ph = (h + fy - 1) // fy * fy
            pw = (w + fx - 1) // fx * fx
            p = pad_to(plane, ph, pw)
            plane = p.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        comp_planes.append(plane)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def block_coefs(plane, by, bx):
        blk = np.full((8, 8), 128.0)
        ys = min(8, plane.shape[0] - by * 8)
        xs = min(8, plane.shape[1] - bx * 8)
        if ys > 0 and xs > 0:
            blk[:ys, :xs] = plane[by * 8:by * 8 + ys, bx * 8:bx * 8 + xs]
        coef = m.T @ (blk - 128.0) @ m          # forward orthonormal DCT
        return np.round(coef.reshape(64) / q).astype(int)

    # pass 1: symbol streams per MCU (per-comp raster blocks within it)
    mcu_events, pred, mcu_i = [], [0] * len(planes), 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_i and mcu_i % restart == 0:
                pred = [0] * len(planes)        # predictors reset at RST
            mcu_i += 1
            events = []
            mcu_events.append(events)
            for ci, plane in enumerate(comp_planes):
                sh, sv = samp[ci]
                for v in range(sv):
                    for u in range(sh):
                        coef = block_coefs(plane, my * sv + v, mx * sh + u)
                        diff = coef[0] - pred[ci]
                        pred[ci] = coef[0]
                        t = (0 if diff == 0
                             else int(abs(int(diff))).bit_length())
                        events.append(("dc", t, diff))
                        zz = [coef[_ZIGZAG[k]] for k in range(64)]
                        run = 0
                        last_nz = max((k for k in range(1, 64) if zz[k]),
                                      default=0)
                        for k in range(1, 64):
                            if k > last_nz:
                                events.append(("ac", 0x00, 0))    # EOB
                                break
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                events.append(("ac", 0xF0, 0))    # ZRL
                                run -= 16
                            sz = int(abs(int(zz[k]))).bit_length()
                            events.append(("ac", (run << 4) | sz, zz[k]))
                            run = 0
    flat = [ev for events in mcu_events for ev in events]
    dc_syms = sorted({t for kind, t, _ in flat if kind == "dc"})
    ac_syms = sorted({t for kind, t, _ in flat if kind == "ac"})
    dc_bits, dc_vals, dc_code = _jpeg_canonical(dc_syms)
    ac_bits, ac_vals, ac_code = _jpeg_canonical(ac_syms)

    groups = ([mcu_events[i:i + restart]
               for i in range(0, len(mcu_events), restart)]
              if restart else [mcu_events])
    stuffed = bytearray()
    for gi, group in enumerate(groups):
        out_bits = []

        def put(code, nbits):
            for i in range(nbits - 1, -1, -1):
                out_bits.append((code >> i) & 1)

        for events in group:
            for kind, sym, val in events:
                code, L = (dc_code if kind == "dc" else ac_code)[sym]
                put(code, L)
                size = sym if kind == "dc" else (sym & 15)
                if size:
                    v = val if val > 0 else val + (1 << size) - 1
                    put(int(v), size)
        while len(out_bits) % 8:
            out_bits.append(1)                  # pad with 1s
        for i in range(0, len(out_bits), 8):
            byte = int("".join(map(str, out_bits[i:i + 8])), 2)
            stuffed.append(byte)
            if byte == 0xFF:
                stuffed.append(0x00)            # entropy stuffing
        if gi < len(groups) - 1:
            stuffed += bytes([0xFF, 0xD0 + (gi % 8)])   # RSTn marker

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    zz_q = bytes(int(q[_ZIGZAG[k]]) for k in range(64))
    ncomp = len(planes)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp]) + b"".join(
            bytes([cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0])
            for cid in range(ncomp))
    dht = bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals) \
        + bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals)
    sos = bytes([ncomp]) + b"".join(bytes([cid + 1, 0x00])
                                    for cid in range(ncomp)) \
        + bytes([0x00, 0x3F, 0x00])
    dri = seg(0xDD, restart.to_bytes(2, "big")) if restart else b""
    return (b"\xff\xd8" + seg(0xDB, bytes([0x00]) + zz_q) + dri
            + seg(0xC0, sof) + seg(0xC4, dht) + seg(0xDA, sos)
            + bytes(stuffed) + b"\xff\xd9")


def test_jpeg_dc_only_blocks_decode_exactly():
    """Per-8x8-block-constant images have DC-only spectra; with all-ones
    quantization the round-trip is exact."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(5)
    for h, w in [(8, 8), (16, 8), (24, 32), (8, 24)]:
        blocks = rng.randint(0, 256, (h // 8, w // 8, 3))
        px = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1).astype(np.uint8)
        gh, gw, got = _decode_jpeg(_jpeg_bytes(px))
        assert (gh, gw) == (h, w)
        assert int(np.abs(got.astype(int) - px.astype(int)).max()) <= 1, (h, w)


def test_jpeg_general_roundtrip_tolerance():
    """Arbitrary content exercises AC runs/ZRL/EOB and Huffman width mix;
    with all-ones quant the error is bounded by coefficient rounding."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(6)
    for h, w, gray in [(8, 8, True), (13, 21, True), (16, 16, False),
                       (9, 30, False)]:
        shape = (h, w) if gray else (h, w, 3)
        px = rng.randint(0, 256, shape).astype(np.uint8)
        gh, gw, got = _decode_jpeg(_jpeg_bytes(px))
        assert (gh, gw) == (h, w)
        want = np.stack([px] * 3, axis=2) if gray else px
        err = np.abs(got.astype(int) - want.astype(int)).max()
        assert err <= 4, (h, w, gray, err)


def test_jpeg_quantization_lossy_but_close():
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(7)
    px = rng.randint(96, 160, (16, 16, 3)).astype(np.uint8)
    q = np.full(64, 4)
    q[0] = 1
    _, _, got = _decode_jpeg(_jpeg_bytes(px, quant=q))
    err = np.abs(got.astype(int) - px.astype(int)).mean()
    assert err < 8.0


def test_jpeg_spark_path_and_scope(spark):
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import (
        _decode_jpeg, decode_images)
    px = np.repeat(np.repeat(
        np.array([[[10, 130, 250]]], np.uint8), 8, 0), 8, 1)  # 8x8 constant
    df = spark.createDataFrame([(3, bytearray(_jpeg_bytes(px)))],
                               "id long, payload binary")
    r = decode_images(df).collect()[0]
    assert (r["height"], r["width"], r["channels"]) == (8, 8, 3)
    # flipping a baseline stream's SOF marker to SOF2 produces an illegal
    # progressive scan (Ss=0 with Se=63) — rejected, never mis-decoded
    buf = bytearray(_jpeg_bytes(px))
    i = buf.index(b"\xff\xc0")
    buf[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se = 0"):
        _decode_jpeg(bytes(buf))


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: byte-aligned segments with DC predictor resets must decode
    identically to the unrestarted stream."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(8)
    px = rng.randint(0, 256, (24, 16, 3)).astype(np.uint8)   # 6 MCUs
    base = _decode_jpeg(_jpeg_bytes(px))[2]
    for restart in (1, 2, 4):
        got = _decode_jpeg(_jpeg_bytes(px, restart=restart))[2]
        assert (got == base).all(), restart


def test_jpeg_420_constant_chroma_exact():
    """4:2:0: with spatially constant chroma the box-downsample/replicate
    round-trip is exact, so only Y carries detail — decode must match the
    4:4:4 encoding of the same image bit-for-bit."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(9)
    y = rng.randint(0, 256, (24, 24)).astype(np.uint8)
    px = np.stack([y, y, y], axis=2)            # r=g=b -> chroma == 128
    base = _decode_jpeg(_jpeg_bytes(px))[2]
    for sampling in [((2, 2), (1, 1), (1, 1)),  # 4:2:0
                     ((2, 1), (1, 1), (1, 1)),  # 4:2:2
                     ((1, 2), (1, 1), (1, 1))]: # 4:4:0
        h, w, got = _decode_jpeg(_jpeg_bytes(px, sampling=sampling))
        assert (h, w) == (24, 24)
        assert (got == base).all(), sampling


def test_jpeg_420_general_content_tolerance():
    """Real 4:2:0 on arbitrary color content: chroma is lossy by design;
    Y must stay sharp (luma error bounded by coefficient rounding) and
    chroma error bounded by the downsample window spread."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(10)
    # smooth chroma: block-constant color regions, random luma
    color = np.repeat(np.repeat(
        rng.randint(0, 256, (2, 2, 3)), 16, axis=0), 16, axis=1)
    noise = rng.randint(-20, 21, (32, 32, 1))
    px = np.clip(color + noise, 0, 255).astype(np.uint8)
    h, w, got = _decode_jpeg(_jpeg_bytes(px, sampling=((2, 2), (1, 1), (1, 1))))
    assert (h, w) == (32, 32)
    err = np.abs(got.astype(int) - px.astype(int))
    # interior of each 16x16 region has near-constant chroma
    assert err.mean() < 6.0
    # 4:2:0 with restart intervals composes
    got2 = _decode_jpeg(_jpeg_bytes(px, sampling=((2, 2), (1, 1), (1, 1)),
                                    restart=1))[2]
    assert (got2 == got).all()


def test_jpeg_odd_dimensions_with_subsampling():
    """Non-multiple-of-16 geometry: MCU padding must crop away exactly."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(12)
    y = rng.randint(0, 256, (19, 21)).astype(np.uint8)
    px = np.stack([y, y, y], axis=2)
    h, w, got = _decode_jpeg(_jpeg_bytes(px, sampling=((2, 2), (1, 1), (1, 1))))
    assert (h, w) == (19, 21)
    base = _decode_jpeg(_jpeg_bytes(px))[2]
    assert (got == base).all()


def test_gif_subrectangle_frame_rejected():
    """A first frame not covering the logical screen needs the disposal/
    background model — honestly out of scope, never silently mis-sized."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_gif
    palette = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.zeros((2, 2), int)
    buf = bytearray(_gif_bytes(idx, palette))
    buf[6:8] = (4).to_bytes(2, "little")       # widen the logical screen
    with pytest.raises(NotImplementedError, match="logical screen"):
        _decode_gif(bytes(buf))


# ---- progressive JPEG (spectral selection + successive approximation) ----

class _BitW:
    def __init__(self):
        self.bits = []

    def put(self, code, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bit(self, b):
        self.bits.append(b & 1)

    def bytes_stuffed(self):
        while len(self.bits) % 8:
            self.bits.append(1)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = int("".join(map(str, self.bits[i:i + 8])), 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _prog_component_coefs(px, quant, sampling):
    """Quantized DCT coefficient grids per component (natural order),
    same math as the baseline encoder."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _idct_matrix
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(float)]
    else:
        r, g, b = (px[..., i].astype(float) for i in range(3))
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128 + 0.5 * r - 0.418688 * g - 0.081312 * b]
    samp = sampling or tuple((1, 1) for _ in planes)
    hmax = max(sh for sh, _ in samp)
    vmax = max(sv for _, sv in samp)
    q = np.ones(64, int) if quant is None else np.asarray(quant, int)
    m = _idct_matrix()
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = []
    for ci, plane in enumerate(planes):
        sh_f, sv_f = samp[ci]
        fy, fx = vmax // sv_f, hmax // sh_f
        if fy > 1 or fx > 1:
            ph = (h + fy - 1) // fy * fy
            pw = (w + fx - 1) // fx * fx
            pad = np.empty((ph, pw))
            ys, xs = plane.shape
            pad[:ys, :xs] = plane
            pad[ys:, :xs] = plane[-1:, :]
            pad[:ys, xs:] = pad[:ys, xs - 1:xs]
            plane = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        bh, bw = mcuy * sv_f, mcux * sh_f
        grid = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                blk = np.full((8, 8), 128.0)
                ys = min(8, plane.shape[0] - by * 8)
                xs = min(8, plane.shape[1] - bx * 8)
                if ys > 0 and xs > 0:
                    blk[:ys, :xs] = plane[by * 8:by * 8 + ys,
                                          bx * 8:bx * 8 + xs]
                coef = m.T @ (blk - 128.0) @ m
                grid[by, bx] = np.round(coef.reshape(64) / q).astype(int)
        grids.append(grid)
    return h, w, samp, hmax, vmax, mcux, mcuy, q, grids


def _jpeg_bytes_progressive(px, quant=None, sampling=None,
                            dc_al=1, ac_al=1):
    """Progressive encoder (spec-written): DC first at Al=dc_al +
    refinement scans down to 0; per-component AC spectral bands [1..5] and
    [6..63] first at Al=ac_al + refinement scans down to 0, with EOB runs
    and buffered correction bits (libjpeg bit order)."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _ZIGZAG
    h, w, samp, hmax, vmax, mcux, mcuy, q, grids = \
        _prog_component_coefs(px, quant, sampling)
    ncomp = len(grids)
    scans = []                       # (header_bytes, entropy_bytes)

    def canon_codes(symbols):
        bits, vals, codes = _jpeg_canonical(sorted(set(symbols)))
        return bits, vals, codes

    def size_of(v):
        return 0 if v == 0 else int(abs(int(v))).bit_length()

    def mag_bits(v, t):
        return v if v > 0 else v + (1 << t) - 1

    # --- scan 1: DC first, interleaved, Al=dc_al
    events = []
    pred = [0] * ncomp
    for mcu in range(mcuy * mcux):
        my, mx = divmod(mcu, mcux)
        for ci in range(ncomp):
            sh_f, sv_f = samp[ci]
            for v in range(sv_f):
                for u in range(sh_f):
                    dc = int(grids[ci][my * sv_f + v, mx * sh_f + u, 0]) \
                        >> dc_al
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    events.append(diff)
    bits_t, vals_t, codes = canon_codes([size_of(d) for d in events])
    wtr = _BitW()
    for diff in events:
        t = size_of(diff)
        c, L = codes[t]
        wtr.put(c, L)
        if t:
            wtr.put(mag_bits(diff, t), t)
    scans.append((("dc", 0, 0, 0, dc_al, None, bits_t, vals_t, None, None),
                  wtr.bytes_stuffed()))

    # --- DC refinement scans
    for lvl in range(dc_al - 1, -1, -1):
        wtr = _BitW()
        for mcu in range(mcuy * mcux):
            my, mx = divmod(mcu, mcux)
            for ci in range(ncomp):
                sh_f, sv_f = samp[ci]
                for v in range(sv_f):
                    for u in range(sh_f):
                        dc = int(grids[ci][my * sv_f + v, mx * sh_f + u, 0])
                        wtr.bit((dc >> lvl) & 1)
        scans.append((("dcr", 0, 0, lvl + 1, lvl, None, None, None,
                       None, None), wtr.bytes_stuffed()))

    bands = [(1, 5), (6, 63)]

    def ac_first_scan(ci, ss, se, al):
        grid = grids[ci]
        sh_f, sv_f = samp[ci]
        cw = (w * sh_f + hmax - 1) // hmax
        ch = (h * sv_f + vmax - 1) // vmax
        bw_c, bh_c = (cw + 7) // 8, (ch + 7) // 8
        syms, stream = [], []        # stream: ("sym", rs, extra, nbits) |
        eobrun = 0                   #         ("raw", value, nbits)

        def flush_eob():
            nonlocal eobrun
            while eobrun > 0:
                n = min(eobrun, 32767)
                r = n.bit_length() - 1
                syms.append(r << 4)
                stream.append(("sym", r << 4, n - (1 << r), r))
                eobrun -= n

        for b in range(bh_c * bw_c):
            by, bx = b // bw_c, b % bw_c
            zz = [int(grid[by, bx, _ZIGZAG[k]]) for k in range(64)]
            vals = [(0 if zz[k] == 0
                     else (abs(zz[k]) >> al) * (1 if zz[k] > 0 else -1))
                    for k in range(64)]
            nz = [k for k in range(ss, se + 1) if vals[k] != 0]
            if not nz:
                eobrun += 1
                continue
            flush_eob()
            r = 0
            for k in range(ss, se + 1):
                v = vals[k]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    syms.append(0xF0)
                    stream.append(("sym", 0xF0, 0, 0))
                    r -= 16
                t = size_of(v)
                syms.append((r << 4) | t)
                stream.append(("sym", (r << 4) | t, mag_bits(v, t), t))
                r = 0
                if k == nz[-1]:
                    break
            if nz[-1] < se:
                eobrun += 1
        flush_eob()
        bits_t, vals_t, codes = canon_codes(syms or [0x00])
        wtr = _BitW()
        for kind, rs, extra, nbits in stream:
            c, L = codes[rs]
            wtr.put(c, L)
            if nbits:
                wtr.put(extra, nbits)
        return (("ac", ss, se, 0, al, ci, None, None, bits_t, vals_t),
                wtr.bytes_stuffed())

    def ac_refine_scan(ci, ss, se, ah, al):
        grid = grids[ci]
        sh_f, sv_f = samp[ci]
        cw = (w * sh_f + hmax - 1) // hmax
        ch = (h * sv_f + vmax - 1) // vmax
        bw_c, bh_c = (cw + 7) // 8, (ch + 7) // 8
        syms, stream = [], []
        eobrun, be = 0, []           # pending EOB run + correction bits

        def flush_eob():
            nonlocal eobrun, be
            while eobrun > 0:
                n = min(eobrun, 32767)
                r = n.bit_length() - 1
                syms.append(r << 4)
                stream.append(("sym", r << 4, n - (1 << r), r))
                for bbit in be:
                    stream.append(("bit", bbit, None, None))
                be = []
                eobrun -= n
            if be:                   # pure correction bits w/o EOB pending
                raise AssertionError("corr bits without EOB context")

        for b in range(bh_c * bw_c):
            by, bx = b // bw_c, b % bw_c
            zz = [int(grid[by, bx, _ZIGZAG[k]]) for k in range(64)]
            amag = [abs(zz[k]) >> al for k in range(64)]
            old = [abs(zz[k]) >> ah != 0 for k in range(64)]
            newpos = [k for k in range(ss, se + 1)
                      if amag[k] == 1 and not old[k]]
            if not newpos:
                eobrun += 1
                be.extend(amag[k] & 1 for k in range(ss, se + 1) if old[k])
                continue
            flush_eob()
            r, pend = 0, []
            last_new = newpos[-1]
            for k in range(ss, se + 1):
                if old[k]:
                    pend.append(amag[k] & 1)
                    continue
                if amag[k] == 1:     # newly significant
                    while r > 15:
                        syms.append(0xF0)
                        stream.append(("sym", 0xF0, 0, 0))
                        for bbit in pend:
                            stream.append(("bit", bbit, None, None))
                        pend = []
                        r -= 16
                    syms.append((r << 4) | 1)
                    stream.append(("sym", (r << 4) | 1,
                                   1 if zz[k] > 0 else 0, 1))
                    for bbit in pend:
                        stream.append(("bit", bbit, None, None))
                    pend = []
                    r = 0
                    if k == last_new:
                        tail = [amag[k2] & 1 for k2 in range(k + 1, se + 1)
                                if old[k2]]
                        if k < se:
                            eobrun = 1
                            be = tail
                        break
                else:
                    r += 1
        flush_eob()
        bits_t, vals_t, codes = canon_codes(syms or [0x00])
        wtr = _BitW()
        for item in stream:
            if item[0] == "bit":
                wtr.bit(item[1])
            else:
                _k, rs, extra, nbits = item
                c, L = codes[rs]
                wtr.put(c, L)
                if nbits:
                    wtr.put(extra, nbits)
        return (("acr", ss, se, ah, al, ci, None, None, bits_t, vals_t),
                wtr.bytes_stuffed())

    for ss, se in bands:
        for ci in range(ncomp):
            scans.append(ac_first_scan(ci, ss, se, ac_al))
    for lvl in range(ac_al - 1, -1, -1):
        for ss, se in bands:
            for ci in range(ncomp):
                scans.append(ac_refine_scan(ci, ss, se, lvl + 1, lvl))

    # --- assemble the file
    from pysemanticcomplexity_spark.operators.multimodal import _ZIGZAG as ZZ

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    zz_q = bytes(int(q[ZZ[k]]) for k in range(64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp]) + b"".join(
            bytes([cid + 1, (samp[cid][0] << 4) | samp[cid][1], 0])
            for cid in range(ncomp))
    out = bytearray(b"\xff\xd8" + seg(0xDB, bytes([0x00]) + zz_q)
                    + seg(0xC2, sof))
    for meta, entropy in scans:
        kind, ss, se, ah, al, ci, dbits, dvals, abits, avals = meta
        if kind == "dc":
            out += seg(0xC4, bytes([0x00]) + bytes(dbits) + bytes(dvals))
            comps_in_scan = list(range(ncomp))
            tds = {c: (0, 0) for c in comps_in_scan}
        elif kind == "dcr":
            comps_in_scan = list(range(ncomp))
            tds = {c: (0, 0) for c in comps_in_scan}
        else:
            out += seg(0xC4, bytes([0x10]) + bytes(abits) + bytes(avals))
            comps_in_scan = [ci]
            tds = {ci: (0, 0)}
        sos = bytes([len(comps_in_scan)]) + b"".join(
            bytes([c + 1, (tds[c][0] << 4) | tds[c][1]])
            for c in comps_in_scan) + bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos) + entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_jpeg_equals_baseline_decode():
    """Progressive scans must reconstruct the IDENTICAL coefficient arrays
    the baseline stream carries, so decoded pixels match bit-for-bit."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(21)
    for h, w, gray, samp in [
            (8, 8, True, None),
            (16, 24, True, None),
            (16, 16, False, None),
            (13, 21, False, None),
            (32, 32, False, ((2, 2), (1, 1), (1, 1)))]:
        shape = (h, w) if gray else (h, w, 3)
        px = rng.randint(0, 256, shape).astype(np.uint8)
        base = _decode_jpeg(_jpeg_bytes(px, sampling=samp))[2]
        gh, gw, got = _decode_jpeg(
            _jpeg_bytes_progressive(px, sampling=samp))
        assert (gh, gw) == (h, w), (h, w, gray)
        assert (got == base).all(), (h, w, gray, samp)


def test_progressive_jpeg_approximation_depths():
    """Deeper successive approximation (more refinement scans) must still
    converge to the exact coefficients."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(22)
    px = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    base = _decode_jpeg(_jpeg_bytes(px))[2]
    for dc_al, ac_al in [(0, 0), (1, 1), (2, 2), (3, 1), (1, 3)]:
        got = _decode_jpeg(_jpeg_bytes_progressive(
            px, dc_al=dc_al, ac_al=ac_al))[2]
        assert (got == base).all(), (dc_al, ac_al)


def test_progressive_jpeg_sparse_long_eob_runs():
    """Coarse quantization makes most blocks band-empty, driving EOB runs
    that span many blocks (with buffered correction bits across the run)."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_jpeg
    rng = np.random.RandomState(23)
    smooth = np.repeat(np.repeat(
        rng.randint(60, 200, (4, 4, 3)), 8, axis=0), 8, axis=1)
    px = np.clip(smooth + rng.randint(-3, 4, (32, 32, 3)), 0,
                 255).astype(np.uint8)
    q = np.full(64, 16)
    q[0] = 1
    base = _decode_jpeg(_jpeg_bytes(px, quant=q))[2]
    got = _decode_jpeg(_jpeg_bytes_progressive(px, quant=q, ac_al=2))[2]
    assert (got == base).all()


def _png_adam7_bytes(px):
    """Adam7-interlaced encoder for tests: each pass is an independently
    zero-filtered sub-image, concatenated in pass order."""
    import struct
    import zlib as _zlib

    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _ADAM7
    h, w, nch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    chunk = _png_chunk

    raw = b""
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\0" + row.reshape(-1).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_adam7_interlace_roundtrip():
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_png
    rng = np.random.RandomState(31)
    for h, w in [(1, 1), (3, 5), (8, 8), (13, 21), (16, 9)]:
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        gh, gw, got = _decode_png(_png_adam7_bytes(px))
        assert (gh, gw) == (h, w)
        assert (got == px).all(), (h, w)


def test_png_palette_and_gray_types():
    import struct
    import zlib as _zlib

    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_png
    chunk = _png_chunk

    rng = np.random.RandomState(32)
    # color type 3: palette
    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, (4, 6), dtype=np.uint8)
    raw = b"".join(b"\0" + row.tobytes() for row in idx)
    ihdr = struct.pack(">IIBBBBB", 6, 4, 8, 3, 0, 0, 0)
    buf = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"PLTE", pal.tobytes())
           + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b""))
    h, w, got = _decode_png(buf)
    assert (h, w) == (4, 6) and (got == pal[idx]).all()
    # color type 0: grayscale replicates to RGB
    g = rng.randint(0, 256, (3, 7, 1), dtype=np.uint8)
    h, w, got = _decode_png(_png_bytes(g, color_type=0))
    assert got.shape == (3, 7, 3) and (got == np.repeat(g, 3, 2)).all()
    # color type 4: gray+alpha -> RGBA
    ga = rng.randint(0, 256, (5, 4, 2), dtype=np.uint8)
    h, w, got = _decode_png(_png_bytes(ga, color_type=4))
    assert got.shape == (5, 4, 4)
    assert (got[..., 0] == ga[..., 0]).all() and (got[..., 3] == ga[..., 1]).all()


def _gif_animated_bytes(frames, palette):
    """Multi-frame GIF89a: each frame a full-screen image block (optionally
    preceded by a graphic-control extension, as real encoders emit)."""
    import numpy as np
    h, w = frames[0].shape
    n = max(4, 1 << int(np.ceil(np.log2(len(palette)))))
    pal = np.zeros((n, 3), np.uint8)
    pal[:len(palette)] = palette
    size_bits = int(np.log2(n)) - 1
    mcs = max(2, int(np.log2(n)))
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | size_bits, 0, 0]) + pal.tobytes()
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"   # loop ext
    for idx in frames:
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"          # GCE, 4cs delay
        out += b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little") \
            + h.to_bytes(2, "little") + bytes([0])
        data = _lzw_encode([int(x) for x in idx.reshape(-1)], mcs)
        out += bytes([mcs])
        for off in range(0, len(data), 255):
            block = data[off:off + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def test_frame_sample_real_animated_gif(spark):
    import zlib as _zlib

    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import (
        _gif_frames, frame_sample)
    rng = np.random.RandomState(41)
    palette = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    frames = [rng.randint(0, 8, (6, 5)) for _ in range(7)]
    buf = _gif_animated_bytes(frames, palette)
    # the frame iterator recovers every frame's exact pixels
    decoded = list(_gif_frames(buf))
    assert len(decoded) == 7
    for f, (h, w, px) in enumerate(decoded):
        assert (h, w) == (6, 5)
        assert (px == palette[frames[f]]).all(), f
    # sampling every 3rd frame through the Spark path, real hashes
    df = spark.createDataFrame([(9, bytearray(buf))],
                               "id long, payload binary")
    rows = frame_sample(df, every_n=3).collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6]
    want = [_zlib.crc32(np.ascontiguousarray(palette[frames[f]]).tobytes())
            for f in (0, 3, 6)]
    assert [r["frame_hash"] for r in rows] == want


def test_frame_sample_partial_and_headless_gifs(spark):
    """A GIF with no image block or truncated mid-frame must never emit
    partial real rows: fake=False raises, fake=True yields ONLY fake rows."""
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import frame_sample
    palette = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    frames = [np.zeros((4, 4), int), np.ones((4, 4), int)]
    good = _gif_animated_bytes(frames, palette)
    headless = good[:13 + 4 * 3] + b"\x3b"       # header+GCT, no image
    truncated = good[:len(good) - 12]            # cut inside the last frame
    for bad in (headless, truncated):
        df = spark.createDataFrame([(1, bytearray(bad))],
                                   "id long, payload binary")
        with pytest.raises(Exception):
            frame_sample(df, every_n=1).collect()
        rows = frame_sample(df, every_n=1, fake=True).collect()
        # fake rows only — no duplicated (id, frame_idx) pairs
        keys = [(r["id"], r["frame_idx"]) for r in rows]
        assert len(keys) == len(set(keys)) and len(rows) > 0


def test_decode_images_corrupt_idat_falls_to_fake(spark):
    from pysemanticcomplexity_spark.operators.multimodal import decode_images
    buf = (b"\x89PNG\r\n\x1a\n"
           + _png_chunk(b"IHDR", (2).to_bytes(4, "big")
                        + (2).to_bytes(4, "big") + bytes([8, 2, 0, 0, 0]))
           + _png_chunk(b"IDAT", b"not-deflate-data")
           + _png_chunk(b"IEND", b""))
    df = spark.createDataFrame([(1, bytearray(buf))],
                               "id long, payload binary")
    with pytest.raises(Exception):
        decode_images(df).collect()
    assert decode_images(df, fake=True).count() == 1


def test_ppm_header_comments(spark):
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_ppm
    px = np.arange(18, dtype=np.uint8).reshape(2, 3, 3) * 7
    ppm = (b"P6 # netpbm comment\n# another\n 3 # width done\n2\n"
           b"# before maxval\n255\n" + px.tobytes())
    h, w, got = _decode_ppm(ppm)
    assert (h, w) == (2, 3) and (got == px).all()


def _png_lowdepth_bytes(vals, depth, color_type, palette=None,
                        interlace=False):
    """1/2/4-bit PNG encoder (MSB-first packed rows, zero filter)."""
    import struct
    import zlib as _zlib

    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _ADAM7
    h, w = vals.shape
    per = 8 // depth

    def pack_rows(sub):
        raw = b""
        for row in sub:
            padded = np.zeros(((len(row) + per - 1) // per) * per, np.uint8)
            padded[:len(row)] = row
            byts = np.zeros(len(padded) // per, np.uint8)
            for j, sh in enumerate(range(8 - depth, -1, -depth)):
                byts |= (padded[j::per] << sh).astype(np.uint8)
            raw += b"\0" + byts.tobytes()
        return raw

    if interlace:
        raw = b"".join(pack_rows(vals[y0::dy, x0::dx])
                       for x0, y0, dx, dy in _ADAM7
                       if vals[y0::dy, x0::dx].size)
    else:
        raw = pack_rows(vals)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0,
                       1 if interlace else 0)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.tobytes())
    return out + _png_chunk(b"IDAT", _zlib.compress(raw)) \
        + _png_chunk(b"IEND", b"")


def test_png_low_bit_depths():
    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_png
    rng = np.random.RandomState(51)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        vals = rng.randint(0, mx + 1, (5, 11)).astype(np.uint8)
        # grayscale: values scale to 8-bit
        h, w, got = _decode_png(_png_lowdepth_bytes(vals, depth, 0))
        scale = 255 // mx
        want = np.repeat((vals * scale)[..., None], 3, axis=2)
        assert (h, w) == (5, 11) and (got == want).all(), depth
        # palette
        pal = rng.randint(0, 256, (mx + 1, 3)).astype(np.uint8)
        h, w, got = _decode_png(
            _png_lowdepth_bytes(vals, depth, 3, palette=pal))
        assert (got == pal[vals]).all(), depth
        # Adam7 at sub-byte depth: per-pass packing
        h, w, got = _decode_png(
            _png_lowdepth_bytes(vals, depth, 3, palette=pal,
                                interlace=True))
        assert (got == pal[vals]).all(), ("adam7", depth)


def test_png_and_ppm_16bit_reduce_to_high_byte():
    import struct
    import zlib as _zlib

    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import (
        _decode_png, _decode_ppm)
    rng = np.random.RandomState(61)
    hi = rng.randint(0, 256, (3, 4, 3)).astype(np.uint8)
    lo = rng.randint(0, 256, (3, 4, 3)).astype(np.uint8)
    be = np.stack([hi, lo], axis=-1).reshape(3, 4, 6)    # 16-bit BE samples
    # PPM with maxval 65535
    ppm = b"P6 4 3 65535\n" + be.tobytes()
    h, w, got = _decode_ppm(ppm)
    assert (h, w) == (3, 4) and (got == hi).all()
    # PNG depth 16, RGB, zero filter rows
    raw = b"".join(b"\0" + be[y].tobytes() for y in range(3))
    ihdr = struct.pack(">IIBBBBB", 4, 3, 16, 2, 0, 0, 0)
    buf = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", _zlib.compress(raw))
           + _png_chunk(b"IEND", b""))
    h, w, got = _decode_png(buf)
    assert (h, w) == (3, 4) and (got == hi).all()


def test_bmp_paletted_and_32bit():
    import struct

    import numpy as np
    from pysemanticcomplexity_spark.operators.multimodal import _decode_bmp
    rng = np.random.RandomState(71)

    def headers(w, h, bpp, data_off, img_size, clr_used=0):
        hdr = struct.pack("<2sIHHI", b"BM", data_off + img_size, 0, 0,
                          data_off)
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, img_size,
                           2835, 2835, clr_used, 0)
        return hdr + info

    # 8-bit paletted, bottom-up, padded rows (w=5 -> row 8 bytes)
    pal = rng.randint(0, 256, (16, 4)).astype(np.uint8)
    idx = rng.randint(0, 16, (3, 5)).astype(np.uint8)
    row_size = 8
    body = b"".join(idx[y].tobytes() + b"\0" * (row_size - 5)
                    for y in range(2, -1, -1))
    buf = headers(5, 3, 8, 14 + 40 + 64, len(body), 16) + pal.tobytes() + body
    h, w, got = _decode_bmp(buf)
    assert (h, w) == (3, 5)
    assert (got == pal[idx][..., 2::-1]).all()
    # 32-bit BGRX
    px = rng.randint(0, 256, (2, 3, 3)).astype(np.uint8)
    body = b"".join(
        b"".join(bytes([px[y, x, 2], px[y, x, 1], px[y, x, 0], 0])
                 for x in range(3))
        for y in range(1, -1, -1))
    buf = headers(3, 2, 32, 14 + 40, len(body)) + body
    h, w, got = _decode_bmp(buf)
    assert (h, w) == (2, 3) and (got == px).all()


def test_bmp_core_header_rejected_cleanly():
    # BITMAPCOREHEADER (hdr_size=12) lays out width/bpp at different
    # offsets; the decoder must fail typed, not misparse geometry (ADVICE r3)
    import struct

    import pytest as _pytest
    from pysemanticcomplexity_spark.operators.multimodal import _decode_bmp
    core = struct.pack("<IHHHH", 12, 3, 2, 1, 24)       # BITMAPCOREHEADER
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 12 + 24, 0, 0, 14 + 12)
    buf = hdr + core + b"\0" * 24
    with _pytest.raises(NotImplementedError, match="BITMAPCOREHEADER"):
        _decode_bmp(buf)


def _bomb_payloads():
    """Crafted headers declaring multi-GB rasters with a few data bytes —
    the crawl-scale decompression-bomb shapes the MAX_PIXELS guard must
    reject before allocating (a 16-byte JPEG header used to demand a
    ~10 GB numpy allocation, and MemoryError escaped the fake fallback)."""
    import struct
    import zlib as _z

    def png_chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _z.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 6, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr)
           + png_chunk(b"IDAT", _z.compress(b"\x00" * 10))
           + png_chunk(b"IEND", b""))

    def jseg(marker, payload):
        return b"\xff" + marker + struct.pack(">H", len(payload) + 2) + payload

    jpg = (b"\xff\xd8" + jseg(b"\xdb", b"\x00" + bytes([1] * 64))
           + jseg(b"\xc0", struct.pack(">BHHB", 8, 60000, 60000, 1)
                  + bytes([1, 0x11, 0]))
           + jseg(b"\xc4", b"\x00" + bytes([0] * 15 + [1]) + b"\x00")
           + jseg(b"\xc4", b"\x10" + bytes([0] * 15 + [1]) + b"\x00")
           + jseg(b"\xda", b"\x01" + bytes([1, 0x00]) + b"\x00\x3f\x00")
           + b"\x00\x00\x00\x00\xff\xd9")

    gif = (b"GIF89a" + struct.pack("<HH", 60000, 60000) + bytes([0x80, 0, 0])
           + bytes([255, 0, 0, 0, 255, 0])
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 60000, 60000) + b"\x00"
           + b"\x02" + b"\x01\x44" + b"\x00" + b"\x3b")

    bmp = (b"BM" + b"\x00" * 8 + struct.pack("<I", 54)
           + struct.pack("<IiiHH", 40, 60000, 60000, 1, 24)
           + b"\x00" * 24 + b"\x00" * 20)

    ppm = b"P6 60000 60000 255\n" + b"\x00" * 8
    return {"png": png, "jpeg": jpg, "gif": gif, "bmp": bmp, "ppm": ppm}


def test_dimension_bombs_rejected_before_allocation():
    import pytest as _pytest
    from pysemanticcomplexity_spark.operators.multimodal import (
        _decode_bmp, _decode_gif, _decode_jpeg, _decode_png, _decode_ppm)
    bombs = _bomb_payloads()
    decoders = {"png": _decode_png, "jpeg": _decode_jpeg, "gif": _decode_gif,
                "bmp": _decode_bmp, "ppm": _decode_ppm}
    for fmt, dec in decoders.items():
        with _pytest.raises(ValueError, match="MAX_PIXELS"):
            dec(bombs[fmt])


def test_byte_bombs_rejected_within_pixel_cap():
    """Bombs that pass the PIXEL cap but blow the BYTE caps: a high-ratio
    zlib IDAT behind tiny declared dims (inflate must be capped at the
    dims-implied scanline size, not trusted), a 16-bit RGBA PNG whose raw
    buffer is ~8 B/px, a JPEG SOF whose int64 coefficient planes cost
    512 B per 8x8 block, and a GIF declaring an out-of-range LZW code
    size (a 2^mcs literal table)."""
    import struct
    import time
    import zlib as _z

    import pytest as _pytest
    from pysemanticcomplexity_spark.operators.multimodal import (
        _decode_gif, _decode_jpeg, _decode_png)

    def png_chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", _z.crc32(typ + data)))

    # 1x1 RGBA dims (pass every dim check) + an IDAT that inflates ~1000:1
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    bomb_idat = _z.compress(b"\x00" * (64 << 20), 9)     # 64 MB -> ~64 KB
    png = (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr)
           + png_chunk(b"IDAT", bomb_idat) + png_chunk(b"IEND", b""))
    t0 = time.monotonic()
    with _pytest.raises(ValueError, match="size mismatch"):
        _decode_png(png)
    assert time.monotonic() - t0 < 5        # capped inflate, no 64 MB+ alloc

    # 16-bit RGBA at 134M px passes MAX_PIXELS but needs ~1.1 GB raw
    ihdr16 = struct.pack(">IIBBBBB", 11585, 11585, 16, 6, 0, 0, 0)
    png16 = (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr16)
             + png_chunk(b"IDAT", _z.compress(b"\x00" * 8))
             + png_chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="decompression-bomb"):
        _decode_png(png16)

    # 3-component 11585x11585 SOF0: within MAX_PIXELS, ~3.2 GB of planes
    def jseg(marker, payload):
        return b"\xff" + marker + struct.pack(">H", len(payload) + 2) + payload

    jpg = (b"\xff\xd8" + jseg(b"\xdb", b"\x00" + bytes([1] * 64))
           + jseg(b"\xc0", struct.pack(">BHHB", 8, 11585, 11585, 3)
                  + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
           + b"\xff\xd9")
    with _pytest.raises(ValueError, match="decompression-bomb"):
        _decode_jpeg(jpg)

    # mcs=12 would build a 4096-entry literal table and >255 byte values
    gif = (b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0x80, 0, 0])
           + bytes([255, 0, 0, 0, 255, 0])
           + b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00"
           + b"\x0c" + b"\x01\x44" + b"\x00" + b"\x3b")
    with _pytest.raises(ValueError, match="out of range"):
        _decode_gif(gif)


def test_dimension_bombs_fall_through_to_fake(spark):
    """fake=True routes bomb payloads to the deterministic fake row
    instead of killing the task."""
    bombs = _bomb_payloads()
    rows = [(i, p) for i, p in enumerate(bombs.values())]
    blobs = spark.createDataFrame(rows, "id long, payload binary")
    out = multimodal.decode_images(blobs, fake=True).collect()
    assert len(out) == len(rows)            # every row survived
    for r in out:
        assert r["height"] is not None      # the fake fallback filled it

"""Minimal pure-numpy baseline JPEG (ITU-T T.81 / JFIF) codec.

Closes the last ``fmt`` value of BASELINE.json:input_hint that the engine
could not decode (this container has no libjpeg/PIL). Scope:

- decoder: baseline sequential DCT (SOF0; SOF1 accepted — identical
  entropy coding), 8-bit, 1 or 3 components, arbitrary Huffman/quant
  tables read from the stream, sampling factors 1-2 per axis (4:4:4,
  4:2:2, 4:2:0), restart intervals (DRI/RSTn). Progressive (SOF2) and
  arithmetic coding raise NotImplementedError with a clear message.
- encoder: gray (4:4:4) or RGB (4:2:0 box-mean subsampling), Annex-K
  quantization tables scaled by libjpeg's quality curve, and CANONICAL
  per-image Huffman tables emitted in DHT — building our own tables from
  symbol frequencies sidesteps transcribing the (long) Annex-K Huffman
  lists while producing a spec-valid file any standard decoder reads.

Everything is float64 DCT math (orthonormal separable DCT-II matrix,
vectorized over all blocks with einsum); the only per-unit Python loop is
the entropy coder, which is inherent to Huffman bitstreams. At engine
level decoding runs inside Arrow-batched ``mapInPandas`` (see
functions/image.py) so the per-image cost parallelizes across executors.

Reference parity target: reference stores image payloads opaquely and
relies on a codec library; the engine's invariant (input_hint) is
decoded-pixel PSNR >= 40 dB for lossy formats, gated in tests/test_images.
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared constants ---------------------------------------------------------

# zigzag scan order: raster index of each successive zigzag position
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
assert len(set(ZIGZAG.tolist())) == 64

# Annex-K base quantization tables (public spec, Tables K.1/K.2)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality curve: 50 -> base tables, 100 -> all-ones."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.float64)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    T = np.cos((2 * n + 1) * k * np.pi / 16.0)
    T[0] *= np.sqrt(1.0 / 2.0)
    return T * 0.5  # orthonormal: T @ T.T == I


_T = _dct_matrix()


def _fdct_blocks(B: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial -> (n, 8, 8) DCT coefficients."""
    return np.einsum("ij,njk,lk->nil", _T, B, _T)


def _idct_blocks(F: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _T, F, _T)


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad (edge-replicate) to multiples of 8 and split into (n, 8, 8)."""
    h, w = plane.shape
    H, W = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    blocks = (
        p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, H // 8, W // 8


def _from_blocks(blocks: np.ndarray, bh: int, bw: int) -> np.ndarray:
    return (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )


# --- color transforms (JFIF / BT.601) ------------------------------------------


def rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(p: np.ndarray) -> np.ndarray:
    y, cb, cr = p[..., 0], p[..., 1] - 128.0, p[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


# --- Huffman ------------------------------------------------------------------


def _canonical_table(symbols: list[int]) -> tuple[list[int], list[int], dict]:
    """Fixed-length canonical Huffman over the USED symbols: every symbol
    gets length L = ceil(log2(n+1)) (n < 2^L keeps the all-ones code
    unused, which some decoders reserve). Returns (bits[16], huffval,
    {symbol: (code, length)}). Simple, spec-valid, deterministic; the
    decoder reads whatever DHT describes, so optimality is a size concern
    only."""
    vals = sorted(set(symbols)) or [0]
    L = max(1, (len(vals)).bit_length())  # 2^L > n  (n+1 <= 2^L)
    if (1 << L) == len(vals):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(vals)
    enc = {s: (i, L) for i, s in enumerate(vals)}
    return bits, vals, enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


# --- encoder ------------------------------------------------------------------


def _component_symbols(coeffs: np.ndarray):
    """Per-block (dc_symbol, dc_bits, [(ac_symbol, ac_bits), ...]) stream
    from zigzagged int coefficients (n, 64); DC is differential."""
    out = []
    prev_dc = 0
    for blk in coeffs:
        dc = int(blk[0])
        diff = dc - prev_dc
        prev_dc = dc
        s = _category(diff)
        dc_part = (s, (_magnitude_bits(diff, s), s))
        acs = []
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for i in range(1, last + 1):
            v = int(blk[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, (0, 0)))  # ZRL
                run -= 16
            s = _category(v)
            acs.append(((run << 4) | s, (_magnitude_bits(v, s), s)))
            run = 0
        if last < 63:
            acs.append((0x00, (0, 0)))  # EOB
        out.append((dc_part, acs))
    return out


def jpeg_encode(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "420",
    interleave: bool = True,
) -> bytes:
    """Encode uint8 (h, w) gray or (h, w, 3) RGB as baseline JFIF JPEG.

    ``subsampling``: "420" (default; 2x2 box-mean chroma — the web
    default, ~37 dB ceiling on saturated chroma gradients) or "444"
    (full-resolution chroma — use when the PSNR >= 40 dB invariant must
    hold on chroma-heavy content).

    ``interleave``: True emits one MCU-interleaved scan (what every
    camera/browser writes); False emits one single-component scan per
    plane in raster data-unit order (T.81 non-interleaved layout, block
    counts ceil(ceil(dim*h_i/hmax)/8) per A.2.2) — exists mainly to
    exercise the decoder's multi-scan path against externally-produced
    files."""
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    if subsampling not in ("420", "444"):
        raise ValueError("subsampling must be '420' or '444'")
    h, w = pixels.shape[0], pixels.shape[1]
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        qts = [qt_l]
    elif subsampling == "444":
        ycc = rgb_to_ycbcr(pixels)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]
    else:
        ycc = rgb_to_ycbcr(pixels)
        # pad to multiples of 16 so 4 Y-blocks align with 1 chroma block
        H, W = -(-h // 16) * 16, -(-w // 16) * 16
        ycc = np.pad(ycc, ((0, H - h), (0, W - w), (0, 0)), mode="edge")
        y = ycc[..., 0]
        cb = ycc[..., 1].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        cr = ycc[..., 2].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
        samp = [(2, 2), (1, 1), (1, 1)]
        qts = [qt_l, qt_c, qt_c]

    # FDCT + quantize + zigzag per component
    comp_coeffs, comp_bw = [], []
    for plane, qt in zip(planes, qts):
        blocks, bh, bw = _to_blocks(plane)
        F = _fdct_blocks(blocks - 128.0)
        q = np.round(F / qt).astype(np.int64)
        comp_coeffs.append(q.reshape(len(q), 64)[:, ZIGZAG])
        comp_bw.append((bh, bw))

    # Emission order (DC differentials MUST follow it — the decoder's
    # predictor runs in scan order). Interleaved: one scan of MCUs.
    # Non-interleaved: one scan per component, raster data-unit order
    # cropped to the T.81 A.2.2 block counts (the padded _to_blocks grid
    # can be one block wider than the spec count when dims aren't MCU
    # multiples — those pad blocks are simply not transmitted).
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    if interleave or gray:
        if gray:
            order = [(0, i) for i in range(len(comp_coeffs[0]))]
        elif subsampling == "444":
            order = [
                (ci, bi)
                for bi in range(len(comp_coeffs[0]))
                for ci in range(3)
            ]
        else:
            bh_y, bw_y = comp_bw[0]
            mcus_x, mcus_y = bw_y // 2, bh_y // 2
            order = []
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for dy in range(2):
                        for dx in range(2):
                            order.append(
                                (0, (my * 2 + dy) * bw_y + mx * 2 + dx)
                            )
                    order.append((1, my * comp_bw[1][1] + mx))
                    order.append((2, my * comp_bw[2][1] + mx))
        scan_orders = [order]
    else:
        scan_orders = []
        for ci in range(len(planes)):
            bh_i, bw_i = comp_bw[ci]
            bw_spec = -(-w * samp[ci][0] // (8 * hmax))
            bh_spec = -(-h * samp[ci][1] // (8 * vmax))
            scan_orders.append(
                [
                    (ci, by * bw_i + bx)
                    for by in range(min(bh_spec, bh_i))
                    for bx in range(min(bw_spec, bw_i))
                ]
            )
    order = [item for sc in scan_orders for item in sc]

    # per-component symbol streams in emission order
    comp_emit = [[bi for ci, bi in order if ci == c] for c in range(len(planes))]
    streams = [
        dict(zip(emit, _component_symbols(comp_coeffs[ci][np.array(emit)])))
        for ci, emit in enumerate(comp_emit)
    ]

    # canonical Huffman tables from the actual symbol streams
    def syms(idx_list, which):
        s = []
        for ci in idx_list:
            for dc_part, acs in streams[ci].values():
                if which == "dc":
                    s.append(dc_part[0])
                else:
                    s.extend(a[0] for a in acs)
        return s

    luma_ids, chroma_ids = [0], ([1, 2] if not gray else [])
    tables = {("dc", 0): _canonical_table(syms(luma_ids, "dc")),
              ("ac", 0): _canonical_table(syms(luma_ids, "ac"))}
    if chroma_ids:
        tables[("dc", 1)] = _canonical_table(syms(chroma_ids, "dc"))
        tables[("ac", 1)] = _canonical_table(syms(chroma_ids, "ac"))

    # entropy-coded scan(s) — one blob per SOS; the DC predictor resets
    # at each scan start (fresh writer per scan keeps byte alignment too)
    comp_tbl = [0] + ([1, 1] if chroma_ids else [])
    scan_blobs = []
    for sc in scan_orders:
        bw_ = _BitWriter()
        for ci, bi in sc:
            t = comp_tbl[ci]
            dc_enc = tables[("dc", t)][2]
            ac_enc = tables[("ac", t)][2]
            (dsym, (dval, dlen)), acs = streams[ci][bi]
            code, length = dc_enc[dsym]
            bw_.write(code, length)
            if dlen:
                bw_.write(dval, dlen)
            for asym, (aval, alen) in acs:
                code, length = ac_enc[asym]
                bw_.write(code, length)
                if alen:
                    bw_.write(aval, alen)
        bw_.flush()
        scan_blobs.append(bw_.out)

    # --- container ---
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = bytearray(b"\xFF\xD8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, qt in ((0, qt_l),) + (((1, qt_c),) if not gray else ()):
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8).tobytes()
        out += seg(0xFFDB, bytes([tid]) + zz)
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        hv = (samp[i][0] << 4) | samp[i][1]
        sof += bytes([i + 1, hv, 0 if i == 0 else 1])
    out += seg(0xFFC0, sof)
    for (kind, tid), (bits, vals, _) in sorted(tables.items()):
        tc = 0 if kind == "dc" else 1
        out += seg(0xFFC4, bytes([(tc << 4) | tid] + bits + vals))
    for sc, blob in zip(scan_orders, scan_blobs):
        comp_ids = sorted({ci for ci, _ in sc})
        sos = bytes([len(comp_ids)])
        for i in comp_ids:
            t = comp_tbl[i]
            sos += bytes([i + 1, (t << 4) | t])
        sos += bytes([0, 63, 0])
        out += seg(0xFFDA, sos)
        out += blob
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# --- decoder ------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    marker (leaves position ON the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise EOFError("truncated JPEG entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        self.acc = 0
        self.nbits = 0


def _build_decoder_table(bits: list[int], vals: list[int]) -> dict:
    """{(length, code): symbol} canonical table from DHT bits/huffval."""
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


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG. Returns (h, w) uint8 for 1-component
    images, (h, w, 3) uint8 RGB for 3-component (YCbCr assumed, per JFIF)."""
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    h = w = None
    restart_interval = 0

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + length]
        pos += length
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                n = 64 * (2 if pq else 1)
                raw = payload[p : p + n]
                p += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.float64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                )
                qt = np.zeros(64)
                qt[ZIGZAG] = vals
                qtabs[tq] = qt.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                p += 1
                bits = list(payload[p : p + 16])
                p += 16
                n = sum(bits)
                vals = list(payload[p : p + n])
                p += n
                htabs[(tc, th)] = _build_decoder_table(bits, vals)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            precision, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported SOF marker 0x{marker:02X}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = payload[0]
            scan = []
            for i in range(ns):
                cs, tt = payload[1 + 2 * i : 3 + 2 * i]
                c = next(c for c in comps if c["id"] == cs)
                scan.append((c, tt >> 4, tt & 0xF))
            # Hmax/Vmax are FRAME properties (T.81 A.1.1): a scan that
            # carries a subset of components (e.g. a non-interleaved chroma
            # scan in a subsampled frame) must still size its blocks
            # against the frame-wide maxima, not the scan-local ones
            fhmax = max(c["h"] for c in comps)
            fvmax = max(c["v"] for c in comps)
            pos = _decode_scan(
                data, pos, scan, qtabs, htabs, h, w, restart_interval,
                fhmax, fvmax,
            )
        # APPn / COM / others: skipped via length

    if h is None:
        raise ValueError("no frame header found")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        plane = c["plane"]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    return ycbcr_to_rgb(np.stack(planes, axis=-1))


def _decode_scan(
    data, pos, scan, qtabs, htabs, h, w, restart_interval, hmax, vmax
):
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c, _, _ in scan:
        bw_c = mcus_x * c["h"]
        bh_c = mcus_y * c["v"]
        c["coeff"] = np.zeros((bh_c * bw_c, 64), dtype=np.float64)
        c["bw"] = bw_c
        c["bh"] = bh_c
    if len(scan) == 1:
        # non-interleaved single-component scan covers its own blocks
        c = scan[0][0]
        c["bw"] = -(-w * c["h"] // (8 * hmax))
        c["bh"] = -(-h * c["v"] // (8 * vmax))
        c["coeff"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.float64)

    reader = _BitReader(data, pos)
    preds = {id(c): 0 for c, _, _ in scan}

    def decode_block(c, td, ta, bi):
        dc_tab = htabs[(0, td)]
        ac_tab = htabs[(1, ta)]
        s = _huff_decode(reader, dc_tab)
        diff = _extend(reader.bits(s), s) if s else 0
        preds[id(c)] += diff
        blk = c["coeff"][bi]
        blk[0] = preds[id(c)]
        k = 1
        while k <= 63:
            rs = _huff_decode(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            blk[k] = _extend(reader.bits(s), s)
            k += 1

    n_mcus = (
        mcus_x * mcus_y
        if len(scan) > 1
        else scan[0][0]["bh"] * scan[0][0]["bw"]
    )
    since_restart = 0
    for m in range(n_mcus):
        if restart_interval and since_restart == restart_interval and m < n_mcus:
            reader.align_to_marker()
            if data[reader.pos] == 0xFF and 0xD0 <= data[reader.pos + 1] <= 0xD7:
                reader.pos += 2
            for key in preds:
                preds[key] = 0
            since_restart = 0
        if len(scan) == 1:
            c, td, ta = scan[0]
            decode_block(c, td, ta, m)
        else:
            my, mx = divmod(m, mcus_x)
            for c, td, ta in scan:
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        bi = (my * c["v"] + dy) * c["bw"] + mx * c["h"] + dx
                        decode_block(c, td, ta, bi)
        since_restart += 1

    # dequantize + un-zigzag + IDCT per component (vectorized)
    for c, _, _ in scan:
        qt = qtabs[c["tq"]]
        coeff = np.zeros((len(c["coeff"]), 64))
        coeff[:, ZIGZAG] = c["coeff"]
        F = coeff.reshape(-1, 8, 8) * qt[None, :, :]
        spatial = _idct_blocks(F) + 128.0
        c["plane"] = _from_blocks(spatial, c["bh"], c["bw"])
        del c["coeff"]

    # advance past entropy data to the next marker
    p = reader.pos
    while p < len(data) - 1 and not (
        data[p] == 0xFF and data[p + 1] != 0x00
    ):
        p += 1
    return p

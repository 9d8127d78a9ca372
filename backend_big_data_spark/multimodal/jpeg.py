"""Real baseline-JFIF JPEG codec — pure stdlib + numpy, no imaging
library. Closes the one remaining multimodal stub with an implementable
body (progressive/arithmetic variants stay honestly gated).

DECODER scope: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr
with 4:4:4 / 4:2:2 / 4:2:0 sampling, generic DQT/DHT tables from the
stream, restart markers (DRI/RSTn), byte-stuffing. That covers the
overwhelming majority of real-world JPEGs. Anything else (SOF2
progressive, 12-bit, arithmetic coding) raises ValueError — the
quarantine convention upstream (`multimodal/binary_ops.py`).

ENCODER scope: baseline sequential, grayscale / 4:4:4 / 4:2:0. It builds
its OWN canonical Huffman tables from the actual symbol set (fixed code
length, Kraft-valid, never the all-ones code) and carries them in DHT —
valid JPEG any decoder reads, and deliberately free of hand-transcribed
spec constants that a self-consistent encode/decode pair could not
catch. Compression optimality is irrelevant here; correctness is.

The pixel math is float64 matrix IDCT/DCT (exact to rounding), BT.601
YCbCr. Bit-level loops are pure Python — fine for the Arrow-batched
mapInPandas path where one worker amortizes per-batch, and for tests;
a production deployment would swap in a codec library behind the same
`decode_image_batch(codec=...)` seam.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order: position-in-sequence -> raster index within the 8x8
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: 8x8 DCT-II basis: A[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_A = np.zeros((8, 8))
for _u in range(8):
    _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

#: deterministic quantization tables (values 1..255; any are valid JPEG —
#: they travel in DQT). Gentle slope: DC finest, high frequencies coarser.
QUANT_LUMA = (8 + 2 * (np.arange(8)[:, None] + np.arange(8)[None, :])).astype(
    np.uint8
)
QUANT_CHROMA = (12 + 3 * (np.arange(8)[:, None] + np.arange(8)[None, :])).astype(
    np.uint8
)


# ---------------------------------------------------------------------------
# Huffman plumbing
# ---------------------------------------------------------------------------
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map from a DHT BITS/HUFFVAL spec."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _fixed_length_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A valid canonical table assigning every distinct symbol the same
    code length L = ceil(log2(n+1)) (the +1 keeps the all-ones code of
    length L unused, as JPEG requires). Returns (BITS, HUFFVAL)."""
    syms = sorted(set(symbols)) or [0]
    n = len(syms)
    length = max(1, int(np.ceil(np.log2(n + 1))))
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.acc, self.nbits = 0, 0

    def pad_to_byte(self) -> None:
        while self.nbits:
            self.write(1, 1)


class _BitReader:
    """Reads MSB-first bits from an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit, self.pos = 0, self.pos + 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    if s == 0:
        return 0
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JFIF payload -> HxWx3 (color) or
    HxWx1 (grayscale) uint8. Raises ValueError on anything malformed or
    outside the baseline scope (progressive, arithmetic, 12-bit)."""
    buf = bytes(payload)
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError(f"expected marker at offset {pos}")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # bare markers
            continue
        if pos + 2 > len(buf):
            raise ValueError("truncated marker segment")
        (seg_len,) = struct.unpack_from(">H", buf, pos)
        seg = buf[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated marker payload")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                if p + 65 > len(seg):
                    raise ValueError("truncated DQT")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                if p + 17 > len(seg):
                    raise ValueError("truncated DHT")
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT values")
                huff[(tc, th)] = _canonical_codes(bits, vals)
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            if len(seg) < 6:
                raise ValueError("truncated SOF")
            precision, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(ncomp):
                cid, hv, tq_id = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq_id))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 15))
            data_start = pos + seg_len
            return _decode_scan(
                buf, data_start, frame, scan, qt, huff, restart_interval
            )
        # APPn/COM and anything else: skip
        pos += seg_len
    raise ValueError("no SOS marker found")


def _split_entropy(buf: bytes, start: int) -> list[bytes]:
    """Unstuff the entropy-coded data from ``start``; split at RSTn."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # a real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs


def _decode_scan(buf, data_start, frame, scan, qt, huff, restart_interval):
    h, w, comps = frame
    if h == 0 or w == 0 or not comps:
        raise ValueError("empty frame")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    by_id = {c[0]: c for c in comps}
    planes = {}
    for cid, hi, vi, tq_id in comps:
        planes[cid] = np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64)
        if tq_id not in qt:
            raise ValueError(f"missing quant table {tq_id}")
    tables = {}
    for cs, td, ta in scan:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("missing Huffman table referenced by SOS")
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        tables[cs] = (huff[(0, td)], huff[(1, ta)])

    segs = _split_entropy(buf, data_start)
    seg_idx = 0
    reader = _BitReader(segs[0])
    preds = {cs: 0 for cs, _, _ in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                reader = _BitReader(segs[seg_idx])
                preds = {cs: 0 for cs in preds}
            for cs, _, _ in scan:
                _, hi, vi, tq_id = by_id[cs]
                dc_t, ac_t = tables[cs]
                q = qt[tq_id]
                for by in range(vi):
                    for bx in range(hi):
                        coef = np.zeros(64, dtype=np.float64)
                        s = reader.decode_symbol(dc_t)
                        diff = _extend(reader.read_bits(s), s)
                        preds[cs] += diff
                        coef[0] = preds[cs]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            coef[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = coef
                        block = block.reshape(8, 8) * q
                        spatial = _A.T @ block @ _A + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    # crop/upsample each component to full resolution
    full = {}
    for cid, hi, vi, _tq in comps:
        p = planes[cid]
        ch = (h * vi + vmax - 1) // vmax
        cw = (w * hi + hmax - 1) // hmax
        p = p[:ch, :cw]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full[cid] = p[:h, :w]
    if len(comps) == 1:
        y = np.clip(np.rint(full[comps[0][0]]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    if len(comps) != 3:
        raise ValueError(f"unsupported component count {len(comps)}")
    y, cb, cr = (full[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def _zigzag_vec(qz_raster: np.ndarray) -> np.ndarray:
    return qz_raster.reshape(64)[ZIGZAG]


def _block_symbols(zz: np.ndarray, pred: int) -> tuple[list[tuple], int]:
    """(symbol ops, new DC pred) for one zigzagged quantized block.
    Ops are ('dc', s, amp) / ('ac', rs, s, amp) tuples."""
    ops: list[tuple] = []
    diff = int(zz[0]) - pred
    s = _category(diff)
    amp = diff if diff >= 0 else diff + (1 << s) - 1
    ops.append(("dc", s, amp))
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k] != 0:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ops.append(("ac", 0xF0, 0, 0))
            run -= 16
        s = _category(v)
        amp = v if v >= 0 else v + (1 << s) - 1
        ops.append(("ac", (run << 4) | s, s, amp))
        run = 0
    if last_nz < 63:
        ops.append(("ac", 0x00, 0, 0))
    return ops, int(zz[0])


def encode_jpeg(
    arr: np.ndarray, subsampling: str = "444", restart_interval: int = 0
) -> bytes:
    """Encode an HxWx3 RGB or HxWx1/HxW grayscale uint8 raster as a
    baseline-sequential JFIF. ``subsampling``: '444' or '420' (color
    only). Huffman tables are built from the actual symbol set."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("expected HxWx3 RGB or HxWx1 grayscale uint8")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = a.shape[2] == 1
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if gray:
        planes = [a[:, :, 0].astype(np.float64)]
        samps = [(1, 1)]
        qids = [0]
    else:
        rgb = a.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "420":
            cb, cr = (_box_down2(p) for p in (cb, cr))
            samps = [(2, 2), (1, 1), (1, 1)]
        else:
            samps = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
    quants = {0: QUANT_LUMA.astype(np.float64), 1: QUANT_CHROMA.astype(np.float64)}

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component padded planes and quantized blocks, indexed (by, bx)
    comp_blocks = []
    for plane, (hi, vi), qid in zip(planes, samps, qids):
        ph, pw = mcus_y * vi * 8, mcus_x * hi * 8
        padded = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        blocks = {}
        q = quants[qid]
        for byy in range(ph // 8):
            for bxx in range(pw // 8):
                blk = padded[byy * 8 : byy * 8 + 8, bxx * 8 : bxx * 8 + 8] - 128.0
                coef = _A @ blk @ _A.T
                blocks[(byy, bxx)] = _zigzag_vec(np.rint(coef / q).astype(np.int64))
        comp_blocks.append(blocks)

    # MCU-ordered symbol stream (two passes: collect symbols, then write)
    def mcu_ops():
        preds = [0] * len(planes)
        count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and count and count % restart_interval == 0:
                    preds = [0] * len(planes)
                    yield ("rst", count // restart_interval - 1)
                for ci, (hi, vi) in enumerate(samps):
                    for byy in range(vi):
                        for bxx in range(hi):
                            zz = comp_blocks[ci][(my * vi + byy, mx * hi + bxx)]
                            ops, preds[ci] = _block_symbols(zz, preds[ci])
                            for op in ops:
                                yield (ci, op)
                count += 1

    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}
    tclass = [0 if i == 0 else 1 for i in range(len(planes))]
    for item in mcu_ops():
        if item[0] == "rst":
            continue
        ci, op = item
        tc = tclass[ci]
        if op[0] == "dc":
            dc_syms[tc].append(op[1])
        else:
            ac_syms[tc].append(op[1])
    dc_tabs = {t: _fixed_length_table(dc_syms[t]) for t in (0, 1) if dc_syms[t]}
    ac_tabs = {t: _fixed_length_table(ac_syms[t]) for t in (0, 1) if ac_syms[t]}

    def enc_table(bits_vals):
        bits, vals = bits_vals
        codes = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes = {t: enc_table(tb) for t, tb in dc_tabs.items()}
    ac_codes = {t: enc_table(tb) for t, tb in ac_tabs.items()}

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += _segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    used_q = sorted(set(qids))
    for qid in used_q:
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = quants[qid].astype(np.uint8).reshape(64)[ZIGZAG]
        out += _segment(0xDB, bytes([qid]) + zz.tobytes())
    sof = bytearray([8])
    sof += struct.pack(">HH", h, w)
    sof.append(len(planes))
    for i, ((hi, vi), qid) in enumerate(zip(samps, qids)):
        sof += bytes([i + 1, (hi << 4) | vi, qid])
    out += _segment(0xC0, bytes(sof))
    for tc, tabs, in ((0, dc_tabs), (1, ac_tabs)):
        for th, (bits, vals) in sorted(tabs.items()):
            out += _segment(
                0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
            )
    if restart_interval:
        out += _segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytearray([len(planes)])
    for i in range(len(planes)):
        t = tclass[i]
        sos += bytes([i + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += _segment(0xDA, bytes(sos))

    bw = _BitWriter()
    for item in mcu_ops():
        if item[0] == "rst":
            bw.pad_to_byte()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + (item[1] % 8)])
            continue
        ci, op = item
        tc = tclass[ci]
        if op[0] == "dc":
            _, s, amp = op
            ln, code = dc_codes[tc][s]
            bw.write(code, ln)
            if s:
                bw.write(amp, s)
        else:
            _, rs, s, amp = op
            ln, code = ac_codes[tc][rs]
            bw.write(code, ln)
            if s:
                bw.write(amp, s)
    bw.pad_to_byte()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _box_down2(p: np.ndarray) -> np.ndarray:
    """2x2 box-average downsample with edge replication for odd dims."""
    h, w = p.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
    return (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0


def _segment(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


__all__ = ["decode_jpeg", "encode_jpeg", "QUANT_LUMA", "QUANT_CHROMA", "ZIGZAG"]

"""Progressive JPEG (ITU-T T.81 Annex G, Huffman, 8-bit) — from scratch.

The reference reads any GDAL-supported raster; real web image corpora are
full of progressive JPEGs (SOF2), which the baseline decoder in
:mod:`moaray.jpeg` gated behind NotImplementedError. This module adds:

- ``jpeg_decode_progressive``: multi-scan decoder — spectral selection
  (per-band AC scans, interleaved/non-interleaved DC scans) AND successive
  approximation (DC/AC first + refinement passes, EOB-run decoding per
  G.1.2.2-3; the refinement control flow mirrors the spec's published
  reference flowcharts, which libjpeg also implements).
- ``jpeg_encode_progressive``: a real progressive encoder used by the
  round-trip tests (the sandbox has no image library to produce SOF2
  streams). It emits a libjpeg-style scan script — interleaved DC first
  scan at Al=1, per-component spectral-band AC first scans at Al=1, then
  DC + AC refinement scans to Al=0 — with EOBn run symbols (the uniform
  custom Huffman tables below include EOB1..EOB14, which the baseline
  Annex-K tables lack), ZRL-in-refinement, and buffered correction bits.

Pixel parity: a progressive stream carries exactly the same quantized
coefficients as a baseline stream at the same quality, so decode of
``jpeg_encode_progressive(arr, q)`` is asserted BIT-EQUAL to decode of
``jpeg.jpeg_encode(arr, q)`` in tests/test_jpeg_progressive.py.

Sign conventions (G.1.2.1-3): DC successive approximation is two's
complement (floor shifts; refinement ORs in the new bit), AC is
sign-magnitude (first pass sends ±(m << Al), refinement steps magnitude
by 1 << Al away from zero).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    SOI,
    _C,
    _BitReader,
    _BitWriter,
    _UNZIGZAG,
    _ZIGZAG,
    _K2_CHROMA,
    _box_down2,
    _build_decode_table,
    _canonical_codes,
    _extend,
    _huff_payload,
    _magnitude,
    _mcu_order,
    _plane_to_zz,
    _quality_table,
    _rgb_to_ycbcr,
    _seg,
    _ycbcr_to_rgb,
)

# ---------------------------------------------------------------------------
# Huffman tables for the progressive ENCODER: uniform-length canonical codes
# covering every symbol class progressive scans can emit. DC: sizes 0..11 at
# 4 bits (Kraft 12/16). AC: EOB0..EOB14 (0x00..0xE0), ZRL (0xF0) and all
# (run 0..15, size 1..10) at 8 bits (176/256) — unlike Annex K's baseline
# tables these include the EOBn run symbols, so real EOB runs are exercised.
# ---------------------------------------------------------------------------

_P_DC_VALS = list(range(12))
_P_DC_BITS = [0, 0, 0, 12] + [0] * 12
_P_AC_VALS = sorted(
    [r << 4 for r in range(15)]            # EOB0..EOB14
    + [0xF0]                                # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_P_AC_BITS = [0] * 7 + [len(_P_AC_VALS)] + [0] * 8


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _ACFirstWriter:
    """AC first-pass scan (Ah=0): spectral band Ss..Se of |coef| >> Al,
    with cross-block EOB-run accumulation (G.1.2.2)."""

    def __init__(self, bw: _BitWriter, codes):
        self.bw = bw
        self.codes = codes
        self.eobrun = 0

    def flush_eobrun(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.codes[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0

    def block(self, row, ss: int, se: int, al: int):
        bw = self.bw
        codes = self.codes
        r = 0
        for k in range(ss, se + 1):
            v = int(row[k])
            t = (v if v >= 0 else -v) >> al
            if t == 0:
                r += 1
                continue
            self.flush_eobrun()
            while r > 15:
                code, ln = codes[0xF0]
                bw.write(code, ln)
                r -= 16
            s = t.bit_length()
            code, ln = codes[(r << 4) | s]
            bw.write(code, ln)
            bw.write(t if v >= 0 else (t ^ ((1 << s) - 1)), s)
            r = 0
        if r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()


class _ACRefineWriter:
    """AC refinement scan (Ah=Al+1): correction bits for history-nonzero
    coefficients, (run,1)+sign for newly-nonzero ones, ZRL folded into EOB
    runs where possible, correction bits buffered across EOB runs
    (G.1.2.3; control flow mirrors the spec flowcharts)."""

    def __init__(self, bw: _BitWriter, codes):
        self.bw = bw
        self.codes = codes
        self.eobrun = 0
        self.be: list[int] = []  # correction bits owned by the pending EOB run

    def flush_eobrun(self):
        if self.eobrun:
            nbits = self.eobrun.bit_length() - 1
            code, ln = self.codes[nbits << 4]
            self.bw.write(code, ln)
            if nbits:
                self.bw.write(self.eobrun & ((1 << nbits) - 1), nbits)
            self.eobrun = 0
        for b in self.be:
            self.bw.write(b, 1)
        self.be = []

    def block(self, row, ss: int, se: int, al: int):
        bw = self.bw
        codes = self.codes
        absv = []
        eob_k = ss - 1  # position of the last newly-nonzero coefficient
        for k in range(ss, se + 1):
            v = int(row[k])
            t = (v if v >= 0 else -v) >> al
            absv.append(t)
            if t == 1:
                eob_k = k
        r = 0
        br: list[int] = []  # correction bits pending within this block
        for k in range(ss, se + 1):
            t = absv[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob_k:
                self.flush_eobrun()
                code, ln = codes[0xF0]
                bw.write(code, ln)
                r -= 16
                for b in br:
                    bw.write(b, 1)
                br = []
            if t > 1:  # history-nonzero: correction bit only
                br.append(t & 1)
                continue
            # newly nonzero: (run,1) + sign + the buffered correction bits
            self.flush_eobrun()
            code, ln = codes[(r << 4) | 1]
            bw.write(code, ln)
            bw.write(1 if int(row[k]) >= 0 else 0, 1)
            for b in br:
                bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.be.extend(br)
            if self.eobrun == 0x7FFF or len(self.be) > 937:
                self.flush_eobrun()


def jpeg_encode_progressive(
    arr: np.ndarray, quality: int = 95, subsampling: str = "420"
) -> bytes:
    """Encode a 2-D (grayscale) or (h, w, 3) RGB uint8 array as a
    progressive (SOF2) JFIF stream. Scan script: interleaved DC first
    (Al=1); per-component AC spectral bands (luma split 1-5 / 6-63) at
    Al=1; interleaved DC refinement; per-component AC refinement to Al=0.
    """
    if arr.dtype != np.uint8:
        raise ValueError(f"JPEG is 8-bit; got {arr.dtype}")
    color = arr.ndim == 3
    if color and arr.shape[2] != 3:
        raise ValueError(f"expected 2-D or (h, w, 3), got {arr.shape}")
    if subsampling not in ("420", "444"):
        raise ValueError(f"subsampling must be '420' or '444', got {subsampling!r}")
    h, w = arr.shape[:2]
    qy = _quality_table(quality)
    if color:
        qc = _quality_table(quality, _K2_CHROMA)
        y, cb, cr = _rgb_to_ycbcr(arr)
        hmax, vmax = (2, 2) if subsampling == "420" else (1, 1)
        if subsampling == "420":
            cb, cr = _box_down2(cb), _box_down2(cr)
        specs = [(1, y, hmax, vmax, qy, 0), (2, cb, 1, 1, qc, 1),
                 (3, cr, 1, 1, qc, 1)]
    else:
        hmax = vmax = 1
        specs = [(1, arr.astype(np.float64), 1, 1, qy, 0)]
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))

    comps = []
    for cid, plane, hi, vi, q, tq in specs:
        bh_c, bv_c = mcux * hi, mcuy * vi
        zz, _sizes, _bits = _plane_to_zz(plane, bv_c, bh_c, q)
        # non-interleaved block grid: ceil(comp dims / 8) (A.2.2)
        cw = -(-w * hi // hmax)
        ch = -(-h * vi // vmax)
        bwn, bvn = -(-cw // 8), -(-ch // 8)
        raster = [by * bh_c + bx for by in range(bvn) for bx in range(bwn)]
        comps.append({
            "cid": cid, "hi": hi, "vi": vi, "tq": tq, "zz": zz,
            "order": _mcu_order(mcuy, mcux, vi, hi).tolist(),
            "bpm": vi * hi, "raster": raster,
        })

    dc_codes = _canonical_codes(_P_DC_BITS, _P_DC_VALS)
    ac_codes = _canonical_codes(_P_AC_BITS, _P_AC_VALS)

    out = bytearray()
    out += SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0]) + bytes(int(x) for x in qy[_ZIGZAG]))
    if color:
        out += _seg(0xDB, bytes([1]) + bytes(int(x) for x in qc[_ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for c in comps:
        sof += bytes([c["cid"], (c["hi"] << 4) | c["vi"], c["tq"]])
    out += _seg(0xC2, sof)  # SOF2: progressive, Huffman
    out += _seg(0xC4, _huff_payload(0, 0, _P_DC_BITS, _P_DC_VALS))
    out += _seg(0xC4, _huff_payload(1, 0, _P_AC_BITS, _P_AC_VALS))

    def sos_header(scan_comps, ss, se, ah, al):
        payload = bytes([len(scan_comps)])
        for c in scan_comps:
            payload += bytes([c["cid"], 0x00])  # Td=0, Ta=0 (shared tables)
        payload += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, payload)

    # --- scan 1: DC first, all components interleaved, Al=1 ---
    bw = _BitWriter()
    prev = [0] * len(comps)
    ptr = [0] * len(comps)
    for _m in range(mcuy * mcux):
        for ci, c in enumerate(comps):
            zz = c["zz"]
            for _b in range(c["bpm"]):
                bi = c["order"][ptr[ci]]
                ptr[ci] += 1
                v = int(zz[bi, 0]) >> 1  # Al=1, floor shift (G.1.2.1)
                size, dbits = _magnitude(v - prev[ci])
                prev[ci] = v
                code, ln = dc_codes[size]
                bw.write(code, ln)
                if size:
                    bw.write(dbits, size)
    bw.flush()
    out += sos_header(comps, 0, 0, 0, 1) + bw.out

    # --- AC first scans at Al=1: luma band-split to prove spectral selection ---
    bands = {0: [(1, 5), (6, 63)]}  # component index -> band list
    for ci, c in enumerate(comps):
        for ss, se in bands.get(ci, [(1, 63)]):
            bw = _BitWriter()
            wr = _ACFirstWriter(bw, ac_codes)
            zz = c["zz"]
            for bi in c["raster"]:
                wr.block(zz[bi], ss, se, 1)
            wr.flush_eobrun()
            bw.flush()
            out += sos_header([c], ss, se, 0, 1) + bw.out

    # --- DC refinement (Ah=1 -> Al=0): raw bit per block, interleaved ---
    bw = _BitWriter()
    ptr = [0] * len(comps)
    for _m in range(mcuy * mcux):
        for ci, c in enumerate(comps):
            zz = c["zz"]
            for _b in range(c["bpm"]):
                bi = c["order"][ptr[ci]]
                ptr[ci] += 1
                bw.write(int(zz[bi, 0]) & 1, 1)
    bw.flush()
    out += sos_header(comps, 0, 0, 1, 0) + bw.out

    # --- AC refinement scans (Ah=1 -> Al=0) ---
    for c in comps:
        bw = _BitWriter()
        wr = _ACRefineWriter(bw, ac_codes)
        zz = c["zz"]
        for bi in c["raster"]:
            wr.block(zz[bi], 1, 63, 0)
        wr.flush_eobrun()
        bw.flush()
        out += sos_header([c], 1, 63, 1, 0) + bw.out

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _entropy_pieces(buf: bytes, start: int):
    """Entropy-coded data from ``start`` to the next real marker: returns
    (unstuffed pieces split at RSTn, absolute position after the data)."""
    seg = buf[start:]
    arr = np.frombuffer(seg, np.uint8)
    ff = np.where(arr[:-1] == 0xFF)[0]
    nxt = arr[ff + 1] if len(ff) else np.empty(0, np.uint8)
    is_stuff = nxt == 0x00
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
    real = ff[~(is_stuff | is_rst)]
    end = int(real[0]) if len(real) else len(arr)
    rst_pos = ff[is_rst]
    rst_pos = rst_pos[rst_pos < end]
    pieces = []
    pos = 0
    for rp in rst_pos.tolist():
        pieces.append(seg[pos:rp].replace(b"\xff\x00", b"\xff"))
        pos = rp + 2
    pieces.append(seg[pos:end].replace(b"\xff\x00", b"\xff"))
    return pieces, start + end


def _decode_dc_scan(pieces, comps, scan, per_seg, n_units, htables, ah, al):
    """DC scan (Ss=Se=0), interleaved (units = MCUs) or single-component
    (units = that component's data units). ``scan`` = list of (comp, Td)."""
    done = 0
    ptr = [0] * len(scan)
    for seg_data in pieces:
        br = _BitReader(seg_data)
        prev = [0] * len(scan)
        for _ in range(min(per_seg, n_units - done)):
            for ci, (c, td) in enumerate(scan):
                zz = c["zz"]
                idx = c["mcu_idx"] if len(scan) > 1 else c["raster"]
                bpm = c["bpm"] if len(scan) > 1 else 1
                for _b in range(bpm):
                    bi = idx[ptr[ci]]
                    ptr[ci] += 1
                    if ah == 0:
                        size = br.decode_symbol(htables[(0, td)])
                        prev[ci] += _extend(br.read_bits(size), size)
                        zz[bi, 0] = prev[ci] << al
                    else:  # refinement: one raw bit (G.1.2.1)
                        if br.read_bits(1):
                            zz[bi, 0] = int(zz[bi, 0]) | (1 << al)
            done += 1
    if done != n_units:
        raise ValueError(f"progressive DC scan decoded {done}/{n_units}")


def _decode_ac_scan(pieces, c, ac_tbl, per_seg, ss, se, ah, al):
    """AC scan: single component only (B.2.3 forbids interleaved AC).

    The bit-reader state lives in locals (per-symbol method calls were
    ~55% of progressive decode wall time; same treatment as the baseline
    scan loop in jpeg.py). First pass (Ah=0) accumulates coefficient
    writes for ONE bulk numpy scatter; refinement mutates in place (it
    must read history)."""
    zz = c["zz"]
    raster = c["raster"]
    n_units = len(raster)
    ac_sym, ac_len = ac_tbl
    done = 0
    p1 = 1 << al
    m1 = -1 << al
    pos_l: list[int] = []
    val_l: list[int] = []
    for seg_data in pieces:
        data = seg_data
        n_data = len(data)
        pos = 0
        acc = 0
        nbits = 0
        eobrun = 0
        for _ in range(min(per_seg, n_units - done)):
            bi64 = raster[done] << 6
            done += 1
            if ah == 0:
                # ---- AC first pass ----
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    while nbits < 16:
                        acc = (acc << 8) | (data[pos] if pos < n_data else 0)
                        pos += 1
                        nbits += 8
                    peek = (acc >> (nbits - 16)) & 0xFFFF
                    sym = ac_sym[peek]
                    if sym < 0:
                        raise ValueError("invalid JPEG Huffman code")
                    nbits -= ac_len[peek]
                    acc &= (1 << nbits) - 1
                    r = sym >> 4
                    s = sym & 15
                    if s:
                        k += r
                        if k > se:
                            raise ValueError(
                                "progressive AC index out of band"
                            )
                        while nbits < s:
                            acc = (acc << 8) | (
                                data[pos] if pos < n_data else 0
                            )
                            pos += 1
                            nbits += 8
                        nbits -= s
                        v = (acc >> nbits) & ((1 << s) - 1)
                        acc &= (1 << nbits) - 1
                        pos_l.append(bi64 | k)
                        val_l.append(
                            (v if v >= (1 << (s - 1))
                             else v - (1 << s) + 1) << al
                        )
                        k += 1
                    else:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                while nbits < r:
                                    acc = (acc << 8) | (
                                        data[pos] if pos < n_data else 0
                                    )
                                    pos += 1
                                    nbits += 8
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                                acc &= (1 << nbits) - 1
                            eobrun -= 1  # this block is part of the run
                            break
                        k += 16  # ZRL
                continue
            # ---- AC refinement pass (G.1.2.3) ----
            row = zz[raster[done - 1]]
            k = ss
            if eobrun == 0:
                while k <= se:
                    while nbits < 16:
                        acc = (acc << 8) | (data[pos] if pos < n_data else 0)
                        pos += 1
                        nbits += 8
                    peek = (acc >> (nbits - 16)) & 0xFFFF
                    sym = ac_sym[peek]
                    if sym < 0:
                        raise ValueError("invalid JPEG Huffman code")
                    nbits -= ac_len[peek]
                    acc &= (1 << nbits) - 1
                    r = sym >> 4
                    s = sym & 15
                    if s:
                        if nbits < 1:
                            acc = (acc << 8) | (
                                data[pos] if pos < n_data else 0
                            )
                            pos += 1
                            nbits += 8
                        nbits -= 1
                        val = p1 if (acc >> nbits) & 1 else m1
                        acc &= (1 << nbits) - 1
                    else:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                while nbits < r:
                                    acc = (acc << 8) | (
                                        data[pos] if pos < n_data else 0
                                    )
                                    pos += 1
                                    nbits += 8
                                nbits -= r
                                eobrun += (acc >> nbits) & ((1 << r) - 1)
                                acc &= (1 << nbits) - 1
                            break
                        val = 0  # ZRL: skip 16 zero-history coefficients
                    while k <= se:
                        cur = int(row[k])
                        if cur != 0:
                            if nbits < 1:
                                acc = (acc << 8) | (
                                    data[pos] if pos < n_data else 0
                                )
                                pos += 1
                                nbits += 8
                            nbits -= 1
                            bit = (acc >> nbits) & 1
                            acc &= (1 << nbits) - 1
                            if bit and (cur & p1) == 0:
                                row[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            r -= 1
                            if r < 0:
                                break
                        k += 1
                    if val and k <= se:
                        row[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    cur = int(row[k])
                    if cur != 0:
                        if nbits < 1:
                            acc = (acc << 8) | (
                                data[pos] if pos < n_data else 0
                            )
                            pos += 1
                            nbits += 8
                        nbits -= 1
                        bit = (acc >> nbits) & 1
                        acc &= (1 << nbits) - 1
                        if bit and (cur & p1) == 0:
                            row[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1
    if done != n_units:
        raise ValueError(f"progressive AC scan decoded {done}/{n_units}")
    if pos_l:
        zz.reshape(-1)[np.array(pos_l, dtype=np.int64)] = np.array(
            val_l, dtype=np.int32
        )


def jpeg_decode_progressive(buf: bytes) -> np.ndarray:
    """Decode a progressive (SOF2, Huffman) JPEG: grayscale -> (h, w)
    uint8, 3-component YCbCr -> (h, w, 3) uint8 RGB. Accumulates
    coefficients across all scans, then reconstructs exactly like the
    baseline path (shared IDCT / upsampling conventions)."""
    if not isinstance(buf, bytes):
        buf = bytes(buf)  # pyarrow memoryviews are SIGNED
    if bytes(buf[:2]) != SOI:
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    n = len(buf)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    h = w = None
    hmax = vmax = 1
    comps: list[dict] = []
    by_cid: dict[int, dict] = {}
    restart_interval = 0
    while pos + 2 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC9, 0xCB, 0xCD):
            raise NotImplementedError("arithmetic-coded JPEG not supported")
        (length,) = struct.unpack_from(">H", buf, pos + 2)
        data = bytes(buf[pos + 4 : pos + 2 + length])
        nxt = pos + 2 + length
        if marker == 0xDB:  # DQT
            dpos = 0
            while dpos < len(data):
                pq, tq = data[dpos] >> 4, data[dpos] & 0xF
                dpos += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        data[dpos : dpos + 64], dtype=np.uint8
                    ).astype(np.int64)
                    dpos += 64
                else:
                    tbl = np.frombuffer(
                        data[dpos : dpos + 128], dtype=">u2"
                    ).astype(np.int64)
                    dpos += 128
                qtables[tq] = tbl[_UNZIGZAG]
        elif marker == 0xC4:  # DHT (may be redefined between scans)
            dpos = 0
            while dpos < len(data):
                tclass, tid = data[dpos] >> 4, data[dpos] & 0xF
                bits = list(data[dpos + 1 : dpos + 17])
                nv = sum(bits)
                vals = list(data[dpos + 17 : dpos + 17 + nv])
                htables[(tclass, tid)] = _build_decode_table(bits, vals)
                dpos += 17 + nv
        elif marker == 0xC2:  # SOF2
            prec, h, w, ncomp = struct.unpack_from(">BHHB", data, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component progressive JPEG not supported"
                )
            for ci in range(ncomp):
                cid = data[6 + 3 * ci]
                samp = data[7 + 3 * ci]
                comps.append({
                    "cid": cid, "hi": samp >> 4, "vi": samp & 0xF,
                    "tq": data[8 + 3 * ci],
                })
            hmax = max(c["hi"] for c in comps)
            vmax = max(c["vi"] for c in comps)
            mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
            for c in comps:
                hi, vi = c["hi"], c["vi"]
                if hmax % hi or vmax % vi:
                    raise NotImplementedError(
                        f"non-divisible sampling factors {hi}x{vi}"
                    )
                bh_c, bv_c = mcux * hi, mcuy * vi
                c["bh"], c["bv"] = bh_c, bv_c
                c["bpm"] = hi * vi
                c["zz"] = np.zeros((bh_c * bv_c, 64), dtype=np.int32)
                c["mcu_idx"] = _mcu_order(mcuy, mcux, vi, hi).tolist()
                cw = -(-w * hi // hmax)
                ch = -(-h * vi // vmax)
                bwn, bvn = -(-cw // 8), -(-ch // 8)
                c["raster"] = [
                    by * bh_c + bx for by in range(bvn) for bx in range(bwn)
                ]
                by_cid[c["cid"]] = c
            c_mcus = mcux * mcuy
        elif marker in (0xC0, 0xC1, 0xC3):
            raise ValueError("sequential SOF inside progressive decode")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF2")
            ns = data[0]
            scan = []
            for ci in range(ns):
                cid = data[1 + 2 * ci]
                tds = data[2 + 2 * ci]
                scan.append((by_cid[cid], tds >> 4, tds & 0xF))
            ss, se, ahl = data[1 + 2 * ns], data[2 + 2 * ns], data[3 + 2 * ns]
            ah, al = ahl >> 4, ahl & 0xF
            pieces, nxt = _entropy_pieces(buf, pos + 2 + length)
            if ss == 0:
                if se != 0:
                    raise ValueError("progressive scan mixes DC and AC")
                n_units = c_mcus if ns > 1 else len(scan[0][0]["raster"])
                per_seg = restart_interval if restart_interval else n_units
                _decode_dc_scan(
                    pieces, comps, [(c, td) for c, td, _ta in scan],
                    per_seg, n_units, htables, ah, al,
                )
            else:
                if ns != 1:
                    raise ValueError("interleaved AC scan is illegal (B.2.3)")
                c, _td, ta = scan[0]
                n_units = len(c["raster"])
                per_seg = restart_interval if restart_interval else n_units
                _decode_ac_scan(
                    pieces, c, htables[(1, ta)], per_seg, ss, se, ah, al
                )
        pos = nxt

    if h is None or not comps:
        raise ValueError("progressive JPEG missing SOF2/SOS")
    planes = []
    for c in comps:
        q = qtables[c["tq"]].reshape(8, 8).astype(np.float64)
        coef = c["zz"].astype(np.float64)[:, _UNZIGZAG].reshape(-1, 8, 8) * q
        pix = np.einsum("xu,nuv,yv->nxy", _C.T, coef, _C.T) + 128.0
        bv_c, bh_c = c["bv"], c["bh"]
        plane = (
            pix.reshape(bv_c, bh_c, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bv_c * 8, bh_c * 8)
        )
        ch = -(-h * c["vi"] // vmax)
        cw = -(-w * c["hi"] // hmax)
        plane = plane[:ch, :cw]
        if c["vi"] != vmax or c["hi"] != hmax:
            plane = np.repeat(
                np.repeat(plane, vmax // c["vi"], axis=0),
                hmax // c["hi"],
                axis=1,
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ids = [c["cid"] for c in comps]
    if sorted(ids) == [1, 2, 3]:
        by_id = dict(zip(ids, planes))
        return _ycbcr_to_rgb(by_id[1], by_id[2], by_id[3])
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])

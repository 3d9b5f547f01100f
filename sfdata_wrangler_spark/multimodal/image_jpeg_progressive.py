"""Progressive JPEG (SOF2): spectral selection + successive
approximation, per ITU-T T.81 Annex G.

Completes the JPEG surface: the baseline module honestly rejected
SOF2; this one decodes it — multiple scans each carrying a frequency
band (Ss..Se) at a bit-plane precision (Ah/Al), reassembled into the
same quantized-coefficient grid the baseline decoder produces, then
dequantized/IDCT'd by the shared pipeline. The encoder emits a
genuine multi-scan file (DC first pass at Al=1, DC refinement, per-
component AC first passes at Al=1, then AC refinements to Al=0) so
every Annex-G code path — EOBRUN, ZRL-with-history, newly-significant
insertion, correction bits — is exercised by committed-free synthetic
fixtures.

Verification loop (tests/test_image_jpeg_progressive.py): the
progressive file's reassembled coefficients must equal the BASELINE
encoder's quantized coefficients bit-for-bit — an independent path
(single-scan run/size vs multi-scan bit planes), so a mirrored
encode/decode bug in the bit-plane logic cannot cancel out. Pixel
output therefore matches baseline decode exactly, closed-form tiles
included.
"""

from __future__ import annotations

import struct

import numpy as np

from .image_jpeg import (
    DC_BITS,
    DC_VALS,
    QTABLE,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _DC_ENC,
    _M,
    _canonical_codes,
    _decode_table,
    _extend,
    _magnitude,
    _quantize,
)

__all__ = ["encode_progressive_jpeg", "decode_progressive_jpeg"]


def _register_by_value() -> None:
    try:
        import sys as _sys

        import cloudpickle

        cloudpickle.register_pickle_by_value(_sys.modules[__name__])
    except Exception:
        pass


_register_by_value()

# Progressive AC scans need EOBn symbols (r<<4 for r=1..14), which the
# baseline Annex-K table does not define — real progressive encoders
# ship their own DHT, and so does this one: every run/size symbol
# (16 runs x sizes 0..10 = 176) at a uniform 8-bit canonical code
# (176 <= 256, all-ones code unused). The decoder reads whatever DHT
# the FILE declares, so it stays general.
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]
PROG_AC_BITS = [0] * 16
PROG_AC_BITS[7] = len(PROG_AC_VALS)  # all codes length 8
_PROG_AC_ENC = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)


def _quantized_blocks(img: np.ndarray) -> list[list[list[np.ndarray]]]:
    """Per component: [by][bx] int64 8x8 quantized coefficient blocks
    (4:4:4, edge-replicated) — identical arithmetic to the baseline
    encoder."""
    comps = (
        [img]
        if img.ndim == 2
        else [np.ascontiguousarray(img[:, :, c]) for c in range(img.shape[2])]
    )
    h, w = comps[0].shape
    bw, bh = (w + 7) // 8, (h + 7) // 8
    q2d = QTABLE.reshape(8, 8).astype(np.float64)
    out = []
    for comp in comps:
        grid = []
        for by in range(bh):
            row = []
            for bx in range(bw):
                ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
                xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
                block = comp[np.ix_(ys, xs)].astype(np.float64) - 128.0
                row.append(_quantize(_M @ block @ _M.T, q2d))
            grid.append(row)
        out.append(grid)
    return out


def _zz(block: np.ndarray) -> list[int]:
    return [int(block.flat[ZIGZAG[k]]) for k in range(64)]


# ------------------------------------------------------------------ #
# encoder                                                            #
# ------------------------------------------------------------------ #


def _enc_dc_first(wtr: _BitWriter, blocks_zz, order, al: int) -> None:
    pred = [0] * len(blocks_zz)
    for ci, by, bx in order:
        v = blocks_zz[ci][by][bx][0] >> al  # arithmetic shift (T.81 DC)
        diff = v - pred[ci]
        pred[ci] = v
        s, amp = _magnitude(diff)
        code, length = _DC_ENC[s]
        wtr.write(code, length)
        if s:
            wtr.write(amp, s)


def _enc_dc_refine(wtr: _BitWriter, blocks_zz, order, al: int) -> None:
    for ci, by, bx in order:
        wtr.write((blocks_zz[ci][by][bx][0] >> al) & 1, 1)


def _flush_eobrun(wtr: _BitWriter, eobrun: int) -> int:
    if eobrun > 0:
        r = eobrun.bit_length() - 1
        code, length = _PROG_AC_ENC[r << 4]
        wtr.write(code, length)
        if r:
            wtr.write(eobrun - (1 << r), r)
    return 0


def _enc_ac_first(
    wtr: _BitWriter, grid, ss: int, se: int, al: int
) -> None:
    """AC first pass for ONE component (non-interleaved, per G.1.2.2):
    run/size over the band's point-transformed values with EOBRUN."""
    eobrun = 0
    for row in grid:
        for zz in row:  # already zigzag lists
            # sign-preserving magnitude shift (T.81 AC point transform)
            band = []
            for v in zz[ss : se + 1]:
                mag = abs(v) >> al
                band.append(-mag if v < 0 else mag)
            last_nz = max(
                (i for i, v in enumerate(band) if v != 0), default=-1
            )
            if last_nz < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _flush_eobrun(wtr, eobrun)
                continue
            eobrun = _flush_eobrun(wtr, eobrun)
            run = 0
            for i, v in enumerate(band):
                if i > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = _PROG_AC_ENC[0xF0]
                    wtr.write(code, length)
                    run -= 16
                s, amp = _magnitude(v)
                code, length = _PROG_AC_ENC[(run << 4) | s]
                wtr.write(code, length)
                wtr.write(amp, s)
                run = 0
            if last_nz < se - ss:
                eobrun += 1
    _flush_eobrun(wtr, eobrun)


def _enc_ac_refine(
    wtr: _BitWriter, grid, ss: int, se: int, al: int
) -> None:
    """AC refinement for ONE component (G.1.2.3 encoder side): newly
    significant values insert as ±1 with run lengths counted over
    ZERO-HISTORY positions only; already-nonzero positions append
    correction bits."""
    eobrun = 0
    pending_bits: list[int] = []  # correction bits owed to EOB runs

    def flush_eob() -> None:
        nonlocal eobrun, pending_bits
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            code, length = _PROG_AC_ENC[r << 4]
            wtr.write(code, length)
            if r:
                wtr.write(eobrun - (1 << r), r)
            for b in pending_bits:
                wtr.write(b, 1)
            eobrun = 0
            pending_bits = []

    for row in grid:
        for zz in row:  # already zigzag lists
            band = zz[ss : se + 1]
            hist = [(abs(v) >> (al + 1)) != 0 for v in band]  # already sig
            newly = [
                (abs(v) >> al) == 1 for v in band
            ]  # becomes significant this pass
            corr = [(abs(v) >> al) & 1 for v in band]
            last_new = max(
                (i for i, n in enumerate(newly) if n), default=-1
            )
            if last_new < 0:
                # no insertions: whole block joins the EOB run; owed
                # correction bits ride along in scan order
                eobrun += 1
                pending_bits.extend(
                    corr[i] for i in range(len(band)) if hist[i]
                )
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0  # zero-history run
            owed: list[int] = []
            for i, v in enumerate(band):
                if i > last_new:
                    break
                if hist[i]:
                    owed.append(corr[i])
                    continue
                if not newly[i]:
                    run += 1
                    if run == 16:
                        code, length = _PROG_AC_ENC[0xF0]  # ZRL
                        wtr.write(code, length)
                        for b in owed:
                            wtr.write(b, 1)
                        owed = []
                        run = 0
                    continue
                # newly significant: (run, s=1) + sign bit, then owed
                code, length = _PROG_AC_ENC[(run << 4) | 1]
                wtr.write(code, length)
                wtr.write(1 if v > 0 else 0, 1)
                for b in owed:
                    wtr.write(b, 1)
                owed = []
                run = 0
            # trailing history positions after the last insertion join
            # the block's EOB run as pending correction bits
            assert not owed
            eobrun += 1 if last_new < se - ss else 0
            if last_new < se - ss:
                pending_bits.extend(
                    corr[i]
                    for i in range(last_new + 1, len(band))
                    if hist[i]
                )
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_progressive_jpeg(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, 3) uint8 (4:4:4, components verbatim) ->
    progressive JFIF bytes: DC first pass (Al=1) + DC refinement,
    then per component AC 1..63 first pass (Al=1) + refinement."""
    blocks = _quantized_blocks(img)
    nc = len(blocks)
    h, w = (img.shape[0], img.shape[1])
    bh, bw = len(blocks[0]), len(blocks[0][0])
    blocks_zz = [
        [[_zz(blocks[ci][by][bx]) for bx in range(bw)] for by in range(bh)]
        for ci in range(nc)
    ]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    zz_q = bytes(int(QTABLE[ZIGZAG[k]]) for k in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zz_q
    out += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for cid in range(nc):
        out += bytes([cid + 1, 0x11, 0])
    for cls, bits, vals in ((0, DC_BITS, DC_VALS), (1, PROG_AC_BITS, PROG_AC_VALS)):
        payload = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        seg = bytearray()
        seg += struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            seg += bytes([cid + 1, 0x00])
        seg += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + bytes(seg)

    order = [
        (ci, by, bx)
        for by in range(bh)
        for bx in range(bw)
        for ci in range(nc)
    ]

    # scan 1: DC first pass, all components, Al=1
    out += sos(list(range(nc)), 0, 0, 0, 1)
    wtr = _BitWriter()
    _enc_dc_first(wtr, blocks_zz, order, 1)
    wtr.flush()
    out += wtr.out
    # scan 2: DC refinement to Al=0
    out += sos(list(range(nc)), 0, 0, 1, 0)
    wtr = _BitWriter()
    _enc_dc_refine(wtr, blocks_zz, order, 0)
    wtr.flush()
    out += wtr.out
    # per component: AC first pass (Al=1) then refinement (Al=0)
    for ci in range(nc):
        out += sos([ci], 1, 63, 0, 1)
        wtr = _BitWriter()
        _enc_ac_first(wtr, blocks_zz[ci], 1, 63, 1)
        wtr.flush()
        out += wtr.out
    for ci in range(nc):
        out += sos([ci], 1, 63, 1, 0)
        wtr = _BitWriter()
        _enc_ac_refine(wtr, blocks_zz[ci], 1, 63, 0)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------------ #
# decoder                                                            #
# ------------------------------------------------------------------ #


def _parse_progressive(blob: bytes):
    """-> (h, w, comps, qtables, coef) with coef[cid] = (bh, bw, 64)
    reassembled quantized zigzag coefficients."""
    data = bytes(blob)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    h = w = 0
    comps: list[tuple[int, int, int]] = []
    coef: dict[int, np.ndarray] = {}  # cid -> (bh, bw, 64) zz coeffs
    eobrun = 0
    bh = bw = 0

    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while data[pos + 1] == 0xFF:  # fill bytes
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                for k in range(64):
                    t[ZIGZAG[k]] = seg[i + 1 + k]
                qtables[tq] = t
                i += 65
        elif marker == 0xC2:  # SOF2 progressive
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "progressive decode supports 4:4:4 only"
                    )
                comps.append((cid, samp, tq))
            bh, bw = (h + 7) // 8, (w + 7) // 8
            coef = {
                cid: np.zeros((bh, bw, 64), dtype=np.int64)
                for cid, _, _ in comps
            }
        elif marker == 0xC0:
            raise ValueError("baseline SOF0 — use decode_baseline_jpeg")
        elif marker == 0xC4:
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_table(
                    bits, vals
                )
                i += 17 + nv
        elif marker == 0xDD:
            if struct.unpack(">H", seg[:2])[0]:
                raise ValueError(
                    "restart intervals unsupported in progressive decode"
                )
        elif marker == 0xDA:  # one SCAN
            ns = seg[0]
            sel = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel.append((cid, tabs >> 4, tabs & 0xF))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            pos += seglen
            rdr = _BitReader(data, pos)
            eobrun = 0
            if ss == 0:  # DC scan (interleaved over scan comps)
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                pred = {cid: 0 for cid, _, _ in sel}
                for by in range(bh):
                    for bx in range(bw):
                        for cid, d_id, _a in sel:
                            if ah == 0:  # first pass
                                s = rdr.huff(dc_tabs[d_id])
                                diff = _extend(rdr.bits(s), s) if s else 0
                                pred[cid] += diff
                                coef[cid][by, bx, 0] = pred[cid] << al
                            else:  # refinement
                                if rdr.bit():
                                    coef[cid][by, bx, 0] |= 1 << al
            else:  # AC scan: exactly one component
                if ns != 1:
                    raise ValueError("AC scans must be single-component")
                cid, _d, a_id = sel[0]
                tab = ac_tabs[a_id]
                grid = coef[cid]
                p1 = 1 << al
                for by in range(bh):
                    for bx in range(bw):
                        band = grid[by, bx]
                        if ah == 0:  # ---- first pass (G.1.2.2)
                            if eobrun > 0:
                                eobrun -= 1
                                continue
                            k = ss
                            while k <= se:
                                rs = rdr.huff(tab)
                                r, s = rs >> 4, rs & 0xF
                                if s == 0:
                                    if r < 15:
                                        eobrun = (1 << r) - 1
                                        if r:
                                            eobrun += rdr.bits(r)
                                        break
                                    k += 16  # ZRL
                                    continue
                                k += r
                                if k > se:
                                    raise ValueError("AC index overrun")
                                band[k] = _extend(rdr.bits(s), s) << al
                                k += 1
                        else:  # ---- refinement (G.1.2.3)
                            def _refine_one(kk: int) -> None:
                                c = int(band[kk])
                                if c != 0 and rdr.bit():
                                    if (abs(c) & p1) == 0:
                                        band[kk] = c + (p1 if c > 0 else -p1)

                            k = ss
                            if eobrun == 0:
                                while k <= se:
                                    rs = rdr.huff(tab)
                                    r, s = rs >> 4, rs & 0xF
                                    val = 0
                                    if s == 0:
                                        if r < 15:
                                            eobrun = 1 << r
                                            if r:
                                                eobrun += rdr.bits(r)
                                            break
                                        # ZRL: skip 16 zero-history
                                    else:
                                        if s != 1:
                                            raise ValueError(
                                                "refinement size must be 1"
                                            )
                                        val = p1 if rdr.bit() else -p1
                                    while k <= se:
                                        if band[k] != 0:
                                            _refine_one(k)
                                        else:
                                            if r == 0:
                                                break
                                            r -= 1
                                        k += 1
                                    if val and k <= se:
                                        band[k] = val
                                    k += 1
                            if eobrun > 0:
                                while k <= se:
                                    _refine_one(k)
                                    k += 1
                                eobrun -= 1
            # skip to the next marker after the entropy segment
            pos = rdr.pos
            while not (
                data[pos] == 0xFF and data[pos + 1] not in (0x00,)
            ):
                pos += 1
            continue
        pos += seglen

    if not comps:
        raise ValueError("missing SOF2")
    return h, w, comps, qtables, coef


def decode_progressive_jpeg(blob: bytes) -> np.ndarray:
    """Progressive JFIF bytes (4:4:4, 1x1 sampling) -> (h, w) uint8 or
    (h, w, n) uint8 — scans reassembled into the quantized-coefficient
    grid, then the shared dequant/IDCT pixel path."""
    h, w, comps, qtables, coef = _parse_progressive(blob)
    bh, bw = (h + 7) // 8, (w + 7) // 8
    planes = []
    for cid, _, tq in comps:
        q2d = qtables[tq].reshape(8, 8).astype(np.float64)
        full = np.zeros((bh * 8, bw * 8), dtype=np.float64)
        for by in range(bh):
            for bx in range(bw):
                dz = np.zeros((8, 8), dtype=np.int64)
                for kk in range(64):
                    dz.flat[ZIGZAG[kk]] = coef[cid][by, bx, kk]
                deq = dz.astype(np.float64) * q2d
                full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _M.T @ deq @ _M + 128.0
                )
        planes.append(
            np.clip(np.floor(full[:h, :w] + 0.5), 0, 255).astype(np.uint8)
        )
    if len(planes) == 1:
        return planes[0]
    return np.stack(planes, axis=-1)


def decode_progressive_coefficients(blob: bytes):
    """Test hook: cid -> (bh, bw, 64) reassembled quantized zigzag
    coefficients (compared against the BASELINE quantization path —
    an independent route, so mirrored bit-plane bugs can't cancel)."""
    _, _, comps, _, coef = _parse_progressive(blob)
    return {cid: coef[cid] for cid, _, _ in comps}

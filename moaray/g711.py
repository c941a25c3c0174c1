"""G.711 mu-law / A-law and IMA (DVI4) ADPCM — from scratch, vectorized.

These are the three compressed-WAV payloads a real audio corpus actually
contains in volume (telephony captures, old game/voice assets); they unlock
`wav_decode` for RIFF format codes 7 (mu-law), 6 (A-law) and 0x11
(IMA ADPCM). Everything here follows the published ITU-T G.711 segment
companding definition and the public IMA ADPCM algorithm (step/index
tables); the encoders exist so tests and fixtures can synthesize valid
streams — decode(encode(decode(c))) == decode(c) is the exactness anchor
and encode(decode(c)) == c holds for every code point.

mu-law/A-law are pure table lookups at decode (O(1) per sample via a
256-entry table built once at import); IMA ADPCM decodes all blocks in
parallel (numpy across blocks, a fixed-length loop over the samples within
a block — blocks are independent by design, which is also what makes the
format chunkable at corpus scale).

No reference counterpart (moamosaic is raster-only); extends the audio ops
in ops/multimodal.py.
"""

from __future__ import annotations

import numpy as np

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635


def _build_ulaw_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32)
    c = ~codes & 0xFF
    t = (((c & 0x0F) << 3) + _ULAW_BIAS) << ((c >> 4) & 0x07)
    return np.where(c & 0x80, _ULAW_BIAS - t, t - _ULAW_BIAS).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.int32)
    c = codes ^ 0x55
    t = (c & 0x0F) << 4
    seg = (c & 0x70) >> 4
    t = np.where(seg == 0, t + 8,
                 np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(
                     seg - 1, 0)))
    return np.where(c & 0x80, t, -t).astype(np.int16)


ULAW_TABLE = _build_ulaw_table()
ALAW_TABLE = _build_alaw_table()


def ulaw_decode(codes) -> np.ndarray:
    """uint8 code array -> int16 PCM (ITU-T G.711 mu-law expansion)."""
    return ULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes) -> np.ndarray:
    """uint8 code array -> int16 PCM (ITU-T G.711 A-law expansion)."""
    return ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def ulaw_encode(pcm) -> np.ndarray:
    """int16 PCM -> uint8 mu-law codes (segment companding, vectorized)."""
    x = np.asarray(pcm, dtype=np.int32)
    sign = np.where(x < 0, 0x80, 0)
    mag = np.minimum(np.where(x < 0, -x, x), _ULAW_CLIP) + _ULAW_BIAS
    # exponent = position of the top set bit of mag above bit 7 (mag>=132)
    expo = (np.log2(mag).astype(np.int32)) - 7
    expo = np.clip(expo, 0, 7)
    # guard float-log edge cases exactly at powers of two
    too_low = mag >> (expo + 8) > 0
    expo = np.where(too_low, expo + 1, expo)
    too_high = (expo > 0) & (mag >> (expo + 7) == 0)
    expo = np.where(too_high, expo - 1, expo)
    mant = (mag >> (expo + 3)) & 0x0F
    return (~(sign | (expo << 4) | mant) & 0xFF).astype(np.uint8)


_ALAW_SEG_END = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], dtype=np.int32
)


def alaw_encode(pcm) -> np.ndarray:
    """int16 PCM -> uint8 A-law codes (segment companding, vectorized)."""
    x = np.asarray(pcm, dtype=np.int32) >> 3  # 13-bit magnitude domain
    mask = np.where(x >= 0, 0xD5, 0x55)
    mag = np.where(x >= 0, x, -x - 1)
    seg = np.searchsorted(_ALAW_SEG_END, mag)  # first seg with mag <= end
    out_of_range = seg >= 8
    seg = np.minimum(seg, 7)
    aval = seg << 4
    aval = aval | np.where(seg < 2, (mag >> 1) & 0x0F, (mag >> seg) & 0x0F)
    aval = np.where(out_of_range, 0x7F, aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


# ---------------------------------------------------------------------------
# IMA (DVI4) ADPCM — public step/index tables


IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _ima_step(pred, index, nibble):
    """One IMA update step, vectorized over blocks: returns new
    (pred, index). `nibble` is the 4-bit code array."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    diff = diff + np.where(nibble & 1, step >> 2, 0)
    diff = diff + np.where(nibble & 2, step >> 1, 0)
    diff = diff + np.where(nibble & 4, step, 0)
    pred = np.clip(
        np.where(nibble & 8, pred - diff, pred + diff), -32768, 32767
    )
    index = np.clip(index + IMA_INDEX_TABLE[nibble & 7], 0, 88)
    return pred, index


def ima_adpcm_decode(data: bytes, n_channels: int,
                     block_align: int) -> np.ndarray:
    """WAV (fmt 0x11) IMA ADPCM data chunk -> channel-interleaved int16.

    Mono and stereo; stereo nibbles come in per-channel 4-byte word
    groups per the RIFF layout. Blocks decode in parallel (numpy across
    blocks; the in-block loop is the algorithm's sequential dependency).
    """
    if n_channels not in (1, 2):
        raise NotImplementedError(f"IMA ADPCM with {n_channels} channels")
    if block_align < 4 * n_channels + 1:
        raise ValueError(f"IMA ADPCM block_align {block_align} too small")
    raw = np.frombuffer(data, dtype=np.uint8)
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.zeros(0, dtype=np.int16)
    blocks = raw[: nblocks * block_align].reshape(nblocks, block_align)
    spb = (block_align - 4 * n_channels) * 2 // n_channels + 1
    out = np.empty((nblocks, spb, n_channels), dtype=np.int16)
    preds = []
    idxs = []
    for ch in range(n_channels):
        hdr = blocks[:, 4 * ch: 4 * ch + 4]
        pred = (hdr[:, 0].astype(np.int32)
                | (hdr[:, 1].astype(np.int32) << 8))
        pred = np.where(pred >= 0x8000, pred - 0x10000, pred)
        idx = np.clip(hdr[:, 2].astype(np.int32), 0, 88)
        out[:, 0, ch] = pred.astype(np.int16)
        preds.append(pred)
        idxs.append(idx)
    payload = blocks[:, 4 * n_channels:]
    nib = np.empty((nblocks, payload.shape[1] * 2), dtype=np.uint8)
    nib[:, 0::2] = payload & 0x0F
    nib[:, 1::2] = payload >> 4
    if n_channels == 1:
        ch_nibs = [nib]
    else:
        # per-channel 4-byte (8-nibble) word groups, channels alternating
        g = nib.reshape(nblocks, -1, 2, 8)
        ch_nibs = [g[:, :, 0, :].reshape(nblocks, -1),
                   g[:, :, 1, :].reshape(nblocks, -1)]
    for ch in range(n_channels):
        pred, idx = preds[ch], idxs[ch]
        nibs = ch_nibs[ch]
        for k in range(spb - 1):
            pred, idx = _ima_step(pred, idx, nibs[:, k].astype(np.int32))
            out[:, k + 1, ch] = pred.astype(np.int16)
    return out.reshape(-1, n_channels).ravel().astype(np.int16)


def ima_adpcm_encode(pcm: np.ndarray, n_channels: int = 1,
                     samples_per_block: int = 505) -> tuple[bytes, int, int]:
    """Channel-interleaved int16 -> (data_bytes, block_align,
    samples_per_block), the WAV fmt-0x11 layout. Pads the tail block with
    repeated last samples (their decoded values are well-defined)."""
    if n_channels not in (1, 2):
        raise NotImplementedError(f"IMA ADPCM with {n_channels} channels")
    if (samples_per_block - 1) % 8 != 0:
        raise ValueError("samples_per_block must be 1 mod 8")
    x = np.asarray(pcm, dtype=np.int32).reshape(-1, n_channels)
    spb = samples_per_block
    nframes = x.shape[0]
    nblocks = max(1, -(-nframes // spb))
    pad = nblocks * spb - nframes
    if pad:
        tail = x[-1:] if nframes else np.zeros((1, n_channels), np.int32)
        x = np.concatenate([x, np.repeat(tail, pad, axis=0)])
    x = x.reshape(nblocks, spb, n_channels)
    block_align = 4 * n_channels + (spb - 1) * n_channels // 2
    blocks = np.zeros((nblocks, block_align), dtype=np.uint8)
    nib_ch = np.empty((n_channels, nblocks, spb - 1), dtype=np.uint8)
    for ch in range(n_channels):
        pred = x[:, 0, ch].copy()
        idx = np.zeros(nblocks, dtype=np.int32)
        hdr = blocks[:, 4 * ch: 4 * ch + 4]
        u = pred & 0xFFFF
        hdr[:, 0] = u & 0xFF
        hdr[:, 1] = (u >> 8) & 0xFF
        for k in range(spb - 1):
            step = IMA_STEP_TABLE[idx]
            diff = x[:, k + 1, ch] - pred
            nibble = np.where(diff < 0, 8, 0)
            adiff = np.abs(diff)
            b4 = adiff >= step
            adiff = adiff - np.where(b4, step, 0)
            b2 = adiff >= (step >> 1)
            adiff = adiff - np.where(b2, step >> 1, 0)
            b1 = adiff >= (step >> 2)
            nibble = (nibble | np.where(b4, 4, 0) | np.where(b2, 2, 0)
                      | np.where(b1, 1, 0)).astype(np.int32)
            pred, idx = _ima_step(pred, idx, nibble)
            nib_ch[ch, :, k] = nibble.astype(np.uint8)
        # header index byte = the STARTING index (0 here for block starts)
        hdr[:, 2] = 0
        hdr[:, 3] = 0
    if n_channels == 1:
        nib = nib_ch[0]
    else:
        g = np.empty((nblocks, (spb - 1) // 8, 2, 8), dtype=np.uint8)
        g[:, :, 0, :] = nib_ch[0].reshape(nblocks, -1, 8)
        g[:, :, 1, :] = nib_ch[1].reshape(nblocks, -1, 8)
        nib = g.reshape(nblocks, -1)
    payload = blocks[:, 4 * n_channels:]
    payload[:] = (nib[:, 0::2] | (nib[:, 1::2] << 4))
    return blocks.tobytes(), block_align, spb


# ---------------------------------------------------------------------------
# MS ADPCM (WAV format code 2) — public coefficient/adaptation tables


MSADPCM_COEFS = np.array(
    [[256, 0], [512, -256], [0, 0], [192, 64],
     [240, 0], [460, -208], [392, -232]], dtype=np.int64
)
MSADPCM_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614,
     768, 614, 512, 409, 307, 230, 230, 230], dtype=np.int64
)


def _ms_nibble_signed(nib):
    return np.where(nib >= 8, nib.astype(np.int64) - 16,
                    nib.astype(np.int64))


def ms_adpcm_decode(data: bytes, n_channels: int,
                    block_align: int) -> np.ndarray:
    """WAV (fmt 2) MS ADPCM data chunk -> channel-interleaved int16.

    Per-channel block header: predictor index (1 byte), initial delta
    (int16), sample1, sample2 (int16, the two seed samples emitted
    verbatim); nibbles run HIGH-first, alternating channels for stereo.
    Blocks decode in parallel across the block axis.
    """
    if n_channels not in (1, 2):
        raise NotImplementedError(f"MS ADPCM with {n_channels} channels")
    if block_align < 7 * n_channels + 1:
        raise ValueError(f"MS ADPCM block_align {block_align} too small")
    raw = np.frombuffer(data, dtype=np.uint8)
    nblocks = len(raw) // block_align
    if nblocks == 0:
        return np.zeros(0, dtype=np.int16)
    blocks = raw[: nblocks * block_align].reshape(nblocks, block_align)
    ch = n_channels
    spb = (block_align - 7 * ch) * 2 // ch + 2
    hdr = blocks[:, : 7 * ch]

    def i16(lo, hi):
        v = lo.astype(np.int64) | (hi.astype(np.int64) << 8)
        return np.where(v >= 0x8000, v - 0x10000, v)

    pred_idx = [np.minimum(hdr[:, c].astype(np.int64), 6)
                for c in range(ch)]
    delta = [i16(hdr[:, ch + 2 * c], hdr[:, ch + 2 * c + 1])
             for c in range(ch)]
    s1 = [i16(hdr[:, 3 * ch + 2 * c], hdr[:, 3 * ch + 2 * c + 1])
          for c in range(ch)]
    s2 = [i16(hdr[:, 5 * ch + 2 * c], hdr[:, 5 * ch + 2 * c + 1])
          for c in range(ch)]
    out = np.empty((nblocks, spb, ch), dtype=np.int16)
    payload = blocks[:, 7 * ch:]
    nib = np.empty((nblocks, payload.shape[1] * 2), dtype=np.uint8)
    nib[:, 0::2] = payload >> 4      # HIGH nibble first
    nib[:, 1::2] = payload & 0x0F
    for c in range(ch):
        out[:, 0, c] = s2[c].astype(np.int16)  # sample2 is the OLDER seed
        out[:, 1, c] = s1[c].astype(np.int16)
        coef1 = MSADPCM_COEFS[pred_idx[c], 0]
        coef2 = MSADPCM_COEFS[pred_idx[c], 1]
        p1, p2, d = s1[c].copy(), s2[c].copy(), delta[c].copy()
        for k in range(spb - 2):
            code = nib[:, k * ch + c].astype(np.int64)
            signed = _ms_nibble_signed(code)
            # the format's reference divides with C truncation toward
            # zero, not floor — floor is off by one for negative
            # predictions (predictors 1/5/6 with negative coef2) and the
            # error compounds through p1/p2 across the block.
            t = p1 * coef1 + p2 * coef2
            pred = np.sign(t) * (np.abs(t) // 256) + signed * d
            pred = np.clip(pred, -32768, 32767)
            out[:, k + 2, c] = pred.astype(np.int16)
            p2, p1 = p1, pred
            d = np.maximum((MSADPCM_ADAPT[code] * d) // 256, 16)
    return out.reshape(-1, ch).ravel().astype(np.int16)


def ms_adpcm_encode(pcm: np.ndarray, n_channels: int = 1,
                    samples_per_block: int = 500) -> tuple[bytes, int, int]:
    """Channel-interleaved int16 -> (data, block_align, samples_per_block)
    in the WAV fmt-2 layout. Fixed predictor 0 (coef (256, 0) — pure
    first-order prediction) with standard delta adaptation; seeds are the
    first two true samples, initial delta estimated from the block."""
    if n_channels not in (1, 2):
        raise NotImplementedError(f"MS ADPCM with {n_channels} channels")
    if samples_per_block % 2 != 0:
        raise ValueError("samples_per_block must be even")
    ch = n_channels
    x = np.asarray(pcm, dtype=np.int64).reshape(-1, ch)
    spb = samples_per_block
    nframes = x.shape[0]
    nblocks = max(1, -(-nframes // spb))
    pad = nblocks * spb - nframes
    if pad:
        tail = x[-1:] if nframes else np.zeros((1, ch), np.int64)
        x = np.concatenate([x, np.repeat(tail, pad, axis=0)])
    x = x.reshape(nblocks, spb, ch)
    block_align = 7 * ch + (spb - 2) * ch // 2
    blocks = np.zeros((nblocks, block_align), dtype=np.uint8)
    nib = np.zeros((nblocks, (spb - 2) * ch), dtype=np.uint8)
    for c in range(ch):
        s2 = x[:, 0, c].copy()
        s1 = x[:, 1, c].copy()
        # initial delta ~ mean abs first-difference / 4 (clamped)
        dif = np.abs(np.diff(x[:, :, c], axis=1)).mean(axis=1).astype(
            np.int64)
        d = np.clip(dif // 4, 16, 0x7FFF)
        blocks[:, c] = 0  # predictor index 0
        u = d & 0xFFFF
        blocks[:, ch + 2 * c] = u & 0xFF
        blocks[:, ch + 2 * c + 1] = (u >> 8) & 0xFF
        u = s1 & 0xFFFF
        blocks[:, 3 * ch + 2 * c] = u & 0xFF
        blocks[:, 3 * ch + 2 * c + 1] = (u >> 8) & 0xFF
        u = s2 & 0xFFFF
        blocks[:, 5 * ch + 2 * c] = u & 0xFF
        blocks[:, 5 * ch + 2 * c + 1] = (u >> 8) & 0xFF
        p1, p2 = s1.copy(), s2.copy()
        dd = d.copy()
        for k in range(spb - 2):
            pred = (p1 * 256 + p2 * 0) // 256
            err = x[:, k + 2, c] - pred
            code = np.clip((err + (np.where(err < 0, -dd, dd) >> 1))
                           // dd, -8, 7)
            signed = code
            dec = np.clip(pred + signed * dd, -32768, 32767)
            nib[:, k * ch + c] = (signed & 0x0F).astype(np.uint8)
            p2, p1 = p1, dec
            dd = np.maximum(
                (MSADPCM_ADAPT[(signed & 0x0F)] * dd) // 256, 16
            )
    payload = blocks[:, 7 * ch:]
    payload[:] = (nib[:, 0::2] << 4) | nib[:, 1::2]
    return blocks.tobytes(), block_align, spb

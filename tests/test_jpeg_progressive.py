"""Progressive JPEG (SOF2): decode parity against the baseline codec.

A progressive stream carries EXACTLY the same quantized coefficients as a
baseline stream at the same quality — so `jpeg_decode` of our progressive
encoder's output must be bit-equal to `jpeg_decode` of `jpeg_encode`'s
output, for every image/quality/subsampling. That single invariant
exercises every scan type: DC first + refinement (two's-complement bit
semantics), per-band AC first scans with EOB runs (the custom uniform
tables include EOB1..EOB14, unlike Annex K), and AC refinement with ZRL
skips and buffered correction bits (T.81 G.1.2.2-3).
"""

import numpy as np
import pytest

from moaray import codecs
from moaray.jpeg import jpeg_decode, jpeg_encode, jpeg_probe
from moaray.jpeg_progressive import jpeg_encode_progressive


def _parity(img, quality, subsampling="444"):
    kw = {"subsampling": subsampling} if img.ndim == 3 else {}
    base = jpeg_decode(jpeg_encode(img, quality=quality, **kw))
    prog = jpeg_decode(jpeg_encode_progressive(img, quality=quality, **kw))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)
    return prog


@pytest.mark.parametrize("shape", [(16, 16), (17, 29), (64, 64), (33, 31)])
@pytest.mark.parametrize("quality", [50, 90])
def test_gray_progressive_matches_baseline(shape, quality):
    rng = np.random.RandomState(sum(shape) + quality)
    _parity((rng.rand(*shape) * 255).astype(np.uint8), quality)


@pytest.mark.parametrize("sub", ["444", "420"])
@pytest.mark.parametrize("shape", [(16, 16), (17, 29), (40, 24), (31, 33)])
def test_color_progressive_matches_baseline(sub, shape):
    rng = np.random.RandomState(shape[0] * 7 + shape[1])
    img = (rng.rand(*shape, 3) * 255).astype(np.uint8)
    out = _parity(img, 85, sub)
    assert out.ndim == 3 and out.shape[2] == 3


def test_eob_run_heavy_content():
    # smooth ramps and flat fields quantize to long all-zero AC bands ->
    # cross-block EOB runs (EOBn symbols with n > 0)
    rr, cc = np.mgrid[0:48, 0:80]
    smooth = ((rr + cc) // 2 % 256).astype(np.uint8)
    flat = np.full((24, 40), 128, np.uint8)
    for img in (smooth, flat):
        for q in (50, 95):
            _parity(img, q)


def test_refinement_zrl_and_correction_bits():
    # isolated impulses & checkerboard: sparse/maximal high-frequency
    # coefficients stress ZRL-in-refinement and correction-bit buffering
    img = np.zeros((32, 32), np.uint8)
    img[::7, ::7] = 255
    chk = (np.indices((40, 40)).sum(0) % 2 * 255).astype(np.uint8)
    for im in (img, chk):
        for q in (30, 75, 95):
            _parity(im, q)


def test_probe_and_codecs_dispatch():
    rng = np.random.RandomState(3)
    img = (rng.rand(24, 56) * 255).astype(np.uint8)
    buf = jpeg_encode_progressive(img, quality=90)
    assert jpeg_probe(buf) == (24, 56)
    # fmt="jpeg" content-dispatches: progressive streams flow through the
    # same codecs.decode entry the mosaic decode stage uses
    out = codecs.decode(buf, "jpeg")
    assert np.array_equal(out, jpeg_decode(jpeg_encode(img, quality=90)))


def test_progressive_quality_psnr():
    # and the usual lossy gate: q95 progressive decode is >= 40 dB PSNR
    # vs the pristine source (same bar as the baseline codec)
    rr, cc = np.mgrid[0:64, 0:64]
    img = np.clip(rr * 2 + cc, 0, 255).astype(np.uint8)
    out = jpeg_decode(jpeg_encode_progressive(img, quality=95))
    assert codecs.psnr(img.astype(np.float64), out.astype(np.float64),
                       peak=255.0) >= 40.0

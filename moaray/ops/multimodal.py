"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata columns
(w, h, fmt / sample_rate / n_frames); the Ray-side plumbing — actor-pool
stages, schemas, batch sizing — is real and tested. PNG (incl. color +
Adam7), JPEG (baseline + progressive), GIF (stills + animations),
WAV/PCM16, FLAC and the mvid stacked-frame container decode through the
engine's own from-scratch codecs (moaray.codecs / moaray.jpeg / moaray.flac); MP4 containers parse
for real (moaray.mp4 — sample tables to encoded frame ranges) and MP3
frame headers probe for real (moaray.flac.mp3_probe). The only remaining
NotImplementedError gates are codec-payload SYNTHESIS for mp3 samples and
H.264/H.265 frames — those genuinely need pyav/ffmpeg, absent here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .. import codecs

# Motion-JPEG sample-entry / BITMAPINFO fourccs (lowercased): every sample
# is a self-contained baseline JPEG, so the from-scratch moaray/jpeg.py
# decoder handles the payloads for real — no external codec needed.
_MJPEG_CODECS = {"jpeg", "mjpg", "mjpa", "mjpb", "dmb1", "avdj"}


def _check_errors(errors: str) -> str:
    if errors not in ("raise", "skip"):
        raise ValueError(f"errors must be 'raise' or 'skip', got {errors!r}")
    return errors


def _log_skip(stage: str, row_id, exc: Exception) -> None:
    # corrupt rows are a certainty at corpus scale: drop THIS row, keep
    # the job (mirrors MosaicConfig.on_decode_error)
    print(f"moaray {stage}: skipping {row_id!r}: "
          f"{type(exc).__name__}: {exc}")


class ImageFeatures:
    """Actor-pool stage: decode + feature-extract per image.

    Setup (none needed for MRAY codecs, but the LRU and dispatch table are
    per-actor state) happens once in __init__; __call__ handles one batch.
    Emits per-image features: mean/std/nonnull fraction + a 16-bin histogram
    — the shape of a real embedding/featurizer stage.
    """

    def __init__(self, bins: int = 16, errors: str = "raise"):
        self.bins = bins
        self.errors = _check_errors(errors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {
            "image_id": [], "mean": [], "std": [], "nonnull_frac": [],
            "hist": [],
        }
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            buf = batch["bytes"][i].as_py()
            # png/jpeg decode through the from-scratch codecs
            # (codecs.png_decode, jpeg.jpeg_decode).
            try:
                arr = codecs.decode(buf, fmt)
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("image_features", batch["image_id"][i].as_py(), exc)
                continue
            if np.issubdtype(arr.dtype, np.floating):
                valid = arr[~np.isnan(arr)]
                lo = float(valid.min()) if valid.size else 0.0
                hi = float(valid.max()) if valid.size else 1.0
                hist_range = (lo, hi if hi > lo else lo + 1.0)
            else:
                valid = arr[arr != 0]
                hist_range = (0, int(np.iinfo(arr.dtype).max) + 1)
            hist, _ = np.histogram(arr, bins=self.bins, range=hist_range)
            rows["image_id"].append(batch["image_id"][i].as_py())
            rows["mean"].append(round(float(valid.mean()) if valid.size else 0.0, 4))
            rows["std"].append(round(float(valid.std()) if valid.size else 0.0, 4))
            rows["nonnull_frac"].append(
                round(float(valid.size) / arr.size if arr.size else 0.0, 4)
            )
            # histogram as a compact string so downstream consumers (pandas
            # sorts, value hashing) never see an unhashable list cell
            rows["hist"].append(",".join(map(str, hist.tolist())))
        return pa.Table.from_pydict(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "mean": pa.array(rows["mean"], pa.float64()),
                "std": pa.array(rows["std"], pa.float64()),
                "nonnull_frac": pa.array(rows["nonnull_frac"], pa.float64()),
                "hist": pa.array(rows["hist"], pa.string()),
            }
        )


class ComputePhash:
    """Actor-pool stage: pixels -> 64-bit DCT perceptual hash.

    The fingerprint PRODUCER for the catalog's ``phash:int64`` column
    (dedup.phash_neardup_pairs is the consumer): decode, grayscale,
    area-average to 32x32, 2D DCT-II, take the top-left 8x8 minus DC,
    threshold at the median -> 64 bits. Per-actor state is the
    precomputed 32-point DCT basis (built once in __init__)."""

    def __init__(self, errors: str = "raise", dihedral: bool = False):
        self.errors = _check_errors(errors)
        # dihedral=True: hash all 8 flip/rotation orientations of the
        # 32x32 thumbnail and take the MIN — an orientation-invariant
        # fingerprint (rotated/mirrored re-uploads of the same image
        # collide, which plain phash misses)
        self.dihedral = dihedral
        n, k = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
        self.basis = np.cos(np.pi * (2 * n + 1) * k / 64.0)  # [n, k]

    def _hash_small(self, small: np.ndarray) -> int:
        coef = self.basis.T @ small @ self.basis
        low = coef[:8, :8].reshape(-1)[1:]
        bits = low > np.median(low)
        val = 0
        for b in bits:
            val = (val << 1) | int(b)
        return val - (1 << 64) if val >= (1 << 63) else val

    def _one(self, arr: np.ndarray) -> int:
        if arr.ndim == 3:  # luma of color payloads
            arr = (0.299 * arr[..., 0] + 0.587 * arr[..., 1]
                   + 0.114 * arr[..., 2])
        a = arr.astype(np.float64)
        if np.isnan(a).any():
            a = np.nan_to_num(a, nan=0.0)
        h, w = a.shape
        # area-average resample to 32x32 (box means over edge-snapped bins)
        re = np.linspace(0, h, 33).astype(np.int64)
        ce = np.linspace(0, w, 33).astype(np.int64)
        csum = np.zeros((h + 1, w + 1))
        csum[1:, 1:] = a.cumsum(0).cumsum(1)
        blk = (csum[re[1:], :][:, ce[1:]] - csum[re[:-1], :][:, ce[1:]]
               - csum[re[1:], :][:, ce[:-1]] + csum[re[:-1], :][:, ce[:-1]])
        area = np.outer(np.maximum(np.diff(re), 1),
                        np.maximum(np.diff(ce), 1))
        small = blk / area
        if not self.dihedral:
            return self._hash_small(small)
        variants = []
        for k in range(4):
            rot = np.rot90(small, k)
            variants.append(self._hash_small(np.ascontiguousarray(rot)))
            variants.append(
                self._hash_small(np.ascontiguousarray(rot[:, ::-1]))
            )
        return min(variants)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, hashes = [], []
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            buf = batch["bytes"][i].as_py()
            try:
                arr = codecs.decode(buf, fmt)
            except NotImplementedError:
                raise
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("compute_phash", batch["image_id"][i].as_py(), exc)
                continue
            ids.append(batch["image_id"][i].as_py())
            hashes.append(self._one(arr))
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        })


def compute_phash(images_ds, *, concurrency=(1, 8), batch_size: int = 16,
                  errors: str = "raise", dihedral: bool = False):
    """64-bit perceptual hashes for an image catalog (columns image_id /
    bytes / fmt). Output schema matches the input-table contract's phash
    column, so it composes directly with dedup.phash_neardup_pairs.
    ``dihedral=True`` makes the hash flip/rotation-invariant (min over
    the 8 thumbnail orientations)."""
    return images_ds.map_batches(
        ComputePhash,
        fn_constructor_args=(errors, dihedral),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageResize:
    """Actor-pool stage: resize to (out_h, out_w).

    'nearest' (the reference's only overview resampler, mosaic.py:657) is
    an exact strided gather; every other method reuses the mosaic warp
    kernels (stages/reproject.warp_window — a resize IS an affine scale
    warp): bilinear, cubic, cubicspline, lanczos, plus the footprint
    stats (average/rms/mode/min/max/med/q1/q3/sum, downsample semantics).
    No image library needed.
    """

    def __init__(self, out_h: int, out_w: int, method: str = "nearest",
                 errors: str = "raise"):
        from ..stages.reproject import _CONV_KERNELS, _FOOTPRINT_STATS

        ok = {"nearest", "near", "bilinear", *_CONV_KERNELS,
              *_FOOTPRINT_STATS}
        if method not in ok:
            raise ValueError(
                f"unknown resize method {method!r}; one of {sorted(ok)}"
            )
        self.out_h = out_h
        self.out_w = out_w
        self.method = method
        self.errors = _check_errors(errors)

    def _interp(self, arr: np.ndarray) -> np.ndarray:
        """Interpolating resize on a NaN-free float copy: no value ever
        collides with the warp kernels' null sentinel, so interpolation is
        pure (no nearest fallback except at the geometric edge band)."""
        from ..stages.reproject import warp_window

        h, w = arr.shape
        px_map = (0.0, w / self.out_w, 0.0, 0.0, 0.0, h / self.out_h)
        outf = warp_window(
            arr.astype(np.float64), px_map, 0, 0, self.out_h, self.out_w,
            float("nan"), self.method,
        )
        nanm = np.isnan(outf)
        if nanm.any():  # e.g. 'average' upsample: footprint misses every
            # src center — fill from the nearest source pixel
            ri = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
            ci = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
            outf = np.where(nanm, arr[np.ix_(ri, ci)].astype(np.float64), outf)
        if np.issubdtype(arr.dtype, np.integer):
            info = np.iinfo(arr.dtype)
            outf = np.clip(np.rint(outf), info.min, info.max)
        return outf.astype(arr.dtype)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            try:
                arr = codecs.decode(batch["bytes"][i].as_py(), fmt)
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("image_resize", batch["image_id"][i].as_py(), exc)
                continue
            h, w = arr.shape[:2]
            if self.method in ("nearest", "near"):
                ri = (np.arange(self.out_h) * h // self.out_h).clip(0, h - 1)
                ci = (np.arange(self.out_w) * w // self.out_w).clip(0, w - 1)
                small = arr[np.ix_(ri, ci)]  # trailing channels ride along
            elif arr.ndim == 3:  # color: interpolate per plane
                small = np.stack(
                    [self._interp(arr[:, :, c]) for c in range(arr.shape[2])],
                    axis=2,
                )
            else:
                small = self._interp(arr)
            if small.ndim == 3:  # color output: lossless PNG payload
                out_buf, out_fmt = codecs.png_encode(
                    np.ascontiguousarray(small)), "png"
            else:
                out_buf, out_fmt = codecs.encode(
                    np.ascontiguousarray(small), "raw16"), "raw16"
            rows["image_id"].append(batch["image_id"][i].as_py())
            rows["bytes"].append(out_buf)
            rows["w"].append(self.out_w)
            rows["h"].append(self.out_h)
            rows["fmt"].append(out_fmt)
        return pa.Table.from_pydict(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "bytes": pa.array(rows["bytes"], pa.binary()),
                "w": pa.array(rows["w"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
                "fmt": pa.array(rows["fmt"], pa.string()),
            }
        )


class FrameSample:
    """Video frame-sampling stage.

    Real kernel for ``fmt == "mvid"`` — an uncompressed stacked-frame
    container (4-byte LE frame count, then n_frames back-to-back MRAY
    payloads of identical shape): every ``stride``-th frame is sliced out
    ZERO-COPY (raw16 frames are fixed-size, so frame k is a pure offset
    view) and emitted as its own image row. Real container parsing for
    ``fmt == "mp4"`` (moaray/mp4.py, ISO/IEC 14496-12 sample tables) and
    ``fmt == "avi"`` (moaray/avi.py, RIFF movi walk) too: every
    ``stride``-th SAMPLE is sliced out by its byte range. Motion-JPEG
    samples (track codec 'jpeg'/'MJPG'/'mjpa'/'dmb1') then decode FOR REAL
    through the engine's from-scratch baseline JPEG decoder and come out
    as raw16 frame rows like the gif path; any other codec fourcc is
    emitted as an ENCODED frame row (fmt = the codec fourcc, e.g. 'avc1')
    — that payload decode is the honest NotImplementedError gate (H.264
    entropy decode needs pyav/ffmpeg, absent in this sandbox).
    """

    def __init__(self, stride: int = 10, errors: str = "raise",
                 sync_only: bool = False):
        # sync_only: restrict sampling to the container's KEYFRAMES before
        # applying the stride — the only samples an inter-frame codec can
        # decode independently, and the corpus-scale default for sparse
        # sampling (mp4 stss / avi idx1; mvid/gif frames are all sync)
        self.stride = stride
        self.errors = _check_errors(errors)
        self.sync_only = sync_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        rows = {"video_id": [], "frame_idx": [], "bytes": [], "w": [],
                "h": [], "fmt": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            mark = len(rows["video_id"])
            try:
                self._one(batch, i, fmt, rows, struct)
            except NotImplementedError:
                raise  # declared gates are contract errors, not bad data
            except Exception as exc:
                if self.errors != "skip":
                    raise
                for col in rows.values():
                    del col[mark:]
                _log_skip("frame_sample", batch["video_id"][i].as_py(), exc)
        return pa.Table.from_pydict(
            {
                "video_id": pa.array(rows["video_id"], pa.string()),
                "frame_idx": pa.array(rows["frame_idx"], pa.int32()),
                "bytes": pa.array(rows["bytes"], pa.binary()),
                "w": pa.array(rows["w"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
                "fmt": pa.array(rows["fmt"], pa.string()),
            }
        )

    def _sample_idxs(self, n, sync):
        """Sample indices for a sample-table container: every stride-th
        sample, or (sync_only) every stride-th KEYFRAME."""
        if not self.sync_only:
            return range(0, n, self.stride)
        return [k for k in range(n) if sync[k]][:: self.stride]

    def _emit_sample(self, rows, vid, k, payload, codec, w, h):
        """One container sample -> one output row. MJPEG payloads decode
        for real (band 0 as raw16, matching the gif path); other codecs
        pass through encoded with fmt = the codec fourcc."""
        if codec.strip().lower() in _MJPEG_CODECS:
            from ..jpeg import jpeg_decode

            arr = jpeg_decode(payload)
            if arr.ndim == 3:
                arr = arr[:, :, 0]
            rows["bytes"].append(
                codecs.encode(np.ascontiguousarray(arr), "raw16"))
            rows["w"].append(arr.shape[1])
            rows["h"].append(arr.shape[0])
            rows["fmt"].append("raw16")
        else:
            rows["bytes"].append(payload)
            rows["w"].append(w)
            rows["h"].append(h)
            rows["fmt"].append(codec)  # encoded; decode gated
        rows["video_id"].append(vid)
        rows["frame_idx"].append(k)

    def _one(self, batch, i, fmt, rows, struct):
            if fmt == "mp4":
                from ..mp4 import mp4_parse

                buf = memoryview(batch["bytes"][i].as_buffer())
                vid = batch["video_id"][i].as_py()
                track = next(
                    (t for t in mp4_parse(bytes(buf)) if t.handler == "vide"),
                    None,
                )
                if track is None:
                    raise ValueError(f"mp4 {vid!r} has no video track")
                for k in self._sample_idxs(len(track.sizes), track.sync):
                    off, sz = track.offsets[k], track.sizes[k]
                    self._emit_sample(
                        rows, vid, k, bytes(buf[off : off + sz]),
                        track.codec, track.width, track.height,
                    )
                return
            if fmt == "avi":
                from ..avi import avi_parse

                buf = memoryview(batch["bytes"][i].as_buffer())
                vid = batch["video_id"][i].as_py()
                stream = next(
                    (s for s in avi_parse(bytes(buf))
                     if s.fcc_type == "vids"),
                    None,
                )
                if stream is None:
                    raise ValueError(f"avi {vid!r} has no video stream")
                for k in self._sample_idxs(len(stream.sizes), stream.sync):
                    off, sz = stream.offsets[k], stream.sizes[k]
                    self._emit_sample(
                        rows, vid, k, bytes(buf[off : off + sz]),
                        stream.codec, stream.width, stream.height,
                    )
                return
            if fmt == "gif":
                # animated GIFs are short videos: every stride-th frame
                # decodes + composites through moaray/gif.py for real
                from ..gif import gif_frames

                vid = batch["video_id"][i].as_py()
                for k, (frame, _delay) in enumerate(
                    gif_frames(bytes(batch["bytes"][i].as_py()))
                ):
                    if k % self.stride:
                        continue
                    fh, fw = frame.shape[:2]
                    rows["video_id"].append(vid)
                    rows["frame_idx"].append(k)
                    # store band 0 (luma-ish: first channel) as raw16 for
                    # downstream MRAY stages; full RGB callers use gif_frames
                    rows["bytes"].append(
                        codecs.encode(
                            np.ascontiguousarray(frame[:, :, 0]), "raw16"
                        )
                    )
                    rows["w"].append(fw)
                    rows["h"].append(fh)
                    rows["fmt"].append("raw16")
                return
            if fmt != "mvid":
                raise NotImplementedError(
                    f"video container fmt {fmt!r} needs pyav/ffmpeg (absent "
                    "in sandbox); use 'mvid' (decoded frames), 'mp4'/'avi' "
                    "(containers parsed; MJPEG tracks decode for real, "
                    "other codecs come out encoded) or 'gif' "
                    "(decoded+composited frames)"
                )
            buf = memoryview(batch["bytes"][i].as_buffer())
            (n_frames,) = struct.unpack_from("<I", buf, 0)
            body = buf[4:]
            _fmt0, h, w = codecs.probe_header(body)
            # raw16 payloads are dtype-generic — size frames by the actual
            # item size, not a hardcoded 2 bytes/px
            itemsize = codecs.header_dtype(body).itemsize
            frame_bytes = codecs.HEADER_SIZE + h * w * itemsize
            vid = batch["video_id"][i].as_py()
            for k in range(0, n_frames, self.stride):
                frame = bytes(body[k * frame_bytes : (k + 1) * frame_bytes])
                rows["video_id"].append(vid)
                rows["frame_idx"].append(k)
                rows["bytes"].append(frame)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["fmt"].append("raw16")


def frame_sample(videos_ds, stride: int = 10, *, concurrency=(1, 8),
                 batch_size: int = 4, errors: str = "raise",
                 sync_only: bool = False):
    """Dataset-level frame sampling (small batch size: video payloads are
    the widest binary column in the system). ``sync_only`` samples only
    container keyframes — the corpus-scale mode for inter-frame codecs."""
    return videos_ds.map_batches(
        FrameSample,
        fn_constructor_args=(stride, errors, sync_only),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def mvid_encode(frames) -> bytes:
    """Stack 2-D uint16 frames into the mvid container (raw16 payloads)."""
    import struct

    out = [struct.pack("<I", len(frames))]
    for f in frames:
        out.append(codecs.encode(np.ascontiguousarray(f, np.uint16), "raw16"))
    return b"".join(out)


def gen_video_table(n_videos: int = 4, n_frames: int = 30, size: int = 32,
                    seed: int = 42) -> pa.Table:
    """Deterministic synthetic mvid clips (per-frame brightness ramp)."""
    rows = {"video_id": [], "bytes": [], "n_frames": [], "fmt": []}
    for v in range(n_videos):
        frames = [
            np.full((size, size), (v * 1000 + k) % 60000, np.uint16)
            for k in range(n_frames)
        ]
        rows["video_id"].append(f"vid{v:04d}")
        rows["bytes"].append(mvid_encode(frames))
        rows["n_frames"].append(n_frames)
        rows["fmt"].append("mvid")
    return pa.table(
        {
            "video_id": pa.array(rows["video_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "n_frames": pa.array(rows["n_frames"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
        }
    )


def image_features(images_ds, *, concurrency=(1, 8), batch_size: int = 16,
                   errors: str = "raise"):
    return images_ds.map_batches(
        ImageFeatures,
        fn_constructor_args=(16, errors),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def image_resize(images_ds, out_h: int, out_w: int, *, method: str = "nearest",
                 concurrency=(1, 8), batch_size: int = 16,
                 errors: str = "raise"):
    return images_ds.map_batches(
        ImageResize,
        fn_constructor_args=(out_h, out_w, method, errors),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def wav_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE container from scratch — no audio library.

    Handles integer PCM at 8/16/24/32 bits (format code 1), IEEE float
    32/64 (format code 3, incl. the WAVE_FORMAT_EXTENSIBLE wrapper when its
    SubFormat is PCM/float), G.711 A-law / mu-law (codes 6/7) and IMA
    ADPCM (code 0x11) via the from-scratch moaray.g711 codecs; everything
    normalizes to mono int16 (channels averaged) so downstream features
    see one dtype. Other compressed WAV (MPEG, MS-ADPCM, ...) raises."""
    import struct

    from .. import g711

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sr = None
    n_channels = 1
    bits = 16
    fmt_code = 1
    block_align = 0
    fact_frames = None
    data = None
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt_code, n_channels, sr = struct.unpack_from("<HHI", body, 0)
            (block_align,) = struct.unpack_from("<H", body, 12)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt_code == 0xFFFE and size >= 40:  # EXTENSIBLE: SubFormat
                (sub,) = struct.unpack_from("<H", body, 24)
                fmt_code = sub
            if fmt_code not in (1, 2, 3, 6, 7, 0x11):
                raise NotImplementedError(
                    f"compressed WAV (fmt={fmt_code}) needs soundfile/"
                    "ffmpeg; PCM/float/G.711/IMA/MS-ADPCM are supported"
                )
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", body, 0)
        elif cid == b"data":
            data = body
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code == 7:  # G.711 mu-law
        pcm64 = g711.ulaw_decode(np.frombuffer(data, np.uint8)).astype(
            np.float64)
    elif fmt_code == 6:  # G.711 A-law
        pcm64 = g711.alaw_decode(np.frombuffer(data, np.uint8)).astype(
            np.float64)
    elif fmt_code in (2, 0x11):  # MS / IMA ADPCM (fact = true frames)
        decode = (g711.ms_adpcm_decode if fmt_code == 2
                  else g711.ima_adpcm_decode)
        dec = decode(bytes(data), n_channels, block_align)
        if fact_frames is not None:
            dec = dec[: fact_frames * n_channels]
        pcm64 = dec.astype(np.float64)
    elif fmt_code == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"float WAV with bits={bits}")
        pcm64 = np.clip(x, -1.0, 1.0) * 32767.0
    elif bits == 16:
        pcm64 = np.frombuffer(data, dtype="<i2").astype(np.float64)
    elif bits == 8:  # 8-bit WAV is UNSIGNED, midpoint 128
        pcm64 = (np.frombuffer(data, np.uint8).astype(np.float64)
                 - 128.0) * 256.0
    elif bits == 24:  # packed 3-byte little-endian signed
        raw = np.frombuffer(data, np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
        v = (raw[:, 0].astype(np.int64)
             | (raw[:, 1].astype(np.int64) << 8)
             | (raw[:, 2].astype(np.int64) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        pcm64 = v.astype(np.float64) / 256.0  # 24 -> 16 bit range
    elif bits == 32:
        pcm64 = np.frombuffer(data, dtype="<i4").astype(np.float64) / 65536.0
    else:
        raise NotImplementedError(f"PCM WAV with bits={bits}")
    if n_channels > 1:
        pcm64 = pcm64[: len(pcm64) - len(pcm64) % n_channels]
        pcm64 = pcm64.reshape(-1, n_channels).mean(axis=1)
    pcm = np.clip(np.round(pcm64), -32768, 32767).astype(np.int16)
    return pcm, int(sr)


def aiff_decode(buf: bytes) -> tuple[np.ndarray, int]:
    """Parse an AIFF (FORM/AIFF) container from scratch: COMM (channels,
    bit depth, 80-bit extended-float sample rate) + SSND big-endian PCM
    at 8/16/24/32 bits, normalized to mono int16 like wav_decode. AIFC
    compression types other than NONE raise."""
    import struct

    if buf[:4] != b"FORM" or buf[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF stream")
    pos = 12
    sr = None
    n_channels = 1
    bits = 16
    data = None
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from(">I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
        if cid == b"COMM":
            n_channels, _n_frames = struct.unpack_from(">HI", body, 0)
            (bits,) = struct.unpack_from(">H", body, 6)
            # 80-bit IEEE extended: 1 sign + 15 exponent + 64 mantissa
            exp = struct.unpack_from(">H", body, 8)[0] & 0x7FFF
            mant = struct.unpack_from(">Q", body, 10)[0]
            sr = int(round(mant * 2.0 ** (exp - 16383 - 63))) if mant else 0
            if len(body) >= 22:  # AIFC compression type
                ctype = bytes(body[18:22])
                if ctype not in (b"NONE", b"\x00\x00\x00\x00"):
                    raise NotImplementedError(
                        f"compressed AIFC ({ctype!r}) needs ffmpeg"
                    )
        elif cid == b"SSND":
            (off,) = struct.unpack_from(">I", body, 0)
            data = body[8 + off :]
    if sr is None or data is None:
        raise ValueError("AIFF missing COMM/SSND chunk")
    if bits == 16:
        pcm64 = np.frombuffer(data, dtype=">i2").astype(np.float64)
    elif bits == 8:  # AIFF 8-bit is SIGNED (unlike WAV)
        pcm64 = np.frombuffer(data, np.int8).astype(np.float64) * 256.0
    elif bits == 24:
        raw = np.frombuffer(data, np.uint8)
        raw = raw[: len(raw) - len(raw) % 3].reshape(-1, 3)
        v = ((raw[:, 0].astype(np.int64) << 16)
             | (raw[:, 1].astype(np.int64) << 8)
             | raw[:, 2].astype(np.int64))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        pcm64 = v.astype(np.float64) / 256.0
    elif bits == 32:
        pcm64 = np.frombuffer(data, dtype=">i4").astype(np.float64) / 65536.0
    else:
        raise NotImplementedError(f"AIFF with bits={bits}")
    if n_channels > 1:
        pcm64 = pcm64[: len(pcm64) - len(pcm64) % n_channels]
        pcm64 = pcm64.reshape(-1, n_channels).mean(axis=1)
    pcm = np.clip(np.round(pcm64), -32768, 32767).astype(np.int16)
    return pcm, int(sr)


def wav_probe(buf: bytes) -> dict:
    """Header-only RIFF/WAVE census (sample_rate/channels/duration) —
    reads the fmt chunk and the data chunk's SIZE, never its samples;
    the metadata pass must report the container's true channel count,
    not the downmixed shape wav_decode produces."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sr = n_channels = bits = data_size = None
    fmt_code = 1
    block_align = spb = 0
    fact_frames = None
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if cid == b"fmt ":
            fmt_code, n_channels, sr = struct.unpack_from(
                "<HHI", buf, pos + 8
            )
            (block_align,) = struct.unpack_from("<H", buf, pos + 8 + 12)
            (bits,) = struct.unpack_from("<H", buf, pos + 8 + 14)
            if fmt_code == 0xFFFE and size >= 40:
                (fmt_code,) = struct.unpack_from("<H", buf, pos + 8 + 24)
            elif fmt_code in (2, 0x11) and size >= 20:
                # wSamplesPerBlock rides in the fmt extension
                (spb,) = struct.unpack_from("<H", buf, pos + 8 + 18)
        elif cid == b"fact" and size >= 4:
            (fact_frames,) = struct.unpack_from("<I", buf, pos + 8)
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size & 1)
    if sr is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fact_frames is not None:
        frames = fact_frames
    elif fmt_code in (2, 0x11) and block_align:
        if not spb:
            spb = ((block_align - 7 * n_channels) * 2 // n_channels + 2
                   if fmt_code == 2 else
                   (block_align - 4 * n_channels) * 2 // n_channels + 1)
        frames = (data_size // block_align) * spb
    else:
        frames = data_size // (n_channels * max(bits // 8, 1))
    return {
        "sample_rate": int(sr),
        "channels": int(n_channels),
        "bits": int(bits),
        "fmt_code": int(fmt_code),
        "duration_s": round(frames / sr, 4) if sr else 0.0,
    }


def aiff_probe(buf: bytes) -> dict:
    """Header-only AIFF/AIFC census from the COMM chunk (which carries
    channels, bit depth, the 80-bit extended-float sample rate AND the
    exact frame count — no SSND read needed)."""
    import struct

    if buf[:4] != b"FORM" or buf[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF stream")
    pos = 12
    while pos + 8 <= len(buf):
        cid = bytes(buf[pos : pos + 4])
        (size,) = struct.unpack_from(">I", buf, pos + 4)
        if cid == b"COMM":
            n_channels, n_frames = struct.unpack_from(">HI", buf, pos + 8)
            (bits,) = struct.unpack_from(">H", buf, pos + 8 + 6)
            exp = struct.unpack_from(">H", buf, pos + 8 + 8)[0] & 0x7FFF
            mant = struct.unpack_from(">Q", buf, pos + 8 + 10)[0]
            sr = int(round(mant * 2.0 ** (exp - 16383 - 63))) if mant else 0
            return {
                "sample_rate": sr,
                "channels": int(n_channels),
                "bits": int(bits),
                "duration_s": round(n_frames / sr, 4) if sr else 0.0,
            }
        pos += 8 + size + (size & 1)
    raise ValueError("AIFF missing COMM chunk")


def wav_encode(pcm: np.ndarray, sample_rate: int) -> bytes:
    """Mono PCM16 -> RIFF/WAVE bytes (for fixtures and round-trip tests)."""
    import struct

    raw = np.ascontiguousarray(pcm, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_encode_compressed(pcm: np.ndarray, sample_rate: int,
                          codec: str = "ulaw",
                          n_channels: int = 1) -> bytes:
    """Channel-interleaved PCM16 -> RIFF/WAVE with a compressed payload:
    G.711 mu-law ("ulaw", fmt 7), A-law ("alaw", fmt 6) or IMA ADPCM
    ("ima_adpcm", fmt 0x11) — fixture/round-trip producer for the
    compressed paths wav_decode now handles (moaray.g711)."""
    import struct

    from .. import g711

    x = np.ascontiguousarray(pcm, dtype=np.int16)
    nframes = x.size // n_channels
    if codec in ("ulaw", "alaw"):
        enc = g711.ulaw_encode if codec == "ulaw" else g711.alaw_encode
        raw = enc(x).tobytes()
        code = 7 if codec == "ulaw" else 6
        block_align = n_channels
        fmt = struct.pack("<HHIIHH", code, n_channels, sample_rate,
                          sample_rate * n_channels, block_align, 8)
    elif codec == "ima_adpcm":
        raw, block_align, spb = g711.ima_adpcm_encode(x, n_channels)
        avg_bps = sample_rate * block_align // spb
        fmt = struct.pack("<HHIIHHHH", 0x11, n_channels, sample_rate,
                          avg_bps, block_align, 4, 2, spb)
    elif codec == "ms_adpcm":
        raw, block_align, spb = g711.ms_adpcm_encode(x, n_channels)
        avg_bps = sample_rate * block_align // spb
        # fmt extension: cbSize=4, wSamplesPerBlock, wNumCoef would follow
        # in a full header; decoders here key off block_align + fact
        fmt = struct.pack("<HHIIHHHH", 2, n_channels, sample_rate,
                          avg_bps, block_align, 4, 2, spb)
    else:
        raise ValueError(f"unknown codec {codec!r}")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, nframes)
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    if len(raw) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio_row(fmt: str, buf, sample_rate=None):
    """One clip -> (mono int16 pcm, sample_rate) across the supported
    containers (the shared dispatch of the audio feature stages)."""
    if fmt == "wav":
        return wav_decode(buf)
    if fmt == "aiff":
        return aiff_decode(bytes(buf))
    if fmt == "flac":
        from ..flac import flac_decode

        pcm, sr = flac_decode(bytes(buf))
        if pcm.ndim == 2:  # downmix like the wav path
            pcm = pcm.astype(np.int32).mean(axis=1).astype(np.int16)
        return pcm, sr
    if fmt == "pcm16":
        return np.frombuffer(buf, dtype="<i2"), int(sample_rate)
    raise NotImplementedError(
        f"audio fmt {fmt!r} needs soundfile/ffmpeg (absent in sandbox); "
        "use raw 'pcm16', container 'wav'/'aiff', or 'flac'"
    )


class AudioSpectral:
    """Actor-pool stage: per-clip SPECTRAL features — Hann-windowed frame
    FFTs (numpy rfft) averaged into one magnitude spectrum, then spectral
    centroid / 95% rolloff / bandwidth / dominant frequency (Hz) and
    spectral flatness. The Hann window and bin-frequency vectors are
    per-actor state built once in __init__ (the actor-pool contract)."""

    def __init__(self, frame: int = 1024, errors: str = "raise"):
        self.frame = int(frame)
        self.errors = _check_errors(errors)
        self.window = np.hanning(self.frame)

    def _one(self, pcm: np.ndarray, sr: int) -> dict:
        x = pcm.astype(np.float64) / 32768.0
        f = self.frame
        if len(x) < f:
            x = np.pad(x, (0, f - len(x)))
        n_frames = len(x) // f
        frames = x[: n_frames * f].reshape(n_frames, f) * self.window
        mag = np.abs(np.fft.rfft(frames, axis=1)).mean(axis=0)
        freqs = np.fft.rfftfreq(f, 1.0 / sr)
        p = mag / max(mag.sum(), 1e-30)
        centroid = float((freqs * p).sum())
        cum = np.cumsum(p)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.95))])
        bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * p).sum()))
        dominant = float(freqs[int(np.argmax(mag))])
        power = mag ** 2
        flatness = float(
            np.exp(np.mean(np.log(power + 1e-30)))
            / max(np.mean(power), 1e-30)
        )
        return {
            "centroid_hz": round(centroid, 3),
            "rolloff_hz": round(rolloff, 3),
            "bandwidth_hz": round(bandwidth, 3),
            "dominant_hz": round(dominant, 3),
            "flatness": round(flatness, 6),
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = ("centroid_hz", "rolloff_hz", "bandwidth_hz",
                 "dominant_hz", "flatness")
        rows = {"clip_id": []}
        rows.update({n: [] for n in names})
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            sr_meta = (batch["sample_rate"][i].as_py()
                       if "sample_rate" in batch.column_names else None)
            try:
                pcm, sr = decode_audio_row(
                    fmt, batch["bytes"][i].as_py(), sr_meta
                )
            except NotImplementedError:
                raise
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("audio_spectral",
                          batch["clip_id"][i].as_py(), exc)
                continue
            feats = self._one(pcm, sr)
            rows["clip_id"].append(batch["clip_id"][i].as_py())
            for n in names:
                rows[n].append(feats[n])
        return pa.Table.from_pydict({
            "clip_id": pa.array(rows["clip_id"], pa.string()),
            **{n: pa.array(rows[n], pa.float64()) for n in names},
        })


def audio_spectral(clips_ds, *, frame: int = 1024, concurrency=(1, 8),
                   batch_size: int = 32, errors: str = "raise"):
    return clips_ds.map_batches(
        AudioSpectral,
        fn_constructor_args=(frame, errors),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class AudioFeatures:
    """Actor-pool stage: per-clip audio features.

    Real kernels for raw PCM16 payloads (``fmt == "pcm16"``: little-endian
    mono int16; ``sample_rate`` metadata column) AND RIFF/WAVE containers
    (``fmt == "wav"``: sample rate read from the fmt chunk, multi-channel
    downmixed) AND FLAC (``fmt == "flac"``: from-scratch lossless decode,
    moaray/flac.py — FIXED/LPC subframes, rice partitions, stereo
    decorrelation): duration, RMS, peak, zero-crossing rate. Lossy
    compressed audio (mp3) stays gated behind NotImplementedError — the
    sandbox has no codec libraries — but the stage signature, schema and
    batch plumbing are the real thing.
    """

    def __init__(self, errors: str = "raise"):
        self.errors = _check_errors(errors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"clip_id": [], "duration_s": [], "rms": [], "peak": [],
                "zcr": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            try:
                if fmt in ("wav", "flac", "aiff"):
                    if fmt == "wav":
                        pcm, sr = wav_decode(batch["bytes"][i].as_py())
                    elif fmt == "aiff":
                        pcm, sr = aiff_decode(
                            bytes(batch["bytes"][i].as_py())
                        )
                    else:
                        from ..flac import flac_decode

                        pcm, sr = flac_decode(
                            bytes(batch["bytes"][i].as_py())
                        )
                        if pcm.ndim == 2:  # downmix like the wav path
                            pcm = pcm.astype(np.int32).mean(axis=1).astype(
                                np.int16
                            )
            except NotImplementedError:
                # declared codec gates (compressed WAV/AIFC, ...) are
                # contract errors, never "corrupt data" to skip —
                # matches FrameSample._one and AudioMetadata
                raise
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("audio_features", batch["clip_id"][i].as_py(), exc)
                continue
            if fmt in ("wav", "flac", "aiff"):
                pass
            elif fmt == "pcm16":
                sr = int(batch["sample_rate"][i].as_py())
                pcm = np.frombuffer(batch["bytes"][i].as_py(), dtype="<i2")
            else:
                raise NotImplementedError(
                    f"audio fmt {fmt!r} needs soundfile/ffmpeg (absent in "
                    "sandbox); use raw 'pcm16', container 'wav', or 'flac'"
                )
            x = pcm.astype(np.float64) / 32768.0
            zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
            rows["clip_id"].append(batch["clip_id"][i].as_py())
            rows["duration_s"].append(round(len(pcm) / sr, 4))
            rows["rms"].append(round(float(np.sqrt((x ** 2).mean())), 6)
                               if len(x) else 0.0)
            rows["peak"].append(round(float(np.abs(x).max()), 6)
                                if len(x) else 0.0)
            rows["zcr"].append(round(zc / max(len(x) - 1, 1), 6))
        return pa.Table.from_pydict(
            {
                "clip_id": pa.array(rows["clip_id"], pa.string()),
                "duration_s": pa.array(rows["duration_s"], pa.float64()),
                "rms": pa.array(rows["rms"], pa.float64()),
                "peak": pa.array(rows["peak"], pa.float64()),
                "zcr": pa.array(rows["zcr"], pa.float64()),
            }
        )


def audio_features(clips_ds, *, concurrency=(1, 8), batch_size: int = 32,
                   errors: str = "raise"):
    return clips_ds.map_batches(
        AudioFeatures,
        fn_constructor_args=(errors,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def gen_audio_table(n_clips: int = 16, sample_rate: int = 8000,
                    seconds: float = 0.5, seed: int = 42) -> pa.Table:
    """Deterministic synthetic PCM16 clips (pure sine + per-clip frequency)
    for testing the audio plumbing without external data."""
    rows = {"clip_id": [], "bytes": [], "sample_rate": [], "fmt": []}
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    for i in range(n_clips):
        freq = 110.0 * (1 + (i * 7 + seed) % 13)
        x = (0.5 * np.sin(2 * np.pi * freq * t) * 32767).astype("<i2")
        rows["clip_id"].append(f"clip{i:06d}")
        rows["bytes"].append(x.tobytes())
        rows["sample_rate"].append(sample_rate)
        rows["fmt"].append("pcm16")
    return pa.Table.from_pydict(
        {
            "clip_id": pa.array(rows["clip_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
        }
    )


class AudioMetadata:
    """Actor-pool stage: per-clip catalog metadata WITHOUT audio synthesis —
    the census pass a 100 TB corpus runs before deciding what to decode.
    wav: RIFF fmt chunk; flac: STREAMINFO only (moaray.flac.flac_probe);
    mp3: MPEG-1 Layer III frame-header walk (moaray.flac.mp3_probe — the
    one format whose SAMPLES stay behind the declared decode gate);
    pcm16: length arithmetic."""

    def __init__(self, errors: str = "raise"):
        self.errors = _check_errors(errors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..flac import flac_probe, mp3_probe

        rows = {"clip_id": [], "container": [], "sample_rate": [],
                "channels": [], "duration_s": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            buf = batch["bytes"][i].as_py()
            try:
                if fmt in ("wav", "aiff"):
                    # header-only probe: the census must report the
                    # container's true channel count, not the shape of
                    # the downmixed PCM the decode paths produce
                    probe = wav_probe if fmt == "wav" else aiff_probe
                    info = probe(bytes(buf))
                    sr, nch, dur = (info["sample_rate"], info["channels"],
                                    info["duration_s"])
                elif fmt == "flac":
                    info = flac_probe(bytes(buf))
                    sr, nch, dur = (info["sample_rate"], info["channels"],
                                    info["duration_s"])
                elif fmt == "mp3":
                    info = mp3_probe(bytes(buf))
                    sr, nch, dur = (info["sample_rate"], info["channels"],
                                    info["duration_s"])
                elif fmt == "pcm16":
                    sr = int(batch["sample_rate"][i].as_py())
                    nch, dur = 1, round(len(buf) / 2 / sr, 4)
                else:
                    raise NotImplementedError(
                        f"unknown audio container {fmt!r}"
                    )
            except NotImplementedError:
                raise
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("audio_metadata", batch["clip_id"][i].as_py(), exc)
                continue
            rows["clip_id"].append(batch["clip_id"][i].as_py())
            rows["container"].append(fmt)
            rows["sample_rate"].append(sr)
            rows["channels"].append(nch)
            rows["duration_s"].append(dur)
        return pa.Table.from_pydict(
            {
                "clip_id": pa.array(rows["clip_id"], pa.string()),
                "container": pa.array(rows["container"], pa.string()),
                "sample_rate": pa.array(rows["sample_rate"], pa.int32()),
                "channels": pa.array(rows["channels"], pa.int32()),
                "duration_s": pa.array(rows["duration_s"], pa.float64()),
            }
        )


def audio_metadata(clips_ds, *, concurrency=(1, 8), batch_size: int = 64,
                   errors: str = "raise"):
    return clips_ds.map_batches(
        AudioMetadata,
        fn_constructor_args=(errors,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class VideoMetadata:
    """Actor-pool stage: per-video container metadata WITHOUT frame
    synthesis — the census pass before deciding what to decode (the video
    counterpart of AudioMetadata). mp4: ISO-BMFF sample tables
    (moaray/mp4.py); avi: RIFF headers + movi walk (moaray/avi.py);
    gif: block walk skipping the LZW data (moaray.gif.gif_census);
    mvid: header arithmetic. Reports the CONTAINER's truth: actual frame
    count, codec fourcc, fps, duration and keyframe count."""

    def __init__(self, errors: str = "raise"):
        self.errors = _check_errors(errors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct as _struct

        rows = {"video_id": [], "container": [], "codec": [], "width": [],
                "height": [], "n_frames": [], "fps": [], "duration_s": [],
                "n_keyframes": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            try:
                rec = self._probe(batch, i, fmt, _struct)
            except NotImplementedError:
                raise  # declared gates are contract errors, not bad data
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("video_metadata", batch["video_id"][i].as_py(), exc)
                continue
            rows["video_id"].append(batch["video_id"][i].as_py())
            rows["container"].append(fmt)
            for k, v in rec.items():
                rows[k].append(v)
        return pa.Table.from_pydict(
            {
                "video_id": pa.array(rows["video_id"], pa.string()),
                "container": pa.array(rows["container"], pa.string()),
                "codec": pa.array(rows["codec"], pa.string()),
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "n_frames": pa.array(rows["n_frames"], pa.int32()),
                "fps": pa.array(rows["fps"], pa.float64()),
                "duration_s": pa.array(rows["duration_s"], pa.float64()),
                "n_keyframes": pa.array(rows["n_keyframes"], pa.int32()),
            }
        )

    def _probe(self, batch, i, fmt, _struct) -> dict:
        buf = bytes(batch["bytes"][i].as_py())
        if fmt == "mp4":
            from ..mp4 import mp4_parse

            track = next(
                (t for t in mp4_parse(buf) if t.handler == "vide"), None)
            if track is None:
                raise ValueError("mp4 has no video track")
            n = len(track.sizes)
            dur = 0.0
            if n > 1 and track.timescale:
                last_delta = track.timestamps[-1] - track.timestamps[-2]
                dur = (track.timestamps[-1] + last_delta) / track.timescale
            return {
                "codec": track.codec, "width": track.width,
                "height": track.height, "n_frames": n,
                "fps": round(n / dur, 4) if dur else 0.0,
                "duration_s": round(dur, 4),
                "n_keyframes": int(sum(track.sync)),
            }
        if fmt == "avi":
            from ..avi import avi_parse

            stream = next(
                (s for s in avi_parse(buf) if s.fcc_type == "vids"), None)
            if stream is None:
                raise ValueError("avi has no video stream")
            n = len(stream.sizes)
            return {
                "codec": stream.codec, "width": stream.width,
                "height": stream.height, "n_frames": n,
                "fps": round(stream.fps, 4),
                "duration_s": round(n / stream.fps, 4) if stream.fps else 0.0,
                "n_keyframes": int(sum(stream.sync)),
            }
        if fmt == "gif":
            from ..gif import gif_census

            info = gif_census(buf)
            dur = info["duration_s"]
            return {
                "codec": "gif-lzw", "width": info["width"],
                "height": info["height"], "n_frames": info["n_frames"],
                "fps": round(info["n_frames"] / dur, 4) if dur else 0.0,
                "duration_s": dur,
                "n_keyframes": info["n_frames"],  # every GIF frame decodes
            }
        if fmt == "mvid":
            (n_frames,) = _struct.unpack_from("<I", buf, 0)
            _fmt0, h, w = codecs.probe_header(buf[4:])
            return {
                "codec": "mray-raw", "width": int(w), "height": int(h),
                "n_frames": int(n_frames), "fps": 0.0, "duration_s": 0.0,
                "n_keyframes": int(n_frames),
            }
        raise NotImplementedError(f"unknown video container {fmt!r}")


def video_metadata(videos_ds, *, concurrency=(1, 8), batch_size: int = 16,
                   errors: str = "raise"):
    """Container-census pass over a video table (video_id, bytes, fmt) —
    header-only probes, no frame decode; small batch_size because video
    payloads are the widest binary column in the system."""
    return videos_ds.map_batches(
        VideoMetadata,
        fn_constructor_args=(errors,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageExifCensus:
    """Actor-pool stage: EXIF camera metadata per image WITHOUT pixel
    decode (moaray.exif: JPEG marker walk -> APP1 TIFF-IFD parse) — the
    provenance census an image corpus runs before dedup/filtering.
    Non-JPEG rows and JPEGs without APP1 report has_exif=False."""

    _COLS = ("make", "model", "orientation", "datetime",
             "datetime_original", "exposure_s", "f_number", "iso",
             "focal_mm")

    def __init__(self, errors: str = "raise"):
        self.errors = _check_errors(errors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..exif import exif_probe

        rows = {"image_id": [], "has_exif": []}
        rows.update({c: [] for c in self._COLS})
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            try:
                info = ({"has_exif": False} if fmt not in ("jpeg", "jpg")
                        else exif_probe(bytes(batch["bytes"][i].as_py())))
            except NotImplementedError:
                raise
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("image_exif", batch["image_id"][i].as_py(), exc)
                continue
            rows["image_id"].append(batch["image_id"][i].as_py())
            rows["has_exif"].append(bool(info.get("has_exif")))
            for c in self._COLS:
                rows[c].append(info.get(c))
        return pa.Table.from_pydict({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "has_exif": pa.array(rows["has_exif"], pa.bool_()),
            "make": pa.array(rows["make"], pa.string()),
            "model": pa.array(rows["model"], pa.string()),
            "orientation": pa.array(
                [None if v is None else int(v)
                 for v in rows["orientation"]], pa.int32()),
            "datetime": pa.array(rows["datetime"], pa.string()),
            "datetime_original": pa.array(rows["datetime_original"],
                                          pa.string()),
            "exposure_s": pa.array(
                [None if v is None else float(v)
                 for v in rows["exposure_s"]], pa.float64()),
            "f_number": pa.array(
                [None if v is None else float(v)
                 for v in rows["f_number"]], pa.float64()),
            "iso": pa.array(
                [None if v is None else int(v)
                 for v in rows["iso"]], pa.int32()),
            "focal_mm": pa.array(
                [None if v is None else float(v)
                 for v in rows["focal_mm"]], pa.float64()),
        })


def image_exif_census(images_ds, *, concurrency=(1, 8),
                      batch_size: int = 64, errors: str = "raise"):
    return images_ds.map_batches(
        ImageExifCensus,
        fn_constructor_args=(errors,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImageAugment:
    """Actor-pool stage: deterministic per-image augmentation — the
    flip/rotate/crop/brightness pass a vision training pipeline runs.

    ``ops`` is an ordered list applied left to right; supported:
    ("hflip",), ("vflip",), ("rot90", k), ("crop", top, left, h, w),
    ("brightness", delta), ("contrast", factor), ("gamma", g).
    Intensity ops clip to the dtype range (uint8/uint16) and operate in
    float64 internally. Output re-encodes with the input's own codec so
    augmented rows are drop-in catalog rows (same schema).

    Determinism: no RNG here — randomized policies belong to the CALLER
    (derive op parameters from a hash of image_id so reruns and resumes
    produce identical corpora; see the docstring of cap_per_key for the
    same principle)."""

    def __init__(self, ops, errors: str = "raise"):
        self.ops = list(ops)
        self.errors = _check_errors(errors)
        for op in self.ops:
            if op[0] not in ("hflip", "vflip", "rot90", "crop",
                             "brightness", "contrast", "gamma"):
                raise ValueError(f"unknown augment op {op[0]!r}")

    def _apply(self, arr: np.ndarray) -> np.ndarray:
        dtype = arr.dtype
        info = (np.iinfo(dtype) if np.issubdtype(dtype, np.integer)
                else None)
        for op in self.ops:
            kind = op[0]
            if kind == "hflip":
                arr = arr[:, ::-1]
            elif kind == "vflip":
                arr = arr[::-1]
            elif kind == "rot90":
                arr = np.rot90(arr, k=int(op[1]), axes=(0, 1))
            elif kind == "crop":
                top, left, h, w = (int(v) for v in op[1:])
                if (top < 0 or left < 0 or h <= 0 or w <= 0
                        or top + h > arr.shape[0]
                        or left + w > arr.shape[1]):
                    raise ValueError(
                        f"crop {op[1:]} outside image {arr.shape[:2]}"
                    )
                arr = arr[top: top + h, left: left + w]
            else:
                x = arr.astype(np.float64)
                if kind == "brightness":
                    x = x + float(op[1])
                elif kind == "contrast":
                    mid = (info.max + 1) / 2.0 if info else x.mean()
                    x = (x - mid) * float(op[1]) + mid
                else:  # gamma on the normalized range
                    top = float(info.max) if info else max(x.max(), 1e-9)
                    x = ((x / top) ** float(op[1])) * top
                if info:
                    x = np.clip(np.rint(x), info.min, info.max)
                arr = x.astype(dtype)
        return np.ascontiguousarray(arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            try:
                arr = codecs.decode(batch["bytes"][i].as_py(), fmt)
                out = self._apply(arr)
                enc_fmt = fmt if fmt != "jpeg" else "jpeg"
                blob = codecs.encode(out, enc_fmt)
            except NotImplementedError:
                raise
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("image_augment", batch["image_id"][i].as_py(),
                          exc)
                continue
            rows["image_id"].append(batch["image_id"][i].as_py())
            rows["bytes"].append(blob)
            rows["h"].append(out.shape[0])
            rows["w"].append(out.shape[1])
            rows["fmt"].append(enc_fmt)
        return pa.table({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "w": pa.array(rows["w"], pa.int32()),
            "h": pa.array(rows["h"], pa.int32()),
            "fmt": pa.array(rows["fmt"], pa.string()),
        })


def image_augment(images_ds, ops, *, concurrency=(1, 8),
                  batch_size: int = 16, errors: str = "raise"):
    """Augmented catalog rows (same schema) for a list of deterministic
    ops — see ImageAugment."""
    return images_ds.map_batches(
        ImageAugment,
        fn_constructor_args=(ops, errors),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class ImagePatches:
    """Actor-pool stage: fixed-size training patches from encoded images —
    the flat_map a vision corpus runs before sharding (one image row ->
    many patch rows; compose with sinks.wds.write_wds_shards to ship).

    Grid: top-left anchored, ``stride``-stepped, row-major ``patch_id``.
    ``pad="drop"`` keeps only patches fully inside the image;
    ``pad="clamp"`` shifts the last row/column inward so every pixel is
    covered (the standard inference-tiling convention). Patch payloads
    re-encode with the input's own codec, so patch rows are drop-in
    image rows (same schema + patch coords)."""

    def __init__(self, patch_h: int, patch_w: int, stride: int | None = None,
                 pad: str = "drop", errors: str = "raise"):
        if pad not in ("drop", "clamp"):
            raise ValueError(f"pad must be drop|clamp, got {pad!r}")
        self.ph = int(patch_h)
        self.pw = int(patch_w)
        self.stride = int(stride) if stride else self.ph
        self.pad = pad
        self.errors = _check_errors(errors)

    def _anchors(self, size: int, p: int) -> list:
        if size < p:
            return []
        pos = list(range(0, size - p + 1, self.stride))
        if self.pad == "clamp" and pos and pos[-1] != size - p:
            pos.append(size - p)
        return pos

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"image_id": [], "patch_id": [], "py": [], "px": [],
                "bytes": [], "fmt": []}
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            img_id = batch["image_id"][i].as_py()
            try:
                arr = codecs.decode(batch["bytes"][i].as_py(), fmt)
                ys = self._anchors(arr.shape[0], self.ph)
                xs = self._anchors(arr.shape[1], self.pw)
                pid = 0
                for y in ys:
                    for x in xs:
                        patch = np.ascontiguousarray(
                            arr[y:y + self.ph, x:x + self.pw]
                        )
                        rows["image_id"].append(img_id)
                        rows["patch_id"].append(pid)
                        rows["py"].append(y)
                        rows["px"].append(x)
                        rows["bytes"].append(codecs.encode(patch, fmt))
                        rows["fmt"].append(fmt)
                        pid += 1
            except NotImplementedError:
                raise
            except Exception as exc:
                if self.errors != "skip":
                    raise
                _log_skip("image_patches", img_id, exc)
                continue
        return pa.table({
            "image_id": pa.array(rows["image_id"], pa.string()),
            "patch_id": pa.array(rows["patch_id"], pa.int64()),
            "py": pa.array(rows["py"], pa.int32()),
            "px": pa.array(rows["px"], pa.int32()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "h": pa.array([self.ph] * len(rows["px"]), pa.int32()),
            "w": pa.array([self.pw] * len(rows["px"]), pa.int32()),
        })


def image_patches(images_ds, patch_h: int, patch_w: int, *,
                  stride: int | None = None, pad: str = "drop",
                  concurrency=(1, 8), errors: str = "raise"):
    """Fixed-size patch extraction over encoded image rows (see
    ImagePatches). Decode state lives per actor; batches stream."""
    return images_ds.map_batches(
        ImagePatches,
        fn_constructor_args=(patch_h, patch_w, stride, pad, errors),
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )

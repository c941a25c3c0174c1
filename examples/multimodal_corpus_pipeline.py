"""Multimodal training-corpus walkthrough: every payload type the engine
decodes from scratch, in one Ray Data pipeline.

The census-then-process shape a 100 TB corpus run takes: cheap
metadata-only passes first (no pixel/sample synthesis), then decode-heavy
stages only over the rows that survive.

1. IMAGES — a catalog mixing progressive JPEG (SOF2), color PNG and
   Adam7-interlaced PNG payloads runs `image_features` (one actor-pool
   decode pass) and `image_resize` (lanczos, via the mosaic warp kernels).
2. AUDIO — wav/flac/mp3 clips run the `audio_metadata` census WITHOUT
   synthesis (STREAMINFO / MPEG frame headers), then wav+flac rows decode
   through `audio_features`.
3. VIDEO — MP4 containers frame-sample by ISO-BMFF byte range (encoded
   `avc1` samples out; codec synthesis is the one declared gate).

Run: PYTHONPATH=/root/repo python examples/multimodal_corpus_pipeline.py
"""

import numpy as np
import ray

if not ray.is_initialized():
    ray.init(address="local", num_cpus=8, include_dashboard=False)

from moaray import codecs
from moaray.flac import flac_encode
from moaray.jpeg_progressive import jpeg_encode_progressive
from moaray.mp4 import mp4_mux
from moaray.ops.multimodal import (
    audio_features,
    audio_metadata,
    frame_sample,
    image_features,
    image_resize,
    wav_encode,
)

rng = np.random.RandomState(7)

# --- 1. images: progressive JPEG + color PNG + Adam7 PNG -------------------
rows = []
for i in range(12):
    ramp = (np.add.outer(np.arange(48), np.arange(64)) * (i + 1) % 200
            + 20).astype(np.uint8)
    if i % 3 == 0:
        buf, fmt = jpeg_encode_progressive(ramp, quality=90), "jpeg"
    elif i % 3 == 1:
        rgb = np.stack([ramp, ramp // 2, 255 - ramp], axis=2)
        buf, fmt = codecs.png_encode(rgb), "png"
    else:
        buf, fmt = codecs.png_encode(ramp.astype(np.uint16) * 9), "png"
    rows.append({"image_id": f"img{i:03d}", "bytes": buf, "fmt": fmt,
                 "w": 64, "h": 48})
images = ray.data.from_items(rows)
feats = image_features(images).to_pandas()
print(f"image_features over {len(feats)} mixed-codec images "
      f"(mean of means {feats['mean'].mean():.1f})")
thumbs = image_resize(images, 16, 16, method="lanczos").to_pandas()
assert len(thumbs) == 12
print("lanczos thumbnails:", len(thumbs))

# --- 2. audio: metadata census first, features only for decodable rows ----
t = np.arange(16000)
clips = []
for i in range(9):
    x = (np.sin(t / (12 + i)) * 7000).astype(np.int16)
    if i % 3 == 0:
        clips.append({"clip_id": f"c{i}", "fmt": "wav",
                      "bytes": wav_encode(x, 16000), "sample_rate": 16000})
    elif i % 3 == 1:
        clips.append({"clip_id": f"c{i}", "fmt": "flac",
                      "bytes": flac_encode(x, 16000), "sample_rate": 16000})
    else:
        # spec-framed mp3: census-able, synthesis gated
        def _mp3_frame(pad):
            h = ((0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)
                 | (9 << 12) | (0 << 10) | (pad << 9))
            ln = 144 * 128 * 1000 // 44100 + pad
            return h.to_bytes(4, "big") + rng.bytes(ln - 4)
        clips.append({"clip_id": f"c{i}", "fmt": "mp3",
                      "bytes": b"".join(_mp3_frame(k % 2) for k in range(20)),
                      "sample_rate": 0})
audio = ray.data.from_items(clips)
census = audio_metadata(audio).to_pandas()
print("audio census (no synthesis):")
print(census.to_string(index=False))
decodable = audio.filter(lambda r: r["fmt"] in ("wav", "flac"))
af = audio_features(decodable).to_pandas()
print(f"audio_features over the {len(af)} decodable clips")

# --- 3. video: mp4 frame sampling by container byte range -----------------
vids = []
for v in range(3):
    frames = [rng.bytes(int(rng.randint(80, 300))) for _ in range(18)]
    vids.append({"video_id": f"v{v}", "fmt": "mp4",
                 "bytes": mp4_mux(frames, 128, 96, fps=24)})
sampled = frame_sample(ray.data.from_items(vids), stride=6).to_pandas()
assert set(sampled["fmt"]) == {"avc1"}
print(f"mp4 frame samples: {len(sampled)} encoded avc1 frames "
      f"({sampled['w'].iloc[0]}x{sampled['h'].iloc[0]})")

# --- 4. checkpoint: features land in the resumable partitioned sink ----
import shutil
from moaray.sinks.partitioned import read_partitioned, write_partitioned

sink = "/tmp/moaray_mm_features"
shutil.rmtree(sink, ignore_errors=True)
r = write_partitioned(
    image_features(images), sink, key="image_id", n_partitions=8
)
print(f"checkpointed {r['rows']} feature rows into {r['written']} "
      f"partitions (rerun skips committed ones)")
assert len(read_partitioned(sink).to_pandas()) == 12

ray.shutdown()
print("MULTIMODAL CORPUS PIPELINE OK")

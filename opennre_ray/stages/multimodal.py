"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride as ``binary`` columns with sidecar metadata columns;
decode / feature-extract stages are actor-pool ``map_batches`` stages whose
Ray-side plumbing (schema, batch sizing, actor signature, output layout) is
real and tested. Still images now have a REAL in-sandbox decode path
(``imagecodec``: stdlib PNG + PPM — see ``DecodeImage``); video/audio
codecs remain stubbed (``SampleFrames(fake=False)`` raises
``NotImplementedError`` marking exactly where ffmpeg plugs in) since no
container-safe pure-python implementation exists for them.

Scale notes: binary payloads dominate block size — these stages run with
small ``batch_size`` and the payload column is dropped as soon as features
are extracted (same rule as the html column, SURVEY §7.4 item 7).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.schema([
    ("media_id", pa.string()),
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
])


def synthesize_media_batch(batch: pa.Table, payload_from: str = "text",
                           key_from: str = "doc_id") -> pa.Table:
    """Turn any table into a media table (deterministic fake payloads)."""
    keys = batch.column(key_from).to_pylist()
    srcs = batch.column(payload_from).to_pylist()
    payloads = [hashlib.blake2b(str(s).encode(), digest_size=32).digest() * 8
                for s in srcs]
    n = batch.num_rows
    return pa.table({
        "media_id": pa.array([f"m{k}" for k in keys], pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/fake"] * n, pa.string()),
        "width": pa.array([16] * n, pa.int32()),
        "height": pa.array([16] * n, pa.int32()),
    })


class DecodeImage:
    """Actor stage: payload binary → (H, W, 3) uint8 image tensor column.

    ``fake=True`` derives a deterministic pixel block from the payload
    bytes (stable across retries) so synthetic pipelines exercise the
    plumbing end to end. ``fake=False`` runs the REAL stdlib codec
    (``imagecodec.sniff_decode``: PNG 8-bit non-interlaced + PPM P6 via
    zlib/struct — no PIL needed); codecs beyond that (JPEG, 16-bit,
    interlaced) raise ``NotImplementedError`` naming where PIL/turbojpeg
    plugs in. Batches must be dimension-homogeneous (the meta
    width/height columns are the contract; decoded dims are checked
    against them).
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, payload: bytes, w: int, h: int) -> np.ndarray:
        if not self.fake:
            from .imagecodec import sniff_decode
            img = sniff_decode(payload)
            if img.shape[:2] != (h, w):
                raise ValueError(
                    f"decoded dims {img.shape[:2]} != meta ({h}, {w})")
            return img
        raw = np.frombuffer(
            (payload * ((w * h * 3) // max(len(payload), 1) + 1))[: w * h * 3],
            dtype=np.uint8)
        return raw.reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> dict:
        imgs = [self._decode(p, w, h) for p, w, h in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist())]
        return {
            "media_id": batch.column("media_id").to_numpy(zero_copy_only=False),
            "image": np.stack(imgs),          # (B, H, W, 3) tensor column
        }


class ImageFeatures:
    """Actor stage: image tensor → small feature vector (mean/std per channel
    + 8×8 luma histogram). Stands in for a real vision model forward."""

    def __call__(self, batch: dict) -> dict:
        imgs = batch["image"].astype(np.float32)
        mean = imgs.mean(axis=(1, 2))                       # (B, 3)
        std = imgs.std(axis=(1, 2))                         # (B, 3)
        luma = imgs.mean(axis=3)
        hist = np.stack([np.histogram(x, bins=8, range=(0, 255))[0]
                         for x in luma]).astype(np.float32)
        feats = np.concatenate([mean, std, hist], axis=1)
        return {"media_id": batch["media_id"], "features": feats}


class ResizeImage:
    """Actor stage: (B, H, W, 3) → (B, h2, w2, 3) via block-mean pooling.

    Real resampling (bilinear/lanczos) would plug into ``_resize``; the
    numpy block-mean keeps the plumbing deterministic and library-free.
    """

    def __init__(self, out_hw: tuple[int, int] = (8, 8)):
        self.out_hw = out_hw

    def __call__(self, batch: dict) -> dict:
        imgs = batch["image"]
        B, H, W, C = imgs.shape
        h2, w2 = self.out_hw
        fh, fw = H // h2, W // w2
        small = imgs[:, : h2 * fh, : w2 * fw, :].reshape(
            B, h2, fh, w2, fw, C).mean(axis=(2, 4)).astype(np.uint8)
        return {"media_id": batch["media_id"], "image": small}


class DecodeAudio:
    """Actor stage: WAV payload binary → fixed-width feature vector
    column ([rms, zcr, duration] + per-frame RMS — see
    ``audiocodec.audio_features``). The decode is REAL (stdlib RIFF/PCM
    parser); non-PCM codecs raise ``NotImplementedError`` naming the
    ffmpeg plug point. Same placement rules as DecodeImage: small
    batches, payload column dropped at the feature boundary."""

    def __init__(self, n_frames: int = 8):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> dict:
        from .audiocodec import audio_features, decode_wav

        feats = []
        for p in batch.column("payload").to_pylist():
            samples, rate = decode_wav(p)
            feats.append(audio_features(samples, rate,
                                        n_frames=self.n_frames))
        return {
            "media_id": batch.column("media_id").to_numpy(
                zero_copy_only=False),
            "features": np.stack(feats),
        }


class SampleFrames:
    """Actor stage for video-shaped payloads: decode every k-th frame.

    Payload = concatenated fake frames; real ffmpeg seek-decode would plug
    in at ``_frames``. Emits one row per sampled frame with frame_idx —
    the explode pattern for video → frame-level rows.
    """

    def __init__(self, frame_bytes: int = 256, every: int = 4,
                 max_frames: int = 8, fake: bool = True):
        self.frame_bytes = frame_bytes
        self.every = every
        self.max_frames = max_frames
        self.fake = fake

    def _frames(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "no video codec in this environment; plug ffmpeg here")
        n = len(payload) // self.frame_bytes
        idxs = list(range(0, n, self.every))[: self.max_frames]
        return [(i, payload[i * self.frame_bytes: (i + 1) * self.frame_bytes])
                for i in idxs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            for i, fr in self._frames(payload):
                ids.append(mid)
                fidx.append(i)
                frames.append(fr)
        return pa.table({
            "media_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def media_feature_pipeline(ds, batch_size: int = 64):
    """documents-like Dataset → media features, exercising the full plumbing.

    Small batch_size: payload bytes × batch must fit the worker heap.
    """
    media = ds.map_batches(synthesize_media_batch, batch_format="pyarrow")
    decoded = media.map_batches(DecodeImage, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=(1, 4))
    return decoded.map_batches(ImageFeatures, batch_format="numpy",
                               batch_size=batch_size, concurrency=(1, 4))

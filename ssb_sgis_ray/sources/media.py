"""Deterministic synthetic audio/video media columns + decode/feature stages.

The reference treats rasters as lazily-decoded binary payloads with typed
metadata (`/root/reference/src/sgis/raster/raster.py:64-253`); this module
extends that pattern to the other two multimodal payload kinds a
training-data pipeline carries: audio and video. Payloads are opaque
`binary` columns built deterministically from the driver's ``documents``
table (same discipline as :mod:`ssb_sgis_ray.sources.images`), so every
scale factor has a reproducible media corpus with no external data.

Two self-describing raw container formats are implemented for real —
encode, decode, and feature extraction are genuine byte-level work, not
closed-form shortcuts:

* ``RPCM`` — mono 16-bit little-endian PCM: ``b"RPCM" | sample_rate:u32 |
  n_samples:u32 | int16[n]``. The synthesized waveform is a square wave
  (half-period, amplitude keyed off doc_id), so rms/energy/zero-crossing
  counts have integer closed forms the DuckDB oracle recomputes from
  doc_id alone — while the engine computes them from the decoded samples.
* ``RVID`` — grayscale raw frames: ``b"RVID" | w:u16 | h:u16 |
  n_frames:u16 | uint8[n_frames*h*w]``. Frame pixels follow
  ``(x % 16) + base(doc_id, frame)`` so per-frame pixel sums are
  closed-form, again recomputed independently by the oracle.

External codecs (mp3/aac/flac, mp4/h264) are NOT available in this
container; :func:`decode_external` is the clearly-marked stub gate — the
Ray-side plumbing (schema, actor signature, batch sizing, output layout)
is identical for real codecs, only the per-blob decode call changes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from ..pool import default_pool

AUDIO_MAGIC = b"RPCM"
VIDEO_MAGIC = b"RVID"
SAMPLE_RATE = 16000
FRAME_STRIDE = 3  # video frame-sampler default: keep every 3rd frame


# ---------------------------------------------------------------------------
# deterministic synthesis parameters (mirrored by the SQL oracles)
# ---------------------------------------------------------------------------

def audio_params(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(n_samples, half_period, amplitude) per doc — all int64."""
    k = np.asarray(doc_id).astype(np.int64)
    n = 1000 + (k * 13) % 500
    half = 2 + (k * 7) % 5
    amp = 1000 + (k * 37) % 2000
    return n, half, amp


def video_params(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(w, h, n_frames) per doc — all int64; w is a multiple of 16."""
    k = np.asarray(doc_id).astype(np.int64)
    w = 16 * (2 + k % 4)
    h = 8 + (k * 5) % 9
    nf = 8 + k % 9
    return w, h, nf


def render_waveform(n: int, half: int, amp: int) -> np.ndarray:
    """Square wave: +amp while (i // half) is even, -amp while odd."""
    i = np.arange(n, dtype=np.int64)
    sign = 1 - 2 * ((i // half) % 2)
    return (sign * amp).astype(np.int16)


def render_frames(doc_id: int, w: int, h: int, nf: int) -> np.ndarray:
    """(nf, h, w) uint8; frame f pixel (y, x) = (x % 16) + base(doc_id, f)."""
    x = np.arange(w, dtype=np.int64) % 16                    # (w,)
    base = (doc_id * 31 + np.arange(nf, dtype=np.int64) * 17) % 200  # (nf,)
    frames = x[None, None, :] + base[:, None, None]          # (nf, 1, w)
    return np.broadcast_to(frames, (nf, h, w)).astype(np.uint8)


# ---------------------------------------------------------------------------
# codecs (real byte-level encode/decode)
# ---------------------------------------------------------------------------

def encode_audio(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    s = np.ascontiguousarray(samples, dtype="<i2")
    return AUDIO_MAGIC + struct.pack("<II", sample_rate, len(s)) + s.tobytes()


def decode_audio(blob: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, int16 samples). Raises ValueError on a bad header."""
    if blob[:4] != AUDIO_MAGIC or len(blob) < 12:
        raise ValueError("not an RPCM blob")
    sr, n = struct.unpack_from("<II", blob, 4)
    samples = np.frombuffer(blob, dtype="<i2", count=n, offset=12)
    if len(samples) != n:
        raise ValueError("truncated RPCM blob")
    return sr, samples


def encode_video(frames: np.ndarray) -> bytes:
    nf, h, w = frames.shape
    return (
        VIDEO_MAGIC
        + struct.pack("<HHH", w, h, nf)
        + np.ascontiguousarray(frames, dtype=np.uint8).tobytes()
    )


def decode_video(blob: bytes) -> np.ndarray:
    """-> (n_frames, h, w) uint8. Raises ValueError on a bad header."""
    if blob[:4] != VIDEO_MAGIC or len(blob) < 10:
        raise ValueError("not an RVID blob")
    w, h, nf = struct.unpack_from("<HHH", blob, 4)
    pix = np.frombuffer(blob, dtype=np.uint8, count=nf * h * w, offset=10)
    if len(pix) != nf * h * w:
        raise ValueError("truncated RVID blob")
    return pix.reshape(nf, h, w)


def decode_external(fmt: str, blob: bytes):
    """STUB — real-world codec decode (mp3/aac/flac/mp4/h264).

    The decode libraries (soundfile, av) are not installed in this
    container. The surrounding Ray plumbing (actor stages below) is the
    real, tested part; swap this call for the library decode when the
    codec is available.
    """
    try:  # pragma: no cover - import-gated on absent libs
        if fmt in ("wav", "mp3", "flac", "aac"):
            import soundfile  # noqa: F401
        elif fmt in ("mp4", "h264", "webm"):
            import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"external codec {fmt!r} unavailable in this environment"
        ) from None
    raise NotImplementedError(f"external codec {fmt!r} wiring not implemented")


# ---------------------------------------------------------------------------
# Ray actor stages
# ---------------------------------------------------------------------------

class BuildAudio:
    """Actor stage: documents batch -> (doc_id, audio:binary, sr, n_samples)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n, half, amp = audio_params(doc_id)
        blobs = [
            encode_audio(render_waveform(int(n[i]), int(half[i]), int(amp[i])))
            for i in range(len(doc_id))
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "audio": pa.array(blobs, pa.binary()),
            }
        )


class AudioFeatures:
    """Actor stage: decode RPCM bytes -> per-row features, computed from the
    decoded samples (NOT from the synthesis closed form):

    * ``n_samples`` — decoded sample count;
    * ``peak`` — max |sample|;
    * ``energy`` — sum of squared samples (int64-exact);
    * ``crossings`` — strict sign-change count between consecutive samples.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["audio"].to_pylist()
        n_out = np.empty(len(blobs), dtype=np.int64)
        peak = np.empty(len(blobs), dtype=np.int64)
        energy = np.empty(len(blobs), dtype=np.int64)
        crossings = np.empty(len(blobs), dtype=np.int64)
        for i, blob in enumerate(blobs):
            _, s = decode_audio(blob)
            s64 = s.astype(np.int64)
            n_out[i] = len(s64)
            peak[i] = np.abs(s64).max(initial=0)
            energy[i] = int(np.dot(s64, s64))
            crossings[i] = int(np.count_nonzero(np.signbit(s64[1:]) != np.signbit(s64[:-1])))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_samples": pa.array(n_out, pa.int64()),
                "peak": pa.array(peak, pa.int64()),
                "energy": pa.array(energy, pa.int64()),
                "crossings": pa.array(crossings, pa.int64()),
            }
        )


class BuildVideo:
    """Actor stage: documents batch -> (doc_id, video:binary)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        w, h, nf = video_params(doc_id)
        blobs = [
            encode_video(render_frames(int(doc_id[i]), int(w[i]), int(h[i]), int(nf[i])))
            for i in range(len(doc_id))
        ]
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "video": pa.array(blobs, pa.binary()),
            }
        )


class VideoFrameSample:
    """Actor stage (flat-map): decode RVID bytes, keep every ``stride``-th
    frame, emit one row per sampled frame with its exact pixel sum —
    computed from the decoded frame bytes."""

    def __init__(self, stride: int = FRAME_STRIDE):
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch["video"].to_pylist()
        out_doc: list[int] = []
        out_frame: list[int] = []
        out_sum: list[int] = []
        for d, blob in zip(doc_ids, blobs):
            frames = decode_video(blob)
            sampled = frames[:: self.stride]
            sums = sampled.astype(np.int64).sum(axis=(1, 2))
            fnos = np.arange(0, frames.shape[0], self.stride, dtype=np.int64)
            out_doc.extend([int(d)] * len(fnos))
            out_frame.extend(fnos.tolist())
            out_sum.extend(sums.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "frame_no": pa.array(out_frame, pa.int64()),
                "frame_sum": pa.array(out_sum, pa.int64()),
            }
        )


# ---------------------------------------------------------------------------
# dataset builders
# ---------------------------------------------------------------------------

def audio_dataset(sf_dir: str, concurrency=None, batch_size: int = 256):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        BuildAudio, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )


def video_dataset(sf_dir: str, concurrency=None, batch_size: int = 128):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(
        BuildVideo, batch_format="pyarrow", batch_size=batch_size,
        concurrency=default_pool(concurrency),
    )


class VideoSceneCuts:
    """Actor stage: decode RVID bytes and segment each video into scenes
    by frame-difference thresholding — a cut between consecutive frames
    whenever the absolute pixel-sum delta exceeds ``thresh`` x w x h
    (i.e. mean-pixel jump > thresh). The standard shot-boundary pass a
    video curation pipeline runs before frame sampling. A video's frames
    live inside its own row, so the stage needs NO shuffle: one streaming
    actor-pool pass, one row out per video."""

    def __init__(self, thresh: int = 100):
        self.thresh = int(thresh)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch["video"].to_pylist()
        nfs = np.empty(len(blobs), np.int64)
        scenes = np.empty(len(blobs), np.int64)
        for i, blob in enumerate(blobs):
            frames = decode_video(blob)
            nf, h, w = frames.shape
            sums = frames.astype(np.int64).sum(axis=(1, 2))
            cuts = int((np.abs(np.diff(sums)) > self.thresh * w * h).sum())
            nfs[i] = nf
            scenes[i] = 1 + cuts
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_frames": pa.array(nfs, pa.int64()),
            "n_scenes": pa.array(scenes, pa.int64()),
        })


class AudioFingerprint:
    """Actor stage: decode RPCM audio and emit a perceptual fingerprint
    computed purely from the decoded samples — (half, amp_bucket) where
    ``half`` is the first constant-run length of the square wave (pitch)
    and ``amp_bucket = amp // 500`` buckets the amplitude (loudness).
    Clips sharing a fingerprint are near-duplicates (same tone + volume
    class regardless of duration) — the audio analogue of phash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        blobs = batch["audio"].to_pylist()
        halves = np.empty(len(blobs), np.int64)
        ampb = np.empty(len(blobs), np.int64)
        for i, blob in enumerate(blobs):
            _, s = decode_audio(blob)
            s64 = s.astype(np.int64)
            amp = int(s64[0])  # square wave starts at +amp
            flips = np.flatnonzero(s64 != amp)
            halves[i] = int(flips[0]) if len(flips) else len(s64)
            ampb[i] = amp // 500
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "fp_half": pa.array(halves, pa.int64()),
            "fp_ampb": pa.array(ampb, pa.int64()),
        })

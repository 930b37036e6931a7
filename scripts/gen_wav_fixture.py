"""Generate the committed WAV fixtures (tests/fixtures/media/*.wav).

Deterministic PCM from closed-form signals (no RNG), written with the
stdlib ``wave`` module — the decode goldens in tests/test_multimodal.py
and the staged ``audio_wav_features`` oracle literals derive from these
exact bytes. Regen is byte-stable (pinned by test, same posture as
gen_jpeg_fixture.py).

Usage: python scripts/gen_wav_fixture.py  (rewrites tests/fixtures/media)
"""

from __future__ import annotations

import os
import sys
import wave

import numpy as np


def sine16_mono() -> bytes:
    """0.25 s of a 440 Hz sine at 8 kHz, 16-bit mono, amplitude 0.5."""
    t = np.arange(2000, dtype=np.float64) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    return (np.round(x * 32767.0).astype("<i2")).tobytes()


def ramp8_stereo() -> bytes:
    """300 frames of interleaved 8-bit stereo ramps at 11025 Hz."""
    left = (np.arange(300) * 7 % 256).astype(np.uint8)
    right = (np.arange(300) * 13 % 256).astype(np.uint8)
    inter = np.empty(600, dtype=np.uint8)
    inter[0::2] = left
    inter[1::2] = right
    return inter.tobytes()


def main() -> None:
    media = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "fixtures", "media")
    os.makedirs(media, exist_ok=True)

    with wave.open(os.path.join(media, "sine440.wav"), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(sine16_mono())

    with wave.open(os.path.join(media, "ramp_stereo.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)
        w.setframerate(11025)
        w.writeframes(ramp8_stereo())

    print("wrote sine440.wav, ramp_stereo.wav")


if __name__ == "__main__":
    sys.exit(main())

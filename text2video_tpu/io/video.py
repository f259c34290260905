"""Frame/audio muxing: frames -> video file with a synchronized track.

Replaces the reference's L7 muxer (reference:
*phoneme_data/VidTIMIT/fadg0/image2video_real.py — cv2.VideoWriter MP4V at
fps=25, then moviepy/ffmpeg re-mux with audio). This environment has no
ffmpeg binary, so audio muxing is self-contained:

  * :func:`write_video` — cv2 VideoWriter (mp4, video-only), byte-parity
    with the reference's first stage.
  * :func:`write_avi_with_audio` — a from-scratch RIFF/AVI muxer
    interleaving MJPEG frames (cv2 JPEG encode) with 16-bit PCM audio.
    Plays in ffmpeg/VLC/browsers; no external tools.
  * :func:`mux` — writes mp4+wav and, when audio is given, the AVI; uses
    the ffmpeg binary instead when one is on PATH.
"""

from __future__ import annotations

import shutil
import struct
import subprocess
from typing import List, Optional

import cv2
import numpy as np

from text2video_tpu.frontend.audio import save_wav


def write_video(
    frames: np.ndarray, path: str, fps: float = 25.0
) -> None:
    """frames: [T, H, W, 3] uint8 RGB -> .mp4 (no audio)."""
    t, h, w, _ = frames.shape
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise RuntimeError(f"cannot open VideoWriter for {path}")
    for i in range(t):
        writer.write(cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR))
    writer.release()


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def write_avi_with_audio(
    frames: np.ndarray,
    audio: Optional[np.ndarray],
    path: str,
    fps: float = 25.0,
    sample_rate: int = 16000,
    jpeg_quality: int = 95,
) -> None:
    """Mux [T,H,W,3] uint8 RGB frames + mono float PCM into an AVI.

    MJPEG video stream '00dc' interleaved with 16-bit PCM chunks '01wb',
    one audio slice per frame, plus an idx1 index.
    """
    t, h, w, _ = frames.shape
    has_audio = audio is not None and len(audio) > 0
    if has_audio:
        pcm = (np.clip(audio, -1, 1) * 32767.0).astype("<i2")
        total_needed = int(round(t / fps * sample_rate))
        if len(pcm) < total_needed:
            pcm = np.concatenate(
                [pcm, np.zeros(total_needed - len(pcm), "<i2")]
            )

    jpegs: List[bytes] = []
    for i in range(t):
        ok, buf = cv2.imencode(
            ".jpg",
            cv2.cvtColor(frames[i], cv2.COLOR_RGB2BGR),
            [cv2.IMWRITE_JPEG_QUALITY, jpeg_quality],
        )
        if not ok:
            raise RuntimeError(f"JPEG encode failed at frame {i}")
        jpegs.append(bytes(buf))

    # movi payload + idx1 entries (offsets relative to 'movi' fourcc).
    movi = b"movi"
    idx = b""
    audio_pos = 0
    for i in range(t):
        off = len(movi)
        data = _chunk(b"00dc", jpegs[i])
        movi += data
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(jpegs[i]))
        if has_audio:
            end = int(round((i + 1) / fps * sample_rate))
            sl = pcm[audio_pos:end].tobytes()
            audio_pos = end
            off = len(movi)
            movi += _chunk(b"01wb", sl)
            idx += b"01wb" + struct.pack("<III", 0x10, off, len(sl))

    max_jpeg = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        int(1_000_000 / fps),      # microseconds per frame
        int(max_jpeg * fps),       # max bytes/sec (approx)
        0,                         # padding granularity
        0x110,                     # HASINDEX | ISINTERLEAVED
        t,                         # total frames
        0,                         # initial frames
        2 if has_audio else 1,     # streams
        max_jpeg,                  # suggested buffer
        w, h, 0, 0, 0, 0,
    )
    strh_v = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1000, int(fps * 1000),     # scale, rate
        0, t, max_jpeg, 10000, 0,
        0, 0, np.uint16(w), np.uint16(h),
    )
    strf_v = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    strl_v = _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))

    hdrl_payload = _chunk(b"avih", avih) + strl_v
    if has_audio:
        block_align = 2  # mono 16-bit
        strh_a = struct.pack(
            "<4s4sIHHIIIIIIII4H",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, sample_rate,        # scale, rate -> samples/sec
            0, len(pcm), sample_rate * block_align, 0xFFFFFFFF,
            block_align, 0, 0, 0, 0,
        )
        strf_a = struct.pack(
            "<HHIIHH",
            1,                     # WAVE_FORMAT_PCM
            1,                     # channels
            sample_rate,
            sample_rate * block_align,
            block_align,
            16,                    # bits/sample
        )
        hdrl_payload += _list(
            b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a)
        )

    body = (
        _list(b"hdrl", hdrl_payload)
        + _list(b"movi", movi[4:])
        + _chunk(b"idx1", idx)
    )
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body)


def _ffmpeg() -> Optional[str]:
    return shutil.which("ffmpeg")


def mux(
    frames: np.ndarray,
    audio: Optional[np.ndarray],
    out_base: str,
    fps: float = 25.0,
    sample_rate: int = 16000,
) -> List[str]:
    """Write all applicable containers for ``out_base`` (no extension).

    Returns the list of files written: always ``.mp4`` (video-only via
    cv2, as the reference's first muxing stage); with audio, either an
    ffmpeg-muxed ``.mp4`` replacing it (when ffmpeg exists) or ``.avi``
    (self-contained mux) + ``.wav``.
    """
    written: List[str] = []
    mp4 = out_base + ".mp4"
    write_video(frames, mp4, fps)
    written.append(mp4)
    if audio is None or len(audio) == 0:
        return written
    wav = out_base + ".wav"
    save_wav(wav, audio, sample_rate)
    written.append(wav)
    ff = _ffmpeg()
    if ff is not None:
        muxed = out_base + "_audio.mp4"
        subprocess.run(
            [ff, "-y", "-i", mp4, "-i", wav, "-c:v", "copy", "-c:a", "aac",
             muxed],
            check=True,
            capture_output=True,
        )
        written.append(muxed)
    else:
        avi = out_base + ".avi"
        write_avi_with_audio(
            frames, audio, avi, fps=fps, sample_rate=sample_rate
        )
        written.append(avi)
    return written

"""TTS frontends: text -> waveform.

Replaces the reference's Baidu-TTS HTTP client (reference: tts_request.py —
POST to tts.baidu.com/text2audio with per-person/gender voice ids, mp3
download, pydub mp3->wav). Backends:

  * :class:`HttpTTS` — same wire contract (voice id table comes from the
    PersonProfile, mirroring tts_request.py:29-41). Requires network
    egress; raises a clear error without it.
  * :class:`FormantTTS` — self-contained fallback: a tiny rule-driven
    formant synthesizer producing an intelligible-timing (not
    natural-sounding) waveform so the full pipeline runs hermetically.
    Phone durations/voicing drive the pose timing downstream, which is
    what the video path actually consumes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Protocol

import numpy as np

from text2video_tpu.config import PersonProfile
from text2video_tpu.frontend import native
from text2video_tpu.frontend.align_english import (
    PronouncingDict,
    strip_stress,
    transcript_words,
)


class TTSBackend(Protocol):
    def synthesize(self, text: str, sample_rate: int) -> np.ndarray: ...


class HttpTTS:
    """HTTP TTS client with the reference's voice-selection contract."""

    URL = "http://tts.baidu.com/text2audio"

    def __init__(self, profile: PersonProfile, sex: str = "f"):
        self.voice = profile.voice(sex)
        self.language = profile.language

    def synthesize(self, text: str, sample_rate: int) -> np.ndarray:
        try:
            import requests  # noqa: PLC0415
        except ImportError as e:
            raise RuntimeError("requests not available") from e
        params = {
            "tex": text,
            "lan": "zh" if self.language == "zh" else "en",
            "per": self.voice,
            "cuid": "text2video-tpu",
            "ctp": 1,
            "ie": "UTF-8",
            # Request wav (aue=6) instead of the reference's mp3 — no
            # decoder dependency (the reference needed pydub/ffmpeg,
            # tts_request.py:54-55).
            "aue": 6,
        }
        resp = requests.post(self.URL, data=params, timeout=30)
        resp.raise_for_status()
        if resp.headers.get("Content-Type", "").startswith("audio"):
            import io  # noqa: PLC0415

            from text2video_tpu.frontend.audio import (  # noqa: PLC0415
                resample,
            )
            from scipy.io import wavfile  # noqa: PLC0415

            sr, data = wavfile.read(io.BytesIO(resp.content))
            if data.ndim == 2:
                data = data.mean(axis=1)
            samples = data.astype(np.float32)
            if data.dtype == np.int16:
                samples /= 32768.0
            return resample(samples, int(sr), sample_rate)
        raise RuntimeError(f"TTS error response: {resp.text[:200]}")


# ---- self-contained formant synthesizer ----------------------------------

# (f1, f2) formant pairs for vowels; consonants get noise/plosive handling.
_VOWEL_FORMANTS = {
    "AA": (730, 1090), "AE": (660, 1720), "AH": (640, 1190),
    "AO": (570, 840), "AW": (700, 1200), "AY": (660, 1400),
    "EH": (530, 1840), "ER": (490, 1350), "EY": (480, 1900),
    "IH": (390, 1990), "IY": (270, 2290), "OW": (450, 900),
    "OY": (500, 1100), "UH": (440, 1020), "UW": (300, 870),
}
_FRICATIVES = {"S", "SH", "F", "TH", "HH", "Z", "ZH", "V", "DH", "CH", "JH"}
_PLOSIVES = {"P", "T", "K", "B", "D", "G"}
_NASALS_LIQUIDS = {"M", "N", "NG", "L", "R", "W", "Y"}

_DUR = {"vowel": 0.14, "fricative": 0.09, "plosive": 0.06, "other": 0.08}

# Mandarin initial/final units -> the synthesizer's ARPABET-ish classes
# (frontend/align_mandarin.py decomposition). Finals become vowel(+coda)
# formant sequences; initials map onto the closest consonant class.
_ZH_INITIAL_PHONES = {
    "b": ["B"], "p": ["P"], "m": ["M"], "f": ["F"], "d": ["D"],
    "t": ["T"], "n": ["N"], "l": ["L"], "g": ["G"], "k": ["K"],
    "h": ["HH"], "j": ["JH"], "q": ["CH"], "x": ["SH"], "zh": ["JH"],
    "ch": ["CH"], "sh": ["SH"], "r": ["ZH"], "z": ["D", "Z"],
    "c": ["T", "S"],
}
_ZH_FINAL_PHONES = {
    "a": ["AA"], "o": ["AO"], "e": ["AH"], "i": ["IY"], "u": ["UW"],
    "v": ["UW"], "ih": ["ER"], "ai": ["AY"], "ei": ["EY"], "ao": ["AW"],
    "ou": ["OW"], "an": ["AA", "N"], "en": ["AH", "N"],
    "ang": ["AA", "NG"], "eng": ["AH", "NG"], "ong": ["UH", "NG"],
    "er": ["ER"], "ia": ["IY", "AA"], "ie": ["IY", "EH"],
    "iao": ["IY", "AW"], "iou": ["IY", "OW"], "ian": ["IY", "EH", "N"],
    "in": ["IH", "N"], "iang": ["IY", "AA", "NG"], "ing": ["IH", "NG"],
    "iong": ["IY", "UH", "NG"], "ua": ["UW", "AA"], "uo": ["UW", "AO"],
    "uai": ["UW", "AY"], "uei": ["UW", "EY"], "uan": ["UW", "AA", "N"],
    "uen": ["UW", "AH", "N"], "uang": ["UW", "AA", "NG"],
    "ueng": ["UW", "AH", "NG"], "ve": ["UW", "EH"],
    "van": ["UW", "AE", "N"], "vn": ["UW", "N"],
}


@dataclasses.dataclass
class FormantTTS:
    """Rule-based formant synthesis from dictionary pronunciations."""

    pdict: Optional[PronouncingDict] = None
    f0: float = 120.0
    pause_s: float = 0.12

    def _phones(self, word: str) -> List[str]:
        if self.pdict is not None:
            return [strip_stress(p) for p in self.pdict.lookup(word)]
        return native.g2p(word)

    def synthesize(self, text: str, sample_rate: int) -> np.ndarray:
        rng = np.random.RandomState(0)
        chunks: List[np.ndarray] = [np.zeros(int(0.1 * sample_rate), np.float32)]
        words = transcript_words(text)
        pause_s = self.pause_s
        if words:
            units = [self._phones(w) for w in words]
        else:
            # Chinese text: per-syllable initial/final formant synthesis
            # (frontend/align_mandarin decomposition), short inter-
            # syllable gaps — articulated per syllable, not one generic
            # vowel for everything.
            from text2video_tpu.frontend.align_mandarin import (  # noqa: PLC0415
                expand_walk_stream,
                pinyin_to_phones,
            )

            units = []
            for tok in expand_walk_stream(text):
                parts = pinyin_to_phones(tok)
                if parts is None:
                    units.append(["AH"])
                    continue
                phones: List[str] = []
                for p in parts:
                    phones.extend(
                        _ZH_INITIAL_PHONES.get(p)
                        or _ZH_FINAL_PHONES.get(p, ["AH"])
                    )
                units.append(phones)
            pause_s = 0.04
        for phones in units:
            for ph in phones:
                chunks.append(self._phone_wave(ph, sample_rate, rng))
            chunks.append(
                np.zeros(int(pause_s * sample_rate), np.float32)
            )
        chunks.append(np.zeros(int(0.1 * sample_rate), np.float32))
        wave = np.concatenate(chunks)
        peak = np.abs(wave).max()
        return (wave / peak * 0.7).astype(np.float32) if peak > 0 else wave

    def _phone_wave(
        self, ph: str, sr: int, rng: np.random.RandomState
    ) -> np.ndarray:
        if ph in _VOWEL_FORMANTS:
            dur = _DUR["vowel"]
            n = int(dur * sr)
            t = np.arange(n) / sr
            f1, f2 = _VOWEL_FORMANTS[ph]
            # Glottal-ish source: harmonics at f0 shaped by two formants.
            wave = (
                0.6 * np.sin(2 * np.pi * f1 * t)
                + 0.4 * np.sin(2 * np.pi * f2 * t)
            ) * (0.5 + 0.5 * np.sign(np.sin(2 * np.pi * self.f0 * t)))
        elif ph in _FRICATIVES:
            n = int(_DUR["fricative"] * sr)
            wave = rng.randn(n).astype(np.float32) * 0.3
        elif ph in _PLOSIVES:
            n = int(_DUR["plosive"] * sr)
            wave = np.zeros(n, np.float32)
            burst = max(n // 4, 1)
            wave[:burst] = rng.randn(burst) * 0.5
        else:
            dur = _DUR["other"]
            n = int(dur * sr)
            t = np.arange(n) / sr
            wave = 0.4 * np.sin(2 * np.pi * 250 * t) * np.sin(
                2 * np.pi * self.f0 * t
            )
        # 5 ms raised-cosine edges to avoid clicks.
        edge = min(int(0.005 * sr), len(wave) // 2)
        if edge > 0:
            env = 0.5 * (1 - np.cos(np.pi * np.arange(edge) / edge))
            wave[:edge] *= env
            wave[-edge:] *= env[::-1]
        return wave.astype(np.float32)

"""Mandarin forced-alignment tests: pinyin decomposition, walk-stream
expansion, and golden-timing tolerance against the reference's
vosk-produced timestamp files (reference: input_timestamp/henan/*.txt)."""

import glob
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_DIR, requires_reference_data
from text2video_tpu.frontend.align_mandarin import (
    FINALS,
    INITIALS,
    MANDARIN_PHONES,
    expand_walk_stream,
    pinyin_to_phones,
    train_mandarin_model,
    MandarinAligner,
)


def test_pinyin_decomposition_basics():
    assert pinyin_to_phones("zhong") == ["zh", "ong"]
    assert pinyin_to_phones("wen") == ["uen"]
    assert pinyin_to_phones("yi") == ["i"]
    assert pinyin_to_phones("er") == ["er"]
    assert pinyin_to_phones("jiu") == ["j", "iou"]
    assert pinyin_to_phones("hui") == ["h", "uei"]
    assert pinyin_to_phones("jun") == ["j", "vn"]
    assert pinyin_to_phones("dun") == ["d", "uen"]
    assert pinyin_to_phones("qu") == ["q", "v"]
    assert pinyin_to_phones("lv") == ["l", "v"]
    assert pinyin_to_phones("lue") == ["l", "ve"]
    # Apical vowel differs from the [i] of ji.
    assert pinyin_to_phones("shi") == ["sh", "ih"]
    assert pinyin_to_phones("ji") == ["j", "i"]
    # Non-syllables are None.
    assert pinyin_to_phones("hello") is None
    assert pinyin_to_phones("2024") is None
    assert pinyin_to_phones("好") is None


def test_every_dictionary_pinyin_decomposes():
    """Every syllable in the recording-prompt inventory and the two
    shipped dictionaries must decompose into known units."""
    seen = set()
    for dict_name in ["dict_henan.txt", "dict_xuesong.txt"]:
        path = os.path.join(REFERENCE_DIR, dict_name)
        if not os.path.exists(path):
            pytest.skip("reference dictionaries not mounted")
        for line in open(path):
            parts = line.split()
            if parts:
                seen.add(parts[0])
    assert len(seen) > 300
    for syl in seen:
        phones = pinyin_to_phones(syl)
        assert phones is not None, syl
        for p in phones:
            assert p in INITIALS or p in FINALS, (syl, p)


def test_expand_walk_stream():
    # Punctuation strips; digits expand one pinyin per slot.
    assert expand_walk_stream("你好，世界!") == ["ni", "hao", "shi", "jie"]
    assert expand_walk_stream("今年2024") == [
        "jin", "nian", "er", "ling", "er", "si",
    ]


@pytest.fixture(scope="module")
def mandarin_aligner():
    """Model trained on the henan TTS recordings (reference assets)."""
    ref = REFERENCE_DIR
    if not os.path.isdir(f"{ref}/input_timestamp/henan"):
        pytest.skip("reference Chinese assets not mounted")
    from text2video_tpu.frontend import native
    from text2video_tpu.frontend.audio import load_wav_for_alignment

    utts = []
    for t in sorted(glob.glob(f"{ref}/input_timestamp/henan/*.txt")):
        b = os.path.basename(t)[:-4]
        wav = f"{ref}/input_audio/henan/{b}.wav"
        if not os.path.exists(wav) or b == "深水":  # stale txt/wav pair
            continue
        lines = [l.split() for l in open(t)]
        stream = [p[1] for p in lines if len(p) == 2]
        if len(stream) < 2:
            continue
        utts.append((load_wav_for_alignment(wav), stream))
    assert len(utts) >= 10
    model = train_mandarin_model(
        utts, iterations=8, target_mixes=4, feat_kind=native.FEAT_PLP
    )
    return MandarinAligner(model)


@requires_reference_data
def test_forced_alignment_matches_golden_timing(mandarin_aligner):
    """Per-syllable midpoints must land near the reference's vosk-timed
    goldens. The golden itself splits word intervals *uniformly*
    (pinyin_timestamping.py:98-106), so exact agreement is impossible;
    the bound asserts the same speech regions (30 fps frames)."""
    from text2video_tpu.frontend.audio import load_wav_for_alignment

    ref = REFERENCE_DIR
    for name, bound in [("baidu", 8.0), ("bill", 8.0)]:
        lines = [
            l.split() for l in open(f"{ref}/input_timestamp/henan/{name}.txt")
        ]
        stream = [p[1] for p in lines if len(p) == 2]
        gold = np.array([int(p[0]) for p in lines if len(p) == 2])
        samples = load_wav_for_alignment(
            f"{ref}/input_audio/henan/{name}.wav"
        )
        spans = mandarin_aligner.align_stream(samples, stream)
        ours = np.array(
            [int((s.start + (s.end - s.start) / 2) * 30 + 0.5) for s in spans]
        )
        err = np.abs(ours - gold)
        assert err.mean() < bound, (name, err.mean(), err.tolist())


@requires_reference_data
def test_timestamp_chinese_with_forced_aligner(mandarin_aligner):
    """End-to-end Chinese timing through timestamp_chinese: real audio +
    hanzi text -> monotonic pinyin timestamps with digits expanded."""
    from text2video_tpu.frontend.audio import load_wav_for_alignment
    from text2video_tpu.frontend.timestamp_zh import timestamp_chinese

    name = "今天天气好极了,不冷"
    wav = f"{REFERENCE_DIR}/input_audio/henan/{name}.wav"
    samples = load_wav_for_alignment(wav)
    text = "今天天气好极了,不冷不热还没有风非常适合出去游玩"
    ts = timestamp_chinese(
        text, samples, 16000, aligner=mandarin_aligner, fps=30.0
    )
    syms = [s for _, s in ts.entries]
    assert syms[:7] == ["jin", "tian", "tian", "qi", "hao", "ji", "le"]
    frames = [f for f, _ in ts.entries]
    assert frames == sorted(frames)
    assert frames[0] >= 0 and frames[-1] <= len(samples) / 16000 * 30 + 1


def test_phone_inventory_size():
    # sil + sp + 21 initials + finals; all unique.
    assert len(MANDARIN_PHONES) == len(set(MANDARIN_PHONES))
    assert MANDARIN_PHONES[:2] == ["sil", "sp"]

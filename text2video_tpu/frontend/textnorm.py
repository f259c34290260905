"""Text normalization and run-name derivation.

The reference derives the per-run file stem by removing spaces and CJK
punctuation and truncating to 10 chars (reference: tts_request.py:15-19,
align_english.py:27-31, interp_landmarks_motion_phoneme_VidTIMIT_smooth.py:
22-25). The CJK punctuation set mirrors ``zhon.hanzi.punctuation`` (that
package is not available here); ASCII punctuation mirrors the inline
``punctuations`` string (pinyin_timestamping.py:17).
"""

from __future__ import annotations

import re

# CJK full-width/ideographic punctuation (zhon.hanzi.punctuation equivalent).
CJK_PUNCT = (
    "＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃《》「」"
    "『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏"
    "！？｡。"
)

ASCII_PUNCT = "!()-[]{};:'\"\\,<>./?@#$%^&*_~"

_CJK_RE = re.compile("[%s]+" % re.escape(CJK_PUNCT))


def strip_punct(text: str, strip_spaces: bool = True, ascii_too: bool = False) -> str:
    """Remove (optionally) spaces, CJK punctuation, and ASCII punctuation."""
    if strip_spaces:
        text = text.replace(" ", "")
    text = _CJK_RE.sub("", text)
    if ascii_too:
        text = "".join(c for c in text if c not in ASCII_PUNCT)
    return text


def derive_file_name(text: str, strip_spaces: bool = True) -> str:
    """First 10 chars of the punctuation-stripped input — the run stem used
    for audio/timestamp/output artifact names throughout the pipeline."""
    return strip_punct(text, strip_spaces=strip_spaces)[:10]


def clean_transcript_words(text: str) -> list:
    """Word list for forced alignment, mirroring the aligner's transcript
    cleanup (reference: align_english.py:36-50): selected ASCII punctuation
    becomes spaces, trailing '-' and leading ' are dropped."""
    for pun in [",", ".", ":", ";", "!", "?", '"', "(", ")", "--", "---"]:
        text = text.replace(pun, " ")
    words = []
    for wrd in text.split():
        if wrd and wrd[-1] == "-":
            wrd = wrd[:-1]
        if wrd and wrd[0] == "'":
            wrd = wrd[1:]
        if wrd:
            words.append(wrd)
    return words

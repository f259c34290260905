#!/usr/bin/env python3
"""Generate golden test fixtures by executing the *reference* pipeline stages.

The reference repo has no test suite; its checked-in example inputs are the
only fixtures (SURVEY.md §4). This tool runs the reference pose-synthesis
stage (interp_landmarks_motion_phoneme_VidTIMIT_smooth.py) unmodified, in a
sandbox under the repo, and stores its emitted pose JSONs and rasterized
JPEGs under tests/goldens/. Our implementation is then tested bit-for-bit
(JSONs) and SSIM (images) against these goldens.

Reference code is never copied into the repo — it is executed read-only from
/root/reference to produce data.

Usage: python tools/make_goldens.py
"""

import os
import runpy
import shutil
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
SANDBOX = os.path.join(REPO, ".tmp", "ref_sandbox")
GOLDENS = os.path.join(REPO, "tests", "goldens")

UTTERANCE = "She had your dark suit in greasy wash water all year."
PERSON = "fadg0"
STEM = "Shehadyour"


def _stub_missing_modules():
    # moviepy / zhon are unavailable in this image; the reference imports
    # them at module scope but this stage never calls them beyond
    # zhon.hanzi.punctuation.
    editor = types.ModuleType("moviepy.editor")
    moviepy = types.ModuleType("moviepy")
    moviepy.editor = editor
    sys.modules.setdefault("moviepy", moviepy)
    sys.modules.setdefault("moviepy.editor", editor)

    hanzi = types.ModuleType("zhon.hanzi")
    hanzi.punctuation = (
        "＂＃＄％＆＇（）＊＋，－／：；＜＝＞＠［＼］＾＿｀｛｜｝～｟｠｢｣､、〃《》「」"
        "『』【】〔〕〖〗〘〙〚〛〜〝〞〟〰〾〿–—‘’‛“”„‟…‧﹏"
        "！？｡。"
    )
    zhon = types.ModuleType("zhon")
    zhon.hanzi = hanzi
    sys.modules.setdefault("zhon", zhon)
    sys.modules.setdefault("zhon.hanzi", hanzi)


def main():
    shutil.rmtree(os.path.dirname(SANDBOX), ignore_errors=True)
    work = os.path.join(SANDBOX, "Text2Video")
    os.makedirs(work)
    for link in ["*phoneme_data", "input_timestamp"]:
        os.symlink(os.path.join(REF, link), os.path.join(work, link))
    ds = os.path.join(SANDBOX, "vid2vid", "datasets", PERSON)
    for sub in [
        "test_openpose/tmp",
        "test_openpose/tmp_smooth",
        "test_img/tmp",
        "test_img/tmp_smooth",
    ]:
        os.makedirs(os.path.join(ds, sub))

    _stub_missing_modules()
    sys.path.insert(0, REF)
    sys.argv = ["interp", UTTERANCE, PERSON]
    cwd = os.getcwd()
    os.chdir(work)
    try:
        runpy.run_path(
            os.path.join(REF, "interp_landmarks_motion_phoneme_VidTIMIT_smooth.py"),
            run_name="__main__",
        )
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)

    out = os.path.join(GOLDENS, f"{PERSON}_{STEM}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    shutil.copytree(os.path.join(ds, "test_openpose/tmp"), os.path.join(out, "pose"))
    shutil.copytree(
        os.path.join(ds, "test_openpose/tmp_smooth"), os.path.join(out, "pose_smooth")
    )
    # Keep a subset of rasterized frames (every 8th) to bound fixture size.
    for sub, dst in [("test_img/tmp", "img"), ("test_img/tmp_smooth", "img_smooth")]:
        os.makedirs(os.path.join(out, dst))
        names = sorted(os.listdir(os.path.join(ds, sub)))
        for name in names[::8]:
            shutil.copy2(
                os.path.join(ds, sub, name), os.path.join(out, dst, name)
            )
    # Lossless rasterization goldens: run the reference keypoint2img module
    # directly over a subset of the emitted JSONs and store PNGs.
    import cv2

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_keypoint2img", os.path.join(REF, "keypoint2img.py")
    )
    ref_k2i = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_k2i)
    for src_sub, dst in [("pose", "png"), ("pose_smooth", "png_smooth")]:
        os.makedirs(os.path.join(out, dst))
        names = sorted(os.listdir(os.path.join(out, src_sub)))
        for name in names[::8]:
            img = ref_k2i.read_keypoints(
                os.path.join(out, src_sub, name), (512, 384)
            )
            stem = os.path.splitext(name)[0]
            cv2.imwrite(os.path.join(out, dst, stem + ".png"), img)

    shutil.rmtree(os.path.dirname(SANDBOX), ignore_errors=True)
    print(f"goldens written to {out}")


def main_chinese(person="henan", text="111"):
    """Chinese-path goldens: run the reference interp_landmarks_motion.py
    (pinyin dictionary flavor: 2-col dict, flat keypoint index,
    min_key_dist=3 with the strict-> rule) on a checked-in vosk timestamp
    fixture."""
    shutil.rmtree(os.path.dirname(SANDBOX), ignore_errors=True)
    work = os.path.join(SANDBOX, "Text2Video")
    os.makedirs(work)
    for link in ["*pinyin_data", "input_timestamp", f"dict_{person}.txt"]:
        os.symlink(os.path.join(REF, link), os.path.join(work, link))
    ds = os.path.join(SANDBOX, "vid2vid", "datasets", person)
    for sub in [
        "test_openpose/tmp",
        "test_openpose/tmp_smooth",
        "test_img/tmp",
        "test_img/tmp_smooth",
    ]:
        os.makedirs(os.path.join(ds, sub))

    _stub_missing_modules()
    sys.path.insert(0, REF)
    sys.argv = ["interp", text, person]
    cwd = os.getcwd()
    os.chdir(work)
    try:
        runpy.run_path(
            os.path.join(REF, "interp_landmarks_motion.py"),
            run_name="__main__",
        )
    finally:
        os.chdir(cwd)
        sys.path.remove(REF)

    out = os.path.join(GOLDENS, f"{person}_{text}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    shutil.copytree(os.path.join(ds, "test_openpose/tmp"), os.path.join(out, "pose"))
    shutil.copytree(
        os.path.join(ds, "test_openpose/tmp_smooth"), os.path.join(out, "pose_smooth")
    )
    shutil.rmtree(os.path.dirname(SANDBOX), ignore_errors=True)
    print(f"goldens written to {out}")


if __name__ == "__main__":
    main()
    main_chinese()

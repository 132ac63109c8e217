"""SciCap loader (reference ``dataset/scicap/scicap.py:41-98``).

Figures + caption/mention/paragraph/OCR features from the SciCap release.
The release ships multi-part zips that must be rejoined (``zip -FF``,
reference :63-73); this loader accepts pre-downloaded part files or a
directory of already-joined zips.
"""
from __future__ import annotations

import json
import os
import subprocess
import tempfile
import zipfile
from typing import Iterator, List, Optional

from ..utils.image import expand, load as load_image

HUB_REPO = "CrowdAILab/scicap"


def rejoin_multipart_zip(parts: List[str], output: str) -> str:
    """Recombine split zip volumes via ``zip -FF`` (reference :63-73)."""
    with tempfile.TemporaryDirectory() as tmp:
        linked = []
        for src in parts:
            dst = os.path.join(tmp, os.path.basename(src))
            os.symlink(os.path.abspath(src), dst)
            linked.append(dst)
        subprocess.run(["zip", "-FF", linked[0], "--out", output],
                       check=True, capture_output=True)
    return output


def iter_scicap(text_json: str, image_zip: str,
                size: int = 420) -> Iterator[dict]:
    """Yield {caption, mention, paragraph, ocr, image} dicts."""
    with open(text_json) as f:
        records = json.load(f)
    images = records.get("images", records) if isinstance(records, dict) \
        else records
    annots = {}
    if isinstance(records, dict):
        for ann in records.get("annotations", []):
            annots[ann.get("image_id")] = ann
    with zipfile.ZipFile(image_zip) as zf:
        names = {os.path.basename(n): n for n in zf.namelist()}
        for rec in images:
            fname = rec.get("file_name")
            if fname is None or os.path.basename(fname) not in names:
                continue
            ann = annots.get(rec.get("id"), rec)
            with zf.open(names[os.path.basename(fname)]) as f:
                image = load_image(f.read())
            yield dict(
                caption=ann.get("caption", ""),
                mention=[ann.get("mention", [])],
                paragraph=ann.get("paragraph", []),
                ocr=ann.get("ocr", []),
                image=expand(image, size),
            )


def load_scicap(text_json: Optional[str] = None,
                image_zip: Optional[str] = None,
                image_zip_parts: Optional[List[str]] = None,
                size: int = 420, streaming: bool = False):
    if image_zip is None and image_zip_parts:
        image_zip = rejoin_multipart_zip(
            image_zip_parts, image_zip_parts[0] + "-joined.zip")
    if text_json is None or image_zip is None:
        raise ValueError(
            "scicap requires local text_json and image_zip paths (or "
            "image_zip_parts); this build does not auto-download from "
            f"{HUB_REPO} in zero-egress environments")
    if streaming:
        return iter_scicap(text_json, image_zip, size)
    import datasets

    return datasets.Dataset.from_generator(
        lambda: iter_scicap(text_json, image_zip, size))

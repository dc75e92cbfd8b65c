"""Minimal COCO caption-annotation API (clean-room).

Reference parity: the vendored pycocotools COCO class
(coco/PythonAPI/pycocotools/coco.py:70-433) as used by this pipeline — index
building (createIndex, coco.py:90-119), getImgIds/getAnnIds/loadImgs/loadAnns,
and loadRes for building a results-COCO from a caption results file
(coco.py:297-356). Detection/mask functionality lives in
adaptive_tpu.native.mask (RLE ops) instead of here.
"""

from __future__ import annotations

import copy
import json
import os
import time
from collections import defaultdict
from typing import Any, Dict, Iterable, List, Optional, Union


class COCO:
    def __init__(self, annotation_file: Optional[str] = None):
        self.dataset: Dict[str, Any] = {}
        self.anns: Dict[int, dict] = {}
        self.imgs: Dict[int, dict] = {}
        self.imgToAnns: Dict[int, List[dict]] = defaultdict(list)
        if annotation_file is not None:
            tic = time.time()
            with open(annotation_file) as f:
                self.dataset = json.load(f)
            assert isinstance(self.dataset, dict), "annotation file format not supported"
            print("loading annotations into memory... Done (t=%0.2fs)" % (time.time() - tic))
            self.createIndex()

    def createIndex(self):
        anns, imgs = {}, {}
        imgToAnns = defaultdict(list)
        for ann in self.dataset.get("annotations", []):
            imgToAnns[ann["image_id"]].append(ann)
            anns[ann["id"]] = ann
        for img in self.dataset.get("images", []):
            imgs[img["id"]] = img
        self.anns, self.imgs, self.imgToAnns = anns, imgs, imgToAnns

    # ------------------------------------------------------------------ gets
    def getImgIds(self, imgIds: Union[int, Iterable[int]] = ()) -> List[int]:
        imgIds = _as_list(imgIds)
        if not imgIds:
            return list(self.imgs.keys())
        return [i for i in imgIds if i in self.imgs]

    def getAnnIds(self, imgIds: Union[int, Iterable[int]] = ()) -> List[int]:
        imgIds = _as_list(imgIds)
        if not imgIds:
            return list(self.anns.keys())
        out: List[int] = []
        for i in imgIds:
            out.extend(a["id"] for a in self.imgToAnns.get(i, []))
        return out

    def loadImgs(self, ids: Union[int, Iterable[int]]) -> List[dict]:
        return [self.imgs[i] for i in _as_list(ids)]

    def loadAnns(self, ids: Union[int, Iterable[int]]) -> List[dict]:
        return [self.anns[i] for i in _as_list(ids)]

    # --------------------------------------------------------------- results
    def loadRes(self, resFile: Union[str, List[dict]]) -> "COCO":
        """Build a results-COCO from a caption results file (coco.py:297-356).

        Results must reference image ids present in this COCO; each result
        gets a fresh annotation id.
        """
        res = COCO()
        res.dataset["images"] = [img for img in self.dataset.get("images", [])]
        if isinstance(resFile, str):
            with open(resFile) as f:
                anns = json.load(f)
        else:
            anns = copy.deepcopy(resFile)
        assert isinstance(anns, list), "results in not an array of objects"
        annsImgIds = [ann["image_id"] for ann in anns]
        assert set(annsImgIds) == (set(annsImgIds) & set(self.getImgIds())), (
            "Results do not correspond to current coco set"
        )
        if anns and "caption" in anns[0]:
            imgIds = set(i["id"] for i in res.dataset["images"]) & set(annsImgIds)
            res.dataset["images"] = [i for i in res.dataset["images"] if i["id"] in imgIds]
            for aid, ann in enumerate(anns):
                ann["id"] = aid + 1
        res.dataset["annotations"] = anns
        res.createIndex()
        return res


def _as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple, set)):
        return list(x)
    return [x]

"""Legacy pycocotools v1.0.1 API surface (clean-room compat layer).

Reference parity: coco/pycocotools/coco.py (the py2-era v1.0.1 API vendored
next to the v2 one; imported nowhere in the reference's code_src, but part of
its public surface). Users migrating v1-era scripts get the same call
signatures and data shapes here, implemented on numpy + the native mask lib.

Intentional differences from the reference file (each loud, none silent):
* ``info()`` works — the reference's has a typo (``self.datset``) and always
  crashes (coco.py:113-114).
* ``segToMask`` rasterizes via the native maskApi frPoly scanline
  (maskApi.c semantics) instead of skimage.draw.polygon; boundary pixels can
  differ by the usual half-open-vs-centroid convention.
* ``showAnns`` prints captions; the matplotlib 'instances' rendering raises
  ImportError unless matplotlib is importable (kept optional, same as the
  framework's policy of no hard viz deps).

v1 quirks preserved (they differ from the v2 API and callers may rely on
them): uncompressed-RLE dicts for decodeMask/encodeMask (column-major,
leading zero-count when the mask starts with 1), ``dataset['type']`` gating
of category indexes, loadRes ids numbered from 0 (v2 numbers from 1), and
the loadRes segmentation-area formula sum(counts[2:-1:2]) (coco.py:297-301).
"""

from __future__ import annotations

import copy
import json
from typing import Dict, List

import numpy as np


class COCO:
    """v1.0.1-compatible COCO API (coco/pycocotools/coco.py:56-368)."""

    def __init__(self, annotation_file: str = None):
        self.dataset: Dict = {}
        self.anns = []
        self.imgToAnns = {}
        self.catToImgs = {}
        self.imgs = []
        self.cats = []
        if annotation_file is not None:
            print("loading annotations into memory...")
            with open(annotation_file) as f:
                self.dataset = json.load(f)
            self.createIndex()

    def createIndex(self):
        print("creating index...")
        imgToAnns = {ann["image_id"]: [] for ann in self.dataset["annotations"]}
        anns = {ann["id"]: [] for ann in self.dataset["annotations"]}
        for ann in self.dataset["annotations"]:
            imgToAnns[ann["image_id"]] += [ann]
            anns[ann["id"]] = ann
        imgs = {im["id"]: im for im in self.dataset["images"]}
        cats: Dict = []
        catToImgs: Dict = []
        if self.dataset["type"] == "instances":
            cats = {cat["id"]: cat for cat in self.dataset["categories"]}
            catToImgs = {cat["id"]: [] for cat in self.dataset["categories"]}
            for ann in self.dataset["annotations"]:
                catToImgs[ann["category_id"]] += [ann["image_id"]]
        print("index created!")
        self.anns = anns
        self.imgToAnns = imgToAnns
        self.catToImgs = catToImgs
        self.imgs = imgs
        self.cats = cats

    def info(self):
        for key, value in self.dataset["info"].items():
            print("%s: %s" % (key, value))

    # -------------------------------------------------------------- getters
    def getAnnIds(self, imgIds=[], catIds=[], areaRng=[], iscrowd=None):
        imgIds = imgIds if type(imgIds) == list else [imgIds]
        catIds = catIds if type(catIds) == list else [catIds]
        if len(imgIds) == len(catIds) == len(areaRng) == 0:
            anns = self.dataset["annotations"]
        else:
            if not len(imgIds) == 0:
                anns = sum(
                    [self.imgToAnns[i] for i in imgIds if i in self.imgToAnns], []
                )
            else:
                anns = self.dataset["annotations"]
            if len(catIds):
                anns = [a for a in anns if a["category_id"] in catIds]
            if len(areaRng):
                anns = [a for a in anns if areaRng[0] < a["area"] < areaRng[1]]
        if self.dataset["type"] == "instances" and iscrowd is not None:
            return [a["id"] for a in anns if a["iscrowd"] == iscrowd]
        return [a["id"] for a in anns]

    def getCatIds(self, catNms=[], supNms=[], catIds=[]):
        catNms = catNms if type(catNms) == list else [catNms]
        supNms = supNms if type(supNms) == list else [supNms]
        catIds = catIds if type(catIds) == list else [catIds]
        cats = self.dataset["categories"]
        if len(catNms):
            cats = [c for c in cats if c["name"] in catNms]
        if len(supNms):
            cats = [c for c in cats if c["supercategory"] in supNms]
        if len(catIds):
            cats = [c for c in cats if c["id"] in catIds]
        return [c["id"] for c in cats]

    def getImgIds(self, imgIds=[], catIds=[]):
        imgIds = imgIds if type(imgIds) == list else [imgIds]
        catIds = catIds if type(catIds) == list else [catIds]
        if len(imgIds) == len(catIds) == 0:
            return list(self.imgs.keys())
        ids = set(imgIds)
        for catId in catIds:
            if len(ids) == 0:
                ids = set(self.catToImgs[catId])
            else:
                ids &= set(self.catToImgs[catId])
        return list(ids)

    def loadAnns(self, ids=[]):
        if type(ids) == list:
            return [self.anns[i] for i in ids]
        elif type(ids) == int:
            return [self.anns[ids]]

    def loadCats(self, ids=[]):
        if type(ids) == list:
            return [self.cats[i] for i in ids]
        elif type(ids) == int:
            return [self.cats[ids]]

    def loadImgs(self, ids=[]):
        if type(ids) == list:
            return [self.imgs[i] for i in ids]
        elif type(ids) == int:
            return [self.imgs[ids]]

    def showAnns(self, anns):
        if len(anns) == 0:
            return 0
        if self.dataset["type"] == "captions":
            for ann in anns:
                print(ann["caption"])
            return
        # 'instances' rendering needs matplotlib; keep it an optional extra.
        import matplotlib.pyplot as plt  # noqa: F401  (raises if unavailable)
        from matplotlib.collections import PatchCollection
        from matplotlib.patches import Polygon

        ax = plt.gca()
        polygons, color = [], []
        for ann in anns:
            c = np.random.random((1, 3)).tolist()[0]
            if type(ann["segmentation"]) == list:
                for seg in ann["segmentation"]:
                    poly = np.array(seg).reshape((len(seg) // 2, 2))
                    polygons.append(Polygon(poly, closed=True, alpha=0.4))
                    color.append(c)
            else:
                mask = COCO.decodeMask(ann["segmentation"])
                img = np.ones((mask.shape[0], mask.shape[1], 3))
                cm = (
                    np.array([2.0, 166.0, 101.0]) / 255
                    if ann["iscrowd"] == 1
                    else np.random.random((1, 3)).tolist()[0]
                )
                for i in range(3):
                    img[:, :, i] = cm[i]
                ax.imshow(np.dstack((img, mask * 0.5)))
        p = PatchCollection(
            polygons, facecolors=color, edgecolors=(0, 0, 0, 1), linewidths=3, alpha=0.4
        )
        ax.add_collection(p)

    # -------------------------------------------------------------- results
    def loadRes(self, resFile: str) -> "COCO":
        res = COCO()
        res.dataset["images"] = [img for img in self.dataset["images"]]
        res.dataset["info"] = copy.deepcopy(self.dataset["info"])
        res.dataset["type"] = copy.deepcopy(self.dataset["type"])
        res.dataset["licenses"] = copy.deepcopy(self.dataset["licenses"])

        print("Loading and preparing results...     ")
        with open(resFile) as f:
            anns = json.load(f)
        assert type(anns) == list, "results in not an array of objects"
        annsImgIds = [ann["image_id"] for ann in anns]
        assert set(annsImgIds) == (
            set(annsImgIds) & set(self.getImgIds())
        ), "Results do not correspond to current coco set"
        if "caption" in anns[0]:
            imgIds = set(i["id"] for i in res.dataset["images"]) & set(annsImgIds)
            res.dataset["images"] = [
                i for i in res.dataset["images"] if i["id"] in imgIds
            ]
            for aid, ann in enumerate(anns):
                ann["id"] = aid  # v1 numbers from 0 (v2 from 1)
        elif "bbox" in anns[0] and not anns[0]["bbox"] == []:
            res.dataset["categories"] = copy.deepcopy(self.dataset["categories"])
            for aid, ann in enumerate(anns):
                bb = ann["bbox"]
                x1, x2, y1, y2 = bb[0], bb[0] + bb[2], bb[1], bb[1] + bb[3]
                ann["segmentation"] = [[x1, y1, x1, y2, x2, y2, x2, y1]]
                ann["area"] = bb[2] * bb[3]
                ann["id"] = aid
                ann["iscrowd"] = 0
        elif "segmentation" in anns[0]:
            res.dataset["categories"] = copy.deepcopy(self.dataset["categories"])
            for aid, ann in enumerate(anns):
                # v1 quirk: area from every other uncompressed count
                ann["area"] = sum(ann["segmentation"]["counts"][2:-1:2])
                ann["bbox"] = []
                ann["id"] = aid
                ann["iscrowd"] = 0
        res.dataset["annotations"] = anns
        res.createIndex()
        return res

    # ---------------------------------------------------------- mask statics
    @staticmethod
    def decodeMask(R):
        """Uncompressed-RLE dict {'size': [h, w], 'counts': [...]} -> mask.

        Column-major runs starting with a 0-run (coco.py:307-323), returned
        as the reference does: float array of 0.0/1.0."""
        counts = np.asarray(R["counts"], dtype=np.int64)
        vals = np.zeros(len(counts))
        vals[1::2] = 1  # runs alternate 0,1,0,1,...
        M = np.repeat(vals, counts)
        return M.reshape(R["size"], order="F")

    @staticmethod
    def encodeMask(M):
        """Binary mask -> uncompressed-RLE dict (coco.py:325-347): column-major
        runs, leading zero count when the mask starts with 1."""
        h, w = M.shape
        flat = np.asarray(M, dtype=bool).flatten(order="F")
        change = np.flatnonzero(flat[:-1] != flat[1:]) + 1
        edges = np.concatenate([[0], change, [flat.size]])
        counts_list = np.diff(edges).tolist()
        if flat[0]:
            counts_list = [0] + counts_list
        return {"size": [h, w], "counts": counts_list}

    @staticmethod
    def segToMask(S: List[List[float]], h: int, w: int):
        """Polygon list -> bool mask via the native maskApi scanline
        (frPoly); the reference used skimage.draw.polygon (coco.py:349-361)."""
        from adaptive_tpu.native import mask as maskUtils

        rles = maskUtils.frPyObjects(S, h, w)
        m = maskUtils.decode(maskUtils.merge(rles if isinstance(rles, list) else [rles]))
        return m.astype(bool)

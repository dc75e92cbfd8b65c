"""COCO detection evaluation (bbox / segm / keypoints AP) — clean-room.

Reference parity: the vendored COCOeval
(coco/PythonAPI/pycocotools/cocoeval.py:10-533) — greedy per-image
per-category matching over 10 IoU thresholds with crowd/ignore semantics,
101-point interpolated precision, area-range and maxDets breakdowns, OKS for
keypoints, and the standard 12-stat (dets) / 10-stat (kps) summary. The
captioning pipeline itself never calls this (cocoeval is vendored-unused in
the reference, SURVEY.md C23), but it completes the COCO-API capability
surface. IoU computation uses the native C++ mask library
(adaptive_tpu/native/masklib.cpp).
"""

from __future__ import annotations

import copy
import datetime
import time
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from adaptive_tpu.native import mask as maskUtils

OKS_SIGMAS = (
    np.array(
        [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62, 1.07, 1.07, .87, .87, .89, .89]
    )
    / 10.0
)


class Params:
    """Default evaluation parameters (cocoeval.py:499-534)."""

    def __init__(self, iouType: str = "segm"):
        self.imgIds: List[int] = []
        self.catIds: List[int] = []
        self.iouThrs = np.linspace(0.5, 0.95, int(round((0.95 - 0.5) / 0.05)) + 1, endpoint=True)
        self.recThrs = np.linspace(0.0, 1.00, int(round(1.00 / 0.01)) + 1, endpoint=True)
        if iouType in ("segm", "bbox"):
            self.maxDets = [1, 10, 100]
            self.areaRng = [[0, 1e5**2], [0, 32**2], [32**2, 96**2], [96**2, 1e5**2]]
            self.areaRngLbl = ["all", "small", "medium", "large"]
        elif iouType == "keypoints":
            self.maxDets = [20]
            self.areaRng = [[0, 1e5**2], [32**2, 96**2], [96**2, 1e5**2]]
            self.areaRngLbl = ["all", "medium", "large"]
        else:
            raise ValueError(f"iouType not supported: {iouType}")
        self.useCats = 1
        self.iouType = iouType


class COCOeval:
    def __init__(self, cocoGt=None, cocoDt=None, iouType: str = "segm"):
        self.cocoGt = cocoGt
        self.cocoDt = cocoDt
        self.params = Params(iouType)
        self.evalImgs: List = []
        self.eval: Dict = {}
        self.stats = np.zeros(0)
        self.ious: Dict = {}
        if cocoGt is not None:
            self.params.imgIds = sorted(cocoGt.getImgIds())
            self.params.catIds = sorted(cocoGt.getCatIds())

    # ---------------------------------------------------------------- prepare
    def _prepare(self):
        p = self.params
        gts = self.cocoGt.loadAnns(self.cocoGt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds if p.useCats else ()))
        dts = self.cocoDt.loadAnns(self.cocoDt.getAnnIds(imgIds=p.imgIds, catIds=p.catIds if p.useCats else ()))
        if p.iouType == "segm":
            for ann in gts:
                ann["segmentation"] = _to_rle(ann, self.cocoGt)
            for ann in dts:
                ann["segmentation"] = _to_rle(ann, self.cocoDt)
        for gt in gts:
            gt["ignore"] = 1 if gt.get("iscrowd") else 0
            if p.iouType == "keypoints":
                gt["ignore"] = (gt.get("num_keypoints", 0) == 0) or gt["ignore"]
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            self._gts[gt["image_id"], gt["category_id"]].append(gt)
        for dt in dts:
            self._dts[dt["image_id"], dt["category_id"]].append(dt)

    # --------------------------------------------------------------- evaluate
    def evaluate(self):
        tic = time.time()
        print("Running per image evaluation...")
        p = self.params
        print("Evaluate annotation type *{}*".format(p.iouType))
        p.imgIds = list(np.unique(p.imgIds))
        if p.useCats:
            p.catIds = list(np.unique(p.catIds))
        p.maxDets = sorted(p.maxDets)

        self._prepare()
        catIds = p.catIds if p.useCats else [-1]
        compute = self.computeOks if p.iouType == "keypoints" else self.computeIoU
        self.ious = {(i, c): compute(i, c) for i in p.imgIds for c in catIds}
        maxDet = p.maxDets[-1]
        self.evalImgs = [
            self.evaluateImg(imgId, catId, areaRng, maxDet)
            for catId in catIds
            for areaRng in p.areaRng
            for imgId in p.imgIds
        ]
        self._paramsEval = copy.deepcopy(p)
        print("DONE (t={:0.2f}s).".format(time.time() - tic))

    def _sorted_dts(self, imgId, catId):
        p = self.params
        dt = self._dts[imgId, catId] if p.useCats else [
            d for c in p.catIds for d in self._dts[imgId, c]
        ]
        inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in inds]
        return dt[: p.maxDets[-1]]

    def computeIoU(self, imgId, catId):
        p = self.params
        gt = self._gts[imgId, catId] if p.useCats else [
            g for c in p.catIds for g in self._gts[imgId, c]
        ]
        dt = self._sorted_dts(imgId, catId)
        if len(gt) == 0 and len(dt) == 0:
            return []
        key = "segmentation" if p.iouType == "segm" else "bbox"
        g = [x[key] for x in gt]
        d = [x[key] for x in dt]
        iscrowd = [int(x.get("iscrowd", 0)) for x in gt]
        return maskUtils.iou(d, g, iscrowd)

    def computeOks(self, imgId, catId):
        """Object-keypoint-similarity matrix (cocoeval.py:193-234)."""
        p = self.params
        gts = self._gts[imgId, catId]
        dts = self._sorted_dts(imgId, catId)
        if len(gts) == 0 or len(dts) == 0:
            return []
        variances = (OKS_SIGMAS * 2) ** 2
        k = len(OKS_SIGMAS)
        ious = np.zeros((len(dts), len(gts)))
        for j, gt in enumerate(gts):
            g = np.array(gt["keypoints"])
            xg, yg, vg = g[0::3], g[1::3], g[2::3]
            k1 = np.count_nonzero(vg > 0)
            bb = gt["bbox"]
            x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
            y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
            for i, dt in enumerate(dts):
                d = np.array(dt["keypoints"])
                xd, yd = d[0::3], d[1::3]
                if k1 > 0:
                    dx, dy = xd - xg, yd - yg
                else:
                    z = np.zeros((k,))
                    dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1), axis=0)
                    dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1), axis=0)
                e = (dx**2 + dy**2) / variances / (gt["area"] + np.spacing(1)) / 2
                if k1 > 0:
                    e = e[vg > 0]
                ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
        return ious

    def evaluateImg(self, imgId, catId, aRng, maxDet) -> Optional[dict]:
        """Greedy matching for one (image, category, area range)
        (cocoeval.py:236-314)."""
        p = self.params
        gt = self._gts[imgId, catId] if p.useCats else [
            g for c in p.catIds for g in self._gts[imgId, c]
        ]
        dt = self._dts[imgId, catId] if p.useCats else [
            d for c in p.catIds for d in self._dts[imgId, c]
        ]
        if len(gt) == 0 and len(dt) == 0:
            return None

        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < aRng[0] or g["area"] > aRng[1]) else 0

        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:maxDet]]
        iscrowd = [int(o.get("iscrowd", 0)) for o in gt]
        ious = self.ious[imgId, catId]
        ious = ious[:, gtind] if len(ious) > 0 else ious

        T, G, D = len(p.iouThrs), len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(p.iouThrs):
                for dind, d in enumerate(dt):
                    best_iou = min(t, 1 - 1e-10)
                    m = -1
                    for gind in range(G):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue  # gt taken (crowd gts can match many)
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break  # matched a real gt; remaining gts are ignores
                        if ious[dind, gind] < best_iou:
                            continue
                        best_iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        # unmatched detections outside the area range are ignored
        a = np.array([d["area"] < aRng[0] or d["area"] > aRng[1] for d in dt]).reshape((1, D))
        dtIg = np.logical_or(dtIg, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "image_id": imgId,
            "category_id": catId,
            "aRng": aRng,
            "maxDet": maxDet,
            "dtIds": [d["id"] for d in dt],
            "gtIds": [g["id"] for g in gt],
            "dtMatches": dtm,
            "gtMatches": gtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gtIg,
            "dtIgnore": dtIg,
        }

    # -------------------------------------------------------------- accumulate
    def accumulate(self, p=None):
        print("Accumulating evaluation results...")
        tic = time.time()
        if p is None:
            p = self.params
        p.catIds = p.catIds if p.useCats == 1 else [-1]
        T, R = len(p.iouThrs), len(p.recThrs)
        K = len(p.catIds) if p.useCats else 1
        A, M = len(p.areaRng), len(p.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        scores = -np.ones((T, R, K, A, M))

        _pe = self._paramsEval
        I0, A0 = len(_pe.imgIds), len(_pe.areaRng)
        for k in range(K):
            Nk = k * A0 * I0
            for a in range(A):
                Na = a * I0
                for m, maxDet in enumerate(p.maxDets):
                    E = [self.evalImgs[Nk + Na + i] for i in range(I0)]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dtScores = np.concatenate([e["dtScores"][:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]
                    dtm = np.concatenate([e["dtMatches"][:, :maxDet] for e in E], axis=1)[:, inds]
                    dtIg = np.concatenate([e["dtIgnore"][:, :maxDet] for e in E], axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dtIg))
                    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dtIg))
                    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                    for t in range(T):
                        tp, fp = tp_sum[t], fp_sum[t]
                        nd = len(tp)
                        rc = tp / npig
                        pr = (tp / (fp + tp + np.spacing(1))).tolist()
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        # monotone precision envelope (right-to-left max)
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        q = np.zeros((R,))
                        ss = np.zeros((R,))
                        inds_r = np.searchsorted(rc, p.recThrs, side="left")
                        for ri, pi in enumerate(inds_r):
                            if pi < nd:
                                q[ri] = pr[pi]
                                ss[ri] = dtScoresSorted[pi]
                            else:
                                break
                        precision[t, :, k, a, m] = q
                        scores[t, :, k, a, m] = ss
        self.eval = {
            "params": p,
            "counts": [T, R, K, A, M],
            "date": datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S"),
            "precision": precision,
            "recall": recall,
            "scores": scores,
        }
        print("DONE (t={:0.2f}s).".format(time.time() - tic))

    # --------------------------------------------------------------- summarize
    def summarize(self):
        def _summ(ap=1, iouThr=None, areaRng="all", maxDets=100):
            p = self.params
            iStr = " {:<18} {} @[ IoU={:<9} | area={:>6s} | maxDets={:>3d} ] = {:0.3f}"
            titleStr = "Average Precision" if ap == 1 else "Average Recall"
            typeStr = "(AP)" if ap == 1 else "(AR)"
            iouStr = (
                "{:0.2f}:{:0.2f}".format(p.iouThrs[0], p.iouThrs[-1])
                if iouThr is None
                else "{:0.2f}".format(iouThr)
            )
            aind = [i for i, a in enumerate(p.areaRngLbl) if a == areaRng]
            mind = [i for i, m in enumerate(p.maxDets) if m == maxDets]
            s = self.eval["precision"] if ap == 1 else self.eval["recall"]
            if iouThr is not None:
                s = s[np.where(iouThr == p.iouThrs)[0]]
            s = s[..., aind, mind] if ap == 0 else s[:, :, :, aind, mind]
            mean_s = -1 if len(s[s > -1]) == 0 else np.mean(s[s > -1])
            print(iStr.format(titleStr, typeStr, iouStr, areaRng, maxDets, mean_s))
            return mean_s

        if not self.eval:
            raise Exception("Please run accumulate() first")
        if self.params.iouType == "keypoints":
            md = self.params.maxDets[0]
            self.stats = np.array(
                [
                    _summ(1, maxDets=md), _summ(1, maxDets=md, iouThr=.5),
                    _summ(1, maxDets=md, iouThr=.75), _summ(1, maxDets=md, areaRng="medium"),
                    _summ(1, maxDets=md, areaRng="large"), _summ(0, maxDets=md),
                    _summ(0, maxDets=md, iouThr=.5), _summ(0, maxDets=md, iouThr=.75),
                    _summ(0, maxDets=md, areaRng="medium"), _summ(0, maxDets=md, areaRng="large"),
                ]
            )
        else:
            m = self.params.maxDets
            self.stats = np.array(
                [
                    _summ(1), _summ(1, iouThr=.5, maxDets=m[2]), _summ(1, iouThr=.75, maxDets=m[2]),
                    _summ(1, areaRng="small", maxDets=m[2]), _summ(1, areaRng="medium", maxDets=m[2]),
                    _summ(1, areaRng="large", maxDets=m[2]), _summ(0, maxDets=m[0]),
                    _summ(0, maxDets=m[1]), _summ(0, maxDets=m[2]),
                    _summ(0, areaRng="small", maxDets=m[2]), _summ(0, areaRng="medium", maxDets=m[2]),
                    _summ(0, areaRng="large", maxDets=m[2]),
                ]
            )
        return self.stats


def _to_rle(ann: dict, coco) -> dict:
    segm = ann["segmentation"]
    if isinstance(segm, dict) and not isinstance(segm.get("counts"), list):
        return segm
    return coco.annToRLE(ann)

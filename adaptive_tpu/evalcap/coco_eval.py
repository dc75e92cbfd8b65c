"""Evaluation driver: greedy-decode a split, score with the COCO caption stack.

Reference parity: coco_eval (code_src/tools/utils.py:108-250) — decode every
image of the val/test/train_eval split, cut captions at <end>, write a
results JSON named per mode, run COCOEvalCap, print metrics, return CIDEr.
Modes: per-epoch val, per-epoch train_eval, standalone valid, standalone test
(utils.py:119-146, 205-222).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import numpy as np

from adaptive_tpu.data.coco_api import COCO
from adaptive_tpu.data.loader import EvalBatches, EvalImageDataset
from adaptive_tpu.data.vocab import Vocabulary
from adaptive_tpu.decoding import make_beam_decoder, make_greedy_decoder
from adaptive_tpu.evalcap.eval import COCOEvalCap


_CKPT_EXTS = (".pkl", ".ckpt", ".msgpack", ".npz")


def _results_name(model_path: str) -> str:
    """Results-JSON name derived from the checkpoint path.

    The reference flattens the path and truncates at the FIRST '.'
    (utils.py:205-222) — which collides for checkpoints whose names embed the
    CIDEr score: 'a/cider-0.9300_model-9' and 'a/cider-0.8100_model-3' both
    become 'a_cider-0.json'. Intentional deviation: strip only a real
    checkpoint extension, then map remaining dots to '_' so every checkpoint
    gets a distinct, filesystem-safe name.
    """
    flat = model_path.rstrip("/").replace("/", "_")
    stem, ext = os.path.splitext(flat)
    if ext.lower() in _CKPT_EXTS:
        flat = stem
    return flat.replace(".", "_") + ".json"


def decode_split(
    cf, model, params, state, ann_path: str, vocab: Vocabulary, decoder=None
) -> List[Dict]:
    """Generate {'image_id', 'caption'} results for every image in a split."""
    if decoder is None:
        decoder = (
            make_beam_decoder(model, cf) if cf.beam_size > 1 else make_greedy_decoder(model, cf)
        )
    dataset = EvalImageDataset(cf.resized_image_dir, ann_path)
    batches = EvalBatches(dataset, cf.eval_batch_size, cf.dataloader_num_workers)

    # SPMD eval: on a multi-device mesh, shard each (fixed-size, padded)
    # eval batch over the data axis — the jitted decode then runs data
    # parallel with replicated params, same as the train step. The reference
    # wraps the encoder in DataParallel inside sampler
    # (adaptive_attention.py:178-181); here it's one sharding annotation.
    shard_images = lambda imgs: imgs
    import jax as _jax

    if len(_jax.devices()) > 1:
        from adaptive_tpu.parallel import make_mesh
        from adaptive_tpu.parallel.mesh import data_sharding, place_batch

        mesh = make_mesh(cf)
        data_n = mesh.shape[cf.mesh_axes[0]]
        if cf.eval_batch_size % data_n == 0:
            ds = data_sharding(mesh)
            # place_batch, not a bare device_put: on a multi-process mesh the
            # NamedSharding spans non-addressable devices and device_put
            # raises; place_batch assembles the global array from each
            # process's slice (same path as the train input).
            shard_images = lambda imgs: place_batch(ds, {"images": imgs})["images"]

    results: List[Dict] = []
    seen = set()
    for i, batch in enumerate(batches):
        out = decoder(params, state, shard_images(batch["images"]))
        ids = out.ids if hasattr(out, "ids") else out[0]
        if isinstance(ids, _jax.Array) and not ids.is_fully_addressable:
            # multi-process mesh: the decoded ids are a global sharded array;
            # gather so every process scores the full split (they all need
            # the same CIDEr for plateau/early-stop decisions)
            from jax.experimental import multihost_utils

            ids = multihost_utils.process_allgather(ids, tiled=True)
        ids = np.asarray(ids)
        for row in range(ids.shape[0]):
            if not batch["valid"][row]:
                continue
            img_id = int(batch["img_ids"][row])
            if img_id in seen:  # an image can appear once per split
                continue
            seen.add(img_id)
            sentence = vocab.decode_ids(ids[row])  # cut at <end> (utils.py:185-190)
            results.append({"image_id": img_id, "caption": sentence})
        if (i + 1) % 10 == 0:
            print("[%d/%d]" % (i + 1, len(batches)))
    return results


def coco_eval(
    cf,
    model=None,
    params=None,
    state=None,
    epoch: int = 0,
    train_mode: bool = False,
    test_mode: bool = False,
    valid_mode: bool = False,
    vocab: Optional[Vocabulary] = None,
    decoder=None,
    per_image_out: Optional[Dict] = None,
) -> float:
    """Returns the split's CIDEr (utils.py:108-250). Pass a prebuilt decoder
    to share one compiled decode program across calls (per-epoch evals).
    per_image_out: a dict to fill with {image_id: {metric: score}} — the
    per-image scores back paired statistics (e.g. the int8 gate's
    bootstrap-CI deltas, tools/int8_gate.py)."""
    # at most ONE mode: pairwise conflicts would silently score the wrong
    # split (test wins every tiebreak below)
    assert sum((test_mode, valid_mode, train_mode)) <= 1, (
        "coco_eval modes are mutually exclusive"
    )

    if vocab is None:
        vocab = Vocabulary.load(cf.vocab_path)
    cf = cf.replace(vocab_length=len(vocab))

    if (test_mode or valid_mode) and model is None:
        model, params, state, resolved = get_testOrValid_model(cf, test_mode, valid_mode)
        # bake the resolved checkpoint back into cf so the results-file name
        # below reflects the actual checkpoint (with 'auto', naming from the
        # knob would collide every run on 'auto.json')
        cf = cf.replace(
            **{("test" if test_mode else "valid") + "_pretrained_model": resolved}
        )

    ann_path = cf.val_anno_path
    if test_mode:
        ann_path = cf.test_anno_path
    elif train_mode:
        ann_path = cf.train_eval_anno_path

    if cf.encoder_quant == "int8" and getattr(model, "int8_scales", None) is None:
        # static PTQ calibration on the split's first images — the same
        # contract as serving/bench (models/infer.py::calibrate_model); the
        # dynamic fallback is both slower and quantizes differently, so eval
        # must never silently score a different int8 path than production.
        from adaptive_tpu.data.loader import EvalImageDataset
        from adaptive_tpu.models.infer import calibrate_model

        ds = EvalImageDataset(cf.resized_image_dir, ann_path)
        calib = np.stack([ds[i][0] for i in range(min(32, len(ds)))])
        model = calibrate_model(model, cf, params, state, calib)
        print(f"int8: calibrated static scales on {calib.shape[0]} split images")
        if decoder is not None:
            # a prebuilt decoder closed over the UNcalibrated model; using it
            # would silently score the dynamic int8 path every epoch. Rebuild
            # against the calibrated model — the per-epoch recompile is the
            # honest cost of static PTQ on weights that move during training
            # (the scales must track the current weights anyway).
            print("int8: rebuilding decode program for the calibrated scales")
            decoder = None

    banner = "evaluation on MS-COCO dataset"
    if test_mode:
        banner = "test on MS-COCO dataset"
    elif train_mode:
        banner = "evaluating a subset of training data on MS-COCO dataset"
    print(f"---------------------Start {banner}-----------------------")

    results = decode_split(cf, model, params, state, ann_path, vocab, decoder=decoder)
    print("#-----------------------Caption Generated-----------------------#")

    # results file naming per mode (utils.py:205-222)
    exp_dir = cf.exp_dir or "."
    if test_mode:
        name = _results_name(cf.test_pretrained_model)
        resFile = os.path.join(exp_dir, name)
    elif train_mode:
        d = os.path.join(exp_dir, "train_eval_results")
        os.makedirs(d, exist_ok=True)
        resFile = os.path.join(d, f"train_eval-{epoch}.json")
    else:
        d = os.path.join(exp_dir, "val_results")
        os.makedirs(d, exist_ok=True)
        name = f"validation-{epoch}.json"
        if valid_mode:
            name = _results_name(cf.valid_pretrained_model)
        resFile = os.path.join(d, name)
    import jax

    if jax.process_count() > 1 and jax.process_index() > 0:
        # every process scores the full split (ids were all-gathered above) —
        # give non-zero processes their own results file so a peer's write
        # never truncates the file another process is loading back
        root, ext = os.path.splitext(resFile)
        resFile = f"{root}.proc{jax.process_index()}{ext}"
    with open(resFile, "w") as f:
        json.dump(results, f)

    coco = COCO(ann_path)
    cocoRes = coco.loadRes(resFile)
    cocoEval = COCOEvalCap(coco, cocoRes)
    cocoEval.params["image_id"] = cocoRes.getImgIds()
    cocoEval.evaluate()

    if per_image_out is not None:
        per_image_out.update(cocoEval.imgToEval)

    cider = 0.0
    for metric, score in cocoEval.eval.items():
        print("%s: %.4f" % (metric, score))
        if metric == "CIDEr":
            cider = score
    return cider


def get_testOrValid_model(cf, test_mode: bool, valid_mode: bool):
    """Build the model and restore the configured checkpoint (utils.py:253-271).

    Returns (model, params, state, resolved_path) — the path with 'auto'
    resolved to the concrete checkpoint, for results-file naming."""
    from adaptive_tpu.models.factory import build_model
    from adaptive_tpu.training import checkpoint as ckpt
    import jax

    model = build_model(cf)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(cf.train_random_seed))
    path = cf.test_pretrained_model if test_mode else cf.valid_pretrained_model
    if path == "auto":
        # one-command repro: test the best checkpoint of the training run that
        # just finished in this same invocation (RUNBOOK.md). Searches the
        # experiment's trained_models dir, then the auto-resume dir.
        for d in (
            os.path.join(cf.exp_dir or ".", "trained_models"),
            getattr(cf, "train_auto_resume_dir", ""),
        ):
            found = ckpt.find_best_checkpoint(d)
            if found:
                print(f"auto-selected checkpoint: {found}")
                path = found
                break
        else:
            raise ValueError(
                "test/valid_pretrained_model='auto' found no 'cider-*_model-N' "
                "checkpoint dirs; run training first or point at a checkpoint"
            )
    if not path:
        # The reference crashes in load_state_dict on a bad path (utils.py:262-266);
        # scoring random weights silently would be strictly worse — fail loudly.
        knob = "test_pretrained_model" if test_mode else "valid_pretrained_model"
        raise ValueError(
            f"{knob} must point at a checkpoint for this mode (cfg_wzn.py:78-80,124-126)"
        )
    params, state = ckpt.restore_model(path, params, state)
    return model, params, state, path

"""CLI driver: stage dispatch gated by config flags.

Reference parity: main.py:15-69 — single `-c/--config_path` argument, stages
run in order resize -> KarpathySplit -> vocab build -> train -> valid -> test,
wall-clock report at the end. Device selection is JAX-native (no
CUDA_VISIBLE_DEVICES pinning, main.py:12); the mesh comes from the config.
"""

from __future__ import annotations

import argparse
import time
from datetime import datetime

from adaptive_tpu.config import Config, Experiment, load_config
from adaptive_tpu.utils.logging import HMS, configurationPATH


def process(cf: Config):
    if getattr(cf, "distributed_init", False):
        # multi-host: one process per host, same mesh code path over all
        # devices (DCN data parallelism; SURVEY.md §2 parallelism table)
        import jax

        jax.distributed.initialize()

    if cf.resizeOrnot:
        print(">---------resize images---------<")
        from adaptive_tpu.data.resize import main_resize_images

        main_resize_images(cf)

    if cf.KarpathySplitOrnot:
        print(">---------KarpathySplit---------<")
        from adaptive_tpu.data.karpathy_split import main_KarpathySplit

        main_KarpathySplit(cf)

    if cf.vacab_build_Ornot:
        print(">---------vocal build---------<")
        from adaptive_tpu.data.vocab import main_build_vocab

        main_build_vocab(cf)

    if cf.trainOrnot:
        print(">---------start train---------<")
        from adaptive_tpu.training import main_train

        main_train(cf)

    if cf.validOrnot:
        print(">---------start valid---------<")
        from adaptive_tpu.evalcap.coco_eval import coco_eval

        coco_eval(cf, valid_mode=True)

    if cf.testOrnot:
        print(">---------start test---------<")
        from adaptive_tpu.evalcap.coco_eval import coco_eval

        coco_eval(cf, test_mode=True)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Model training")
    parser.add_argument("-c", "--config_path", type=str, required=True,
                        help="Configuration file (.py or .json)")
    args = parser.parse_args(argv)

    print("\n > Start Time:")
    print("   " + datetime.now().strftime("%a, %d %b %Y-%m-%d %H:%M:%S"))
    start_time = time.time()

    cf = load_config(args.config_path)
    exp = Experiment(cf)
    cf = exp.setup()
    configurationPATH(cf)

    try:
        process(cf)
    finally:
        exp.teardown()

    end_time = time.time()
    print("\n > End Time:")
    print("   " + datetime.now().strftime("%a, %d %b %Y-%m-%d %H:%M:%S"))
    print("\n   ET: " + HMS(end_time - start_time))


if __name__ == "__main__":
    main()

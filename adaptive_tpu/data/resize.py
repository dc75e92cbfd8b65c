"""Offline image resize stage.

Reference parity: code_src/tools/resize.py:6-44 — resize every image in
train2014/ and val2014/ to ``resized_image_size``x``resized_image_size``
(256x256) with antialiasing into ``resized/``. On TPU the *per-step*
crop/flip/normalize moved on-device (adaptive_tpu.ops.preprocess); this stage
remains a host-side one-off because it is pure file IO.
"""

from __future__ import annotations

import os
from typing import Tuple

from PIL import Image


def resize_image(image: Image.Image, size: Tuple[int, int]) -> Image.Image:
    """PIL antialias resize (resize.py:6-8); LANCZOS == the old ANTIALIAS."""
    return image.resize(size, Image.LANCZOS)


def resize_folder_images(image_dir: str, output_dir: str, size: Tuple[int, int]):
    """Resize all images in a folder (resize.py:11-26)."""
    os.makedirs(output_dir, exist_ok=True)
    images = os.listdir(image_dir)
    num_images = len(images)
    for i, name in enumerate(images):
        src = os.path.join(image_dir, name)
        try:
            with Image.open(src) as img:
                resize_image(img.convert("RGB"), size).save(
                    os.path.join(output_dir, name), img.format or "JPEG"
                )
        except (OSError, ValueError) as e:
            print(f"skipping {src}: {e}")
        if (i + 1) % 100 == 0:
            print("[{}/{}] Resized the images and saved into '{}'.".format(i + 1, num_images, output_dir))


def main_resize_images(cf):
    """Resize train2014 + val2014 into resized/ (resize.py:29-44)."""
    size = (cf.resized_image_size, cf.resized_image_size)
    for split in ("train2014", "val2014"):
        src = os.path.join(cf.image_dir, split)
        dst = os.path.join(cf.resized_image_dir, split)
        if os.path.isdir(src):
            resize_folder_images(src, dst, size)
        else:
            print(f"resize: source dir missing, skipping: {src}")

#!/usr/bin/env bash
# MS-COCO 2014 download (reference code_src/data/download.sh:1-11 parity).
# Usage: download.sh [target_dir]
set -euo pipefail
DIR="${1:-data/MSCOCO}"
mkdir -p "$DIR/annotations"
cd "$DIR"
wget -c http://images.cocodataset.org/annotations/annotations_trainval2014.zip
wget -c http://images.cocodataset.org/zips/train2014.zip
wget -c http://images.cocodataset.org/zips/val2014.zip
unzip -o annotations_trainval2014.zip -d annotations
unzip -o train2014.zip
unzip -o val2014.zip
rm -f annotations_trainval2014.zip train2014.zip val2014.zip

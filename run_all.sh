#!/usr/bin/env bash
# Canonical train→eval run — the all.sh equivalent (reference all.sh:17-20:
# delete support cache → train → eval). Our eval builds the cache and runs in
# ONE invocation (no exit-on-build double run), so "reset cache" is just
# deleting the npz if present.
set -euo pipefail

TRAIN_JSON=${TRAIN_JSON:-datasets/coco/annotations/instances_train2017.json}
TRAIN_IMAGES=${TRAIN_IMAGES:-datasets/coco/train2017}
TEST_JSON=${TEST_JSON:-datasets/coco/annotations/instances_val2017.json}
TEST_IMAGES=${TEST_IMAGES:-datasets/coco/val2017}
SUPPORT_DIR=${SUPPORT_DIR:-datasets/coco/support}
OUTPUT=${OUTPUT:-output/fsod/vovnet_25shot}
SHOT=${SHOT:-24}

rm -f support_dir/support_feature.npz

# native COCOeval fast path (evaluation falls back to numpy if this fails)
make -C "$(dirname "$0")/native" || echo "native build failed; numpy COCOeval fallback"

if [ ! -f "$SUPPORT_DIR/support_index.json" ]; then
  python -m faster_orefsdet_tpu.cli.build_support \
    --json "$TRAIN_JSON" --images "$TRAIN_IMAGES" --out "$SUPPORT_DIR"
fi

python -m faster_orefsdet_tpu.cli.train \
  --train-json "$TRAIN_JSON" --train-images "$TRAIN_IMAGES" \
  --support-index "$SUPPORT_DIR/support_index.json" \
  --output-dir "$OUTPUT" "fs.support_shot=$SHOT" "$@"

python -m faster_orefsdet_tpu.cli.train --eval-only \
  --test-json "$TEST_JSON" --test-images "$TEST_IMAGES" \
  --support-index "$SUPPORT_DIR/support_index.json" \
  --init-npz "$OUTPUT/model_final.npz" \
  --output-dir "$OUTPUT" "fs.support_shot=$SHOT"

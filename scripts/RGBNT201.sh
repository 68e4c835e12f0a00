#!/bin/bash
# Launch wrapper for the flagship preset (reference README "Training")
cd "$(dirname "$0")/.."
python -m editor_tpu.cli.train --config_file configs/RGBNT201.yaml "$@"

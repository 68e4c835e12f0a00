#!/bin/bash
# Launch wrapper (reference: RGBNT100.sh:1-3)
cd "$(dirname "$0")/.."
python -m editor_tpu.cli.train --config_file configs/RGBNT100.yaml "$@"

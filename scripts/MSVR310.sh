#!/bin/bash
# Launch wrapper (reference: MSVR310.sh:1-3)
cd "$(dirname "$0")/.."
python -m editor_tpu.cli.train --config_file configs/MSVR310.yaml "$@"

#!/bin/sh
# Pre-commit gate (reference analogue: precommit.sh running cargo check).
# Runs the import check + fast test subset on the virtual CPU mesh.
set -e
python -c "import zebra_tpu; print('import ok', zebra_tpu.__version__)"
python -m pytest tests/ -q -x -m "not slow"

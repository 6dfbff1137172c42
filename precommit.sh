#!/bin/sh
# Pre-commit gate (reference analogue: precommit.sh running cargo check).
# Import check + a fast cross-section of the suite on the virtual CPU mesh
# (~2 min). The FULL suite is `python -m pytest tests/ -q` (~10 min).
set -e
python -c "import zebra_tpu; print('import ok', zebra_tpu.__version__)"
python -m pytest -q -x -m "not slow" \
    tests/test_config_utils.py tests/test_topk.py tests/test_distances.py \
    tests/test_hashing.py tests/test_deltalog.py tests/test_flat.py \
    tests/test_db.py tests/test_sixel.py

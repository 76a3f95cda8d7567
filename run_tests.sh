#!/bin/bash
# CPU test runner. Bypasses the axon TPU sitecustomize (which claims the TPU
# tunnel at interpreter start, ~90s) for fast pure-CPU iteration; tests force
# JAX_PLATFORMS=cpu + an 8-device virtual mesh via tests/conftest.py anyway.
cd "$(dirname "$0")"
if [ $# -eq 0 ]; then set -- tests/ -x -q; fi
exec env PYTHONPATH="$(pwd)" PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest "$@"

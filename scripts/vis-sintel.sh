#!/usr/bin/env bash
# Attention/correlation visualization pipeline (reference vis-sintel.sh:
# SAVECORR/SAVEF2 env hooks + attvis.py).  Our framework captures the tensors
# via flax 'intermediates' and renders heatmaps directly (scripts/visdump.py).
set -e
python3 scripts/visdump.py "$@"

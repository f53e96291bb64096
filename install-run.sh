#!/usr/bin/env bash
# Linux bootstrap (reference install-run.sh capability): create a venv,
# install the package + conversion deps, fetch predictor assets, launch UI.
set -euo pipefail

PYTHON=${PYTHON:-python3}
VENV_DIR=${VENV_DIR:-.venv}

if [ ! -d "$VENV_DIR" ]; then
  "$PYTHON" -m venv "$VENV_DIR"
fi
# shellcheck disable=SC1091
source "$VENV_DIR/bin/activate"

pip install -U pip
# TPU runtime; swap for jax[cpu] on non-TPU hosts
pip install -e ".[convert]" "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html || pip install -e ".[convert]"

python -m polgen_rvc_tpu.app.download_assets
exec python -m polgen_rvc_tpu.app.main --open "$@"

#!/usr/bin/env bash
# Environment bootstrap — analogue of the reference's venv script
# (scripts/setup/create_env.sh:1-38), TPU-flavoured.
#
# Creates a virtualenv, installs this package (editable) plus the JAX TPU
# wheel set, and verifies the import + device visibility.  On an air-gapped
# pod, pass a wheelhouse dir:  ./scripts/setup_env.sh -w /staging/wheels
set -euo pipefail

VENV="${VENV:-.venv}"
WHEELHOUSE=""
while getopts v:w: flag; do
    case "${flag}" in
        v) VENV=${OPTARG};;
        w) WHEELHOUSE=${OPTARG};;
        *) echo "usage: $0 [-v venv_dir] [-w wheelhouse_dir]" >&2; exit 2;;
    esac
done

REPO="$(cd "$(dirname "$0")/.." && pwd)"

python3 -m venv "${VENV}"
# shellcheck disable=SC1091
source "${VENV}/bin/activate"
python -m pip install --upgrade pip

PIP_ARGS=()
if [ -n "${WHEELHOUSE}" ]; then
    PIP_ARGS+=(--no-index --find-links "${WHEELHOUSE}")
fi

# TPU runtime: the libtpu-bundled jax wheel; falls back to CPU jax when the
# TPU extra is unavailable (dev boxes, CI).
python -m pip install "${PIP_ARGS[@]}" "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    || python -m pip install "${PIP_ARGS[@]}" jax
python -m pip install "${PIP_ARGS[@]}" -e "${REPO}"

python - <<'EOF'
import jax
import autovc_tpu
print(f"autovc_tpu ok; jax {jax.__version__}; devices: {jax.devices()}")
EOF
echo "environment ready: source ${VENV}/bin/activate"

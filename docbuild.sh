#!/bin/bash
# Build the API documentation (the analog of the reference's
# docbuild.sh sphinx build) into doc/_build/.
set -euo pipefail
cd "$(dirname "$0")"
JAX_PLATFORMS=cpu python doc/gen_docs.py
echo "open doc/_build/index.html"

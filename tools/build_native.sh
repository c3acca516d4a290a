#!/usr/bin/env bash
# Builds the native components:
#   native/build/libloader.so  — threaded input pipeline (also auto-built
#                                on first import of data.native_loader)
#   native/build/pjrt_host     — standalone PJRT serving host
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p native/build

g++ -O3 -shared -fPIC -std=c++17 -pthread \
    native/loader.cc -o native/build/libloader.so

# pjrt_c_api.h ships inside the tensorflow wheel; it's a plain C header
# with no link-time dependencies (the plugin provides the implementation).
TF_INCLUDE="$(python -c 'import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), "include"))' 2>/dev/null || true)"
if [ -n "${TF_INCLUDE}" ] && [ -f "${TF_INCLUDE}/xla/pjrt/c/pjrt_c_api.h" ]; then
  g++ -O2 -std=c++17 -I"${TF_INCLUDE}" \
      native/pjrt_host.cc -o native/build/pjrt_host -ldl
  echo "built native/build/pjrt_host"
else
  echo "pjrt_c_api.h not found; skipping pjrt_host" >&2
fi
echo "built native/build/libloader.so"

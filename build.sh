#!/bin/sh
# Cold-start build + smoke entry point (SURVEY.md §1 L8 parity with the
# reference's Dockerfile:12-19 / .travis.yml:15-16, which only prove the
# tree compiles — this additionally runs the quick test tier).
#
#   ./build.sh          build native lib + install package + quick tests
#   ./build.sh full     ... + the full suite (the merge gate)
#   ./build.sh native   native lib only
set -e
cd "$(dirname "$0")"

echo "== native =="
make -C native

if [ "$1" = "native" ]; then exit 0; fi

echo "== package =="
# Deps (jax, numpy, ...) are preinstalled in the target image; install only
# this package, no resolution, no build isolation (works offline).
python -m pip install -e . --no-deps --no-build-isolation -q

echo "== quick test tier =="
python -m pytest tests/ -q -m "not heavy and not slow" -x

if [ "$1" = "full" ]; then
    echo "== full suite =="
    python -m pytest tests/ -q
fi
echo "OK"

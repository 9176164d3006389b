#!/bin/bash
# Regenerate the golden fixture from the reference implementation.
# Compiles the reference sources into .golden-build/ (gitignored), then runs
# gen_fixture.py which drives the reference binaries.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
REF=${REFERENCE_DIR:-/root/reference}

mkdir -p "$REPO/.golden-build"
if [ ! -x "$REPO/.golden-build/src/classify" ]; then
  cp -r "$REF/src" "$REPO/.golden-build/src"
  cd "$REPO/.golden-build/src"
  # this environment lacks libbz2 headers; disable bz2 in the vendored bxzstr
  sed -i 's/#define BXZSTR_BZ2_SUPPORT 1/#define BXZSTR_BZ2_SUPPORT 0/' \
      third_party/bxzstr/include/config.hpp
  sed -i 's/LIBFLAGS = -L. -lz -lbz2/LIBFLAGS = -L. -lz/' Makefile
  make -j"$(nproc)" classify db_sort set_lcas build_taxdb count_unique \
      db_shrink dump_taxdb query_taxdb grade_classification
fi
if [ ! -e "$REPO/.golden-build/scripts/krakenlib.pm" ]; then
  # the reference Perl scripts locate krakenlib.pm (and check for classify)
  # next to themselves when the KRAKEN_DIR template is unsubstituted
  cp -r "$REF/scripts" "$REPO/.golden-build/scripts"
fi
ln -sf ../src/classify "$REPO/.golden-build/scripts/classify"

cd "$REPO"
PYTHONPATH="$REPO" python tests/golden/gen_fixture.py
PYTHONPATH="$REPO" python tests/golden/gen_fixture_extra.py

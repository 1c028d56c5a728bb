#!/bin/bash
# BCJ2 behavioral pins: our encoder's archives extracted by bsdtar
# (libarchive 3.8.2 — the independent BCJ2 reference decoder in this
# container; no 7z/p7zip/py7zr producer exists here, probe shown in
# NOTES_r18), byte-compared, then committed with a sha256 manifest.
# The FULL differential (150 corpora x 3 folder shapes; the non-"two"
# shapes are reader-generality only — libarchive supports only its
# hardcoded BCJ2 folder forms) runs with mode=full; pins commit the
# named cases + 16 fuzz samples in the libarchive-readable "two" form.
set -euo pipefail
cd "$(dirname "$0")/.."
TMP=$(mktemp -d)
sbt -batch "runMain graft.tools.Bcj2Capture $TMP pins"
OUT=src/test/resources/graft/sevenzip/bcj2
mkdir -p "$OUT"
BSDTAR=${BSDTAR:-bsdtar}
MANIFEST="$OUT/manifest.json"
echo -n '{' > "$MANIFEST"
first=1
for f in "$TMP"/bcj2_*.7z; do
  base=$(basename "$f" .7z)
  exp="$TMP/$base.expected"
  rm -rf "$TMP/x" && mkdir "$TMP/x"
  "$BSDTAR" -xf "$f" -C "$TMP/x"
  got=$(ls "$TMP/x" | head -1)
  cmp "$TMP/x/$got" "$exp"   # byte-exact or abort
  cp "$f" "$OUT/$base.7z"
  asha=$(sha256sum "$f" | cut -d' ' -f1)
  psha=$(sha256sum "$exp" | cut -d' ' -f1)
  [ $first -eq 1 ] || echo -n ',' >> "$MANIFEST"
  first=0
  echo -n "\"$base\":{\"archive_sha256\":\"$asha\",\"payload_sha256\":\"$psha\",\"bsdtar\":\"$($BSDTAR --version | awk '{print $2}')\",\"extracted\":\"byte-exact\"}" >> "$MANIFEST"
done
echo '}' >> "$MANIFEST"
echo "pinned $(ls "$OUT"/*.7z | wc -l) archives into $OUT"
rm -rf "$TMP"

#!/bin/bash
# Regenerate tests/golden/ fixtures with the reference oracle.
#
# Provenance of each fixture:
#   fix_{en,cz,hu,ru}.{par,post,rec}  -- oracle run on /root/reference/test.raw
#       (headerless lin16; EN reads it at 16 kHz per its config) with the
#       corresponding language package, at the three pipeline stages
#       (-t par / -t post / default .rec output).
#   fix_es.rec / fix_es.mlf           -- oracle run on /root/reference/test/8580.wav
#       with the test/PHN_ES package (matches /root/reference/test/test MLF).
#
# The oracle mutates its package dir (writes tmp/models, .nbin caches), so
# packages are copied to the build dir first.
set -e
ORACLE=${ORACLE:-/tmp/phnrec_oracle}
REPO=$(cd "$(dirname "$0")/.." && pwd)
OUT=$REPO/tests/golden
[ -x "$ORACLE/phnrec" ] || "$REPO/tools/build_oracle.sh" "$ORACLE"
cd "$ORACLE"
mkdir -p run "$OUT"

declare -A PKG=(
  [en]=PHN_EN_TIMIT_LCRC_N500 [cz]=PHN_CZ_SPDAT_LCRC_N1500
  [hu]=PHN_HU_SPDAT_LCRC_N1500 [ru]=PHN_RU_SPDAT_LCRC_N1500 )

for lang in en cz hu ru; do
  pkg=run/${lang}_pkg
  [ -d "$pkg" ] || { cp -r "/root/reference/${PKG[$lang]}" "$pkg"; chmod -R u+w "$pkg"; }
  ./phnrec -c "$pkg" -i /root/reference/test.raw -t par  -o "$OUT/fix_$lang.par"
  ./phnrec -c "$pkg" -i /root/reference/test.raw -t post -o "$OUT/fix_$lang.post"
  ./phnrec -c "$pkg" -i /root/reference/test.raw         -o "$OUT/fix_$lang.rec"
done

# ES: single file .rec + MLF over the package's file list
es=run/es_pkg
[ -d "$es" ] || { cp -r /root/reference/test/PHN_ES "$es"; chmod -R u+w "$es"; }
./phnrec -c "$es" -i /root/reference/test/8580.wav -o "$OUT/fix_es.rec"
echo /root/reference/test/8580.wav > run/es_list.txt
./phnrec -c "$es" -l run/es_list.txt -m "$OUT/fix_es.mlf"

# PLP fixtures: the lean PHNREC_ONLY build compiles the PLP wiring out
# (srec.cpp:563-583 under #ifndef PHNREC_ONLY), so a standalone dumper
# drives PLPCoefs directly (tools/plpdump.cpp).
cp "$REPO/tools/plpdump.cpp" .
g++ -o plpdump -I . -fpermissive -Wno-narrowing -O2 \
    plpdump.cpp plp.cpp melbanks.cpp dspc.cpp 2>/dev/null
./plpdump /root/reference/test.raw "$OUT/fix_plp_8k.txt"
./plpdump /root/reference/test.raw "$OUT/fix_plp_16k.txt" \
    16000 400 160 23 0 8000 12 0.3333333 22 10 1
echo "fixtures written to $OUT"

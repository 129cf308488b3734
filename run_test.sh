#!/bin/bash
# Smoke test, mirroring the reference's run_test.sh: build an E. coli-scale
# index, check the exact .bwt artifact size, then map simulated PE reads
# and check accuracy with the evaluator.
set -e
cd "$(dirname "$0")"
WORK=${KART_TPU_TEST_DIR:-/tmp/kart_tpu_smoke}
mkdir -p "$WORK"

echo
echo "Test1 -- Generate index files for a synthetic E.coli-scale reference"
python - "$WORK" <<'EOF'
import sys, numpy as np
work = sys.argv[1]
rng = np.random.default_rng(7)
seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=4639680)
with open(f"{work}/ecoli.fa", "wb") as f:
    f.write(b">ecoli_synthetic\n")
    s = seq.tobytes()
    for j in range(0, len(s), 70):
        f.write(s[j:j+70] + b"\n")
EOF
python -m kart_tpu.cli index "$WORK/ecoli.fa" "$WORK/EcoliIdx"

FILESIZE=$(du -sb "$WORK/EcoliIdx.bwt" | awk '{ print $1 }')
if [ "$FILESIZE" == 4639752 ]; then
    echo "[Making the index files successfully! (.bwt == 4639752 bytes)]"
else
    echo "[Failed: .bwt size $FILESIZE != 4639752]"
    exit 1
fi

echo
echo "Test2 -- Align 2000 simulated PE reads"
python tools/simulate_reads.py "$WORK/ecoli.fa" "$WORK/r1.fq" "$WORK/r2.fq" -N 2000 -l 150 -S 42
python -m kart_tpu.cli -i "$WORK/EcoliIdx" -f "$WORK/r1.fq" -f2 "$WORK/r2.fq" -o "$WORK/alignment.sam"
python tools/evaluate_sam.py "$WORK/alignment.sam"

echo
echo "Test3 -- Golden SAM equality vs reference Kart (when oracle is built)"
if [ -x .refbuild/bin/kart ]; then
    .refbuild/bin/bwt_index "$WORK/ecoli.fa" "$WORK/RefIdx" > /dev/null
    .refbuild/bin/kart -t 1 -i "$WORK/RefIdx" -f "$WORK/r1.fq" -f2 "$WORK/r2.fq" -o "$WORK/ref.sam" > /dev/null 2>&1
    if diff -q "$WORK/alignment.sam" "$WORK/ref.sam" > /dev/null; then
        echo "[SAM output is bit-identical to reference Kart]"
    else
        echo "[FAILED: SAM differs from reference]"
        exit 1
    fi
else
    echo "(reference oracle not built; skipping golden diff)"
fi

echo
echo "[End of test]"

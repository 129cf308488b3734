"""kart-tpu benchmark: Illumina PE mapping throughput on one TPU chip.

Self-bootstrapping: builds a synthetic E. coli-scale index (4,639,680 bp,
seeded) and a deterministic 20k-pair 150 bp read set with 1% base error +
indels, maps them end-to-end (device seeding + host pipeline), and prints
one JSON line.

vs_baseline denominator: reference Kart compiled from /root/reference and
measured on THIS host at -t 16 (saturating its 2 CPUs): 120,544 reads/s
on the same workload class (2026-08-17, see BASELINE.md targets).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(REPO, "bench_data")
BASELINE_REF_READS_PER_SEC = 120544.0  # 16-thread CPU kart on this host

GENOME_LEN = 4_639_680
N_PAIRS = 100_000
READ_LEN = 150
N_PASSES = 6  # report best-of (the host vCPUs are noisy/shared)


def ensure_assets():
    os.makedirs(DATA, exist_ok=True)
    fa = os.path.join(DATA, "bench_genome.fa")
    prefix = os.path.join(DATA, "bench_idx")
    sys.path.insert(0, REPO)
    from kart_tpu.index import build_index, index_files_exist

    if not os.path.exists(fa):
        rng = np.random.default_rng(7)
        seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=GENOME_LEN)
        with open(fa, "wb") as f:
            f.write(b">bench_ecoli_synthetic\n")
            s = seq.tobytes()
            for j in range(0, len(s), 70):
                f.write(s[j : j + 70] + b"\n")
    if not (index_files_exist(prefix) and os.path.exists(prefix + ".saf")):
        build_index(fa, prefix, verbose=False)

    r1 = os.path.join(DATA, "bench_r1.fq")
    r2 = os.path.join(DATA, "bench_r2.fq")

    def n_reads(path):
        if not os.path.exists(path):
            return 0
        with open(path, "rb") as f:
            return sum(1 for _ in f) // 4

    if n_reads(r1) != N_PAIRS or n_reads(r2) != N_PAIRS:
        simulate_reads(fa, r1, r2)
    return prefix, r1, r2


def simulate_reads(fa, out1, out2, err=0.01, indel=0.001):
    """Deterministic PE simulator (insert ~500, sd 50)."""
    from kart_tpu.index.format import parse_fasta

    seqs = parse_fasta(fa)
    genome = np.frombuffer(seqs[0].seq, dtype=np.uint8)
    comp = np.zeros(256, np.uint8)
    comp[np.frombuffer(b"ACGT", np.uint8)] = np.frombuffer(b"TGCA", np.uint8)
    rng = np.random.default_rng(20260817)
    L = len(genome)
    bases = np.frombuffer(b"ACGT", np.uint8)
    qline = b"I" * READ_LEN
    with open(out1, "wb") as f1, open(out2, "wb") as f2:
        for i in range(N_PAIRS):
            insert = max(2 * READ_LEN, int(rng.normal(500, 50)))
            p = int(rng.integers(0, L - insert))
            frag = genome[p : p + insert].copy()
            # base errors + occasional indels
            nerr = rng.binomial(len(frag), err)
            if nerr:
                idx = rng.integers(0, len(frag), size=nerr)
                frag[idx] = bases[rng.integers(0, 4, size=nerr)]
            if rng.random() < indel * insert:
                q = int(rng.integers(10, len(frag) - 10))
                if rng.random() < 0.5:
                    frag = np.delete(frag, slice(q, q + int(rng.integers(1, 4))))
                else:
                    ins = bases[rng.integers(0, 4, int(rng.integers(1, 4)))]
                    frag = np.insert(frag, q, ins)
            fwd = frag[:READ_LEN].tobytes()
            rev = comp[frag[-READ_LEN:][::-1]].tobytes()
            hdr = f"@{i}:Pos={p + 1}\t".encode()
            f1.write(hdr + b"/1\n" + fwd + b"\n+\n" + qline + b"\n")
            f2.write(hdr + b"/2\n" + rev + b"\n+\n" + qline + b"\n")


def main():
    prefix, r1, r2 = ensure_assets()
    from kart_tpu.index import load_index
    from kart_tpu.pipeline.mapper import KartMapper

    gidx = load_index(prefix)
    mapper = KartMapper(gidx)

    # warm-up on a small slice (builds seed tables / native ctx / compiles)
    w1 = os.path.join(DATA, "warm_r1.fq")
    w2 = os.path.join(DATA, "warm_r2.fq")
    for src, dst in ((r1, w1), (r2, w2)):
        if not os.path.exists(dst):
            with open(src, "rb") as f, open(dst, "wb") as g:
                for _ in range(2048):  # 512 reads
                    line = f.readline()
                    if not line:
                        break
                    g.write(line)
    mapper.map_stream(w1, w2, True, True, lambda s: None)

    reads_per_sec = 0.0
    for _ in range(N_PASSES):
        total0 = mapper.stats["total"]
        out_chars = 0

        def writer(s: str):
            nonlocal out_chars
            out_chars += len(s)

        t0 = time.time()
        mapper.map_stream(r1, r2, True, True, writer)
        dt = time.time() - t0
        n_reads = mapper.stats["total"] - total0
        assert out_chars > 0 and n_reads == 2 * N_PAIRS, (out_chars, n_reads)
        reads_per_sec = max(reads_per_sec, n_reads / dt)
    result = {
        "metric": "illumina_pe_reads_per_sec_per_chip",
        "value": round(reads_per_sec, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_sec / BASELINE_REF_READS_PER_SEC, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

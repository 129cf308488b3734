"""Chunk mapper: device seeding + host divide/conquer/report pipeline.

Orchestration mirror of ReadMapping/Mapping (reference: src/Mapping.cpp:
488-742): group-fused read batches seed on the TPU (batched FM or direct
13-mer scan), every occurrence expands and SA-resolves ON DEVICE
(ops/resolve.py — full-SA gather, or sampled-SA inverse-Psi walks in the
frugal KART_SA_MODE=sampled mode), and the compact resolved stream feeds
the per-read candidate/report pipeline that emits SAM records.  Paired-end
state (online insert-size estimate) follows the reference's exact update
rule."""

from __future__ import annotations

import numpy as np

from ..index.format import NT4_TABLE
from ..index.loader import GenomeIndex
from ..io.fastq import RawRead
from ..ops.fm_ref import fm_from_genome_index
from ..ops.fm_search import (
    FMIndexArrays,
    seed_scan,
    sensitive_scan,
    unpack_seed_scan,
)
from .candidates import (
    Seed,
    gen_candidates_illumina,
    gen_candidates_pacbio,
    remove_redundant_candidates,
)
from .conquer import Conquer
from .pairing import (
    check_paired_candidates,
    check_paired_final_alignments,
    remove_unmated_candidates,
    rescue_unpaired,
)
from .report import ReadState, gen_mapping_report
from .sam import evaluate_mapq, output_paired, output_single, set_paired_flags, set_single_flag

_B_BUCKETS = [2048, 16000]  # few variants: each (B, l_max) pair is a separate XLA compile
_L_BUCKETS = [64, 128, 160, 256, 384, 512]
_PB_B_BUCKETS = [16]  # PacBio chunk = 10 reads (GetData.cpp:140)
_PB_L_BUCKETS = [512, 1024, 2048, 4096, 8192, 16384, 32768]


def compute_min_seed_length(two_genome_size: int) -> int:
    """Mapping.cpp:645: smallest k in 13..15 with 4^k > 2L, else 16."""
    for m in range(13, 16):
        if two_genome_size < 4**m:
            return m
    return 16


def _bucket(x: int, buckets: list[int]) -> int:
    for b in buckets:
        if x <= b:
            return b
    return x


class KartMapper:
    def __init__(
        self,
        gidx: GenomeIndex,
        pacbio: bool = False,
        max_gaps: int = 5,
        max_insert_size: int = 1500,
        multi_hit: bool = False,
        use_device: bool = True,
        backend: str = "native",
        n_threads: int = 0,
        debug: bool = False,
        idx_shards: int = 0,
    ):
        self.gidx = gidx
        self.pacbio = pacbio
        self.max_gaps = max_gaps
        self.max_insert_size = max_insert_size
        self.multi_hit = multi_hit
        self.min_seed_len = compute_min_seed_length(gidx.two_genome_size)
        self.conquer = Conquer(gidx.ref_seq, pacbio, max_gaps)
        self.use_device = use_device
        # device arrays are materialized lazily: the native fast path never
        # touches jax, so a slow/absent accelerator cannot stall it
        self._fm_dev = None
        self.fm_ref = fm_from_genome_index(gidx)
        # SA resolution mode (VERDICT r3 #3 — memory-frugal production
        # resolver).  "full": occurrences resolve by one gather from the
        # full SA (host .saf sidecar / device copy).  "sampled": the
        # reference's own scheme — <=31 masked inverse-Psi steps over the
        # intv-32 sampled SA (src/bwt_search.cpp:128-138, bwt.c:101-123) —
        # run batched on device (ops/resolve.py sa_walk_rows) or on host
        # (fm_ref.sa_lookup); the full SA is never materialized anywhere.
        # auto: full when the .saf sidecar exists or the genome is small
        # enough to rebuild it cheaply; sampled at human scale without .saf.
        import os as _os

        sa_mode = _os.environ.get("KART_SA_MODE", "auto")
        if sa_mode == "auto":
            has_saf = bool(gidx.raw.prefix) and _os.path.exists(gidx.raw.prefix + ".saf")
            sa_mode = "full" if (has_saf or gidx.seq_len < 2**31) else "sampled"
        self.sa_mode = sa_mode
        self.sa_full_np = gidx.sa_full if sa_mode == "full" else None
        # shared counters (reference: Mapping.cpp:20)
        self.stats = dict(total=0, unique=0, unmapped=0, paired=0, distance=0)
        self.native = None
        if backend == "native":
            try:
                from ..native.post import NativePostProcessor

                self.native = NativePostProcessor(
                    gidx, pacbio, max_gaps, max_insert_size, self.min_seed_len,
                    multi_hit, n_threads=n_threads, debug=debug,
                )
            except Exception as e:
                # the python pipeline is a correct but ~50x slower fallback:
                # losing the native engine must be VISIBLE (a silent compile
                # regression once hid behind this except for a whole run)
                import sys as _sys

                print(
                    f"kart-tpu: native engine unavailable "
                    f"({type(e).__name__}: {e}); using the python pipeline",
                    file=_sys.stderr,
                )
                self.native = None
        # direct 13-mer lookup seeding engine (small-genome TPU fast path)
        self.kmer_tables = None
        self._kmer_tables_tried = False
        # mesh-sharded FM-index seeding ("tensor parallel" index): the Occ/
        # BWT slabs are block-sharded over an `idx` mesh axis of this many
        # devices and every scan step rides ONE fused psum
        # (parallel/sharded_index.py).  0/1 = replicated index.
        self.idx_shards = int(idx_shards or 0)
        self._sharded_state = None
        self._sharded_fns: dict = {}

    @property
    def fm_dev(self):
        if self._fm_dev is None and self.use_device:
            self._fm_dev = FMIndexArrays.from_genome_index(
                self.gidx,
                with_full_sa=(None if self.sa_mode == "full" else False),
            )
        return self._fm_dev

    def _get_kmer_tables(self):
        if self._kmer_tables_tried:
            return self.kmer_tables
        self._kmer_tables_tried = True
        if self.sa_mode != "full":
            # the direct-lookup tables are built around the full SA; the
            # frugal sampled-SA mode must not materialize it
            return None
        if self.idx_shards > 1:
            # sharded-index mode exists for indexes too big to replicate;
            # the 13-mer direct tables are equally oversized there, and
            # using them would bypass the sharded scan entirely
            return None
        if not (self.use_device or self.native is not None):
            return None
        # gate: multiplicities must be bounded and every 4-mer must occur so
        # sub-13 restart lengths are exact; the 4^13-int table itself is
        # genome-size independent (268MB) and cached as the .kmt sidecar,
        # so genomes up to ~600Mbp (1.2G text, int32 SA) qualify
        import os

        gate = int(os.environ.get("KART_KMER_GATE", "1200000000"))
        if self.gidx.seq_len > gate:
            return None
        try:
            from ..ops.kmer_seed import build_tables

            tb = build_tables(self.gidx)
            if tb.all_short_present and tb.max_mult <= 4096:
                self.kmer_tables = tb
        except Exception:
            self.kmer_tables = None
        return self.kmer_tables

    # ------------------------------------------------------------------
    # Seeding
    # ------------------------------------------------------------------

    def _encode(self, seq: bytes) -> np.ndarray:
        return NT4_TABLE[np.frombuffer(seq, dtype=np.uint8)].astype(np.int32)

    def _resolve_rows(self, rows: np.ndarray) -> np.ndarray:
        """SA rows -> text positions.  Full-SA gather in "full" mode; in
        the frugal "sampled" mode a batched device walk over the sampled SA
        (host fm_ref walk when no device), mirroring bwt_sa (reference
        src/BWT_Index/bwt.c:101-123)."""
        if self.sa_full_np is not None:
            return self.sa_full_np[rows].astype(np.int64)
        if self.use_device:
            import jax.numpy as jnp

            from ..ops.resolve import sa_walk_rows_jit

            n = len(rows)
            cap = max(256, 1 << int(np.ceil(np.log2(max(n, 1)))))  # shape bucket
            rows_p = np.zeros(cap, dtype=rows.dtype)
            rows_p[:n] = rows
            pos, done = sa_walk_rows_jit(self.fm_dev, jnp.asarray(rows_p))
            pos = np.asarray(pos)[:n]
            done = np.asarray(done)[:n]
            if not done.all():
                for i in np.nonzero(~done)[0]:
                    pos[i] = self.fm_ref.sa_lookup(int(rows[i]))
            return pos.astype(np.int64)
        return np.array(
            [self.fm_ref.sa_lookup(int(r)) for r in rows], dtype=np.int64
        )

    def _get_sharded(self):
        """Place the block-sharded FM-index on an `idx` mesh of
        self.idx_shards devices (once)."""
        if self._sharded_state is None:
            import jax
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            from ..parallel.sharded_index import build_sharded_fm

            devs = jax.devices()
            if len(devs) < self.idx_shards:
                raise RuntimeError(
                    f"idx_shards={self.idx_shards} but only {len(devs)} devices"
                )
            mesh = Mesh(np.array(devs[: self.idx_shards]), ("idx",))
            # frugal sampled mode: the full SA is never BUILT — shards
            # resolve rows by the sharded inverse-Psi walk over the
            # sharded intv-32 samples (VERDICT r4 #6)
            sfm, geom = build_sharded_fm(
                self.gidx, self.idx_shards, sa_mode=self.sa_mode
            )
            from ..parallel.dp import place_sharded_fm

            sfm = place_sharded_fm(sfm, mesh, "idx")
            self._sharded_state = (
                mesh, sfm, geom["nb_local"], geom["ns_local"],
                geom["nsamp_local"],
            )
        return self._sharded_state

    def _sharded_seed_resolved(self, reads, rl, max_seeds: int, l_max: int):
        """FastMode seeding against the mesh-sharded index with ON-DEVICE
        occurrence expansion + SA resolution (sharded_sa_gather psum): the
        host full SA is never touched in -idx-shards mode.  Returns the
        host (cnts, meta, gpos) resolved stream."""
        mesh, sfm, nb_local, ns_local, nsamp_local = self._get_sharded()
        B = reads.shape[0]
        budget = self._occ_budget(B, l_max)
        key = (max_seeds, l_max, budget)
        fn = self._sharded_fns.get(key)
        if fn is None:
            import jax
            from jax.sharding import PartitionSpec as P

            from ..parallel.dp import ShardedFMSpecs
            from ..parallel.sharded_index import sharded_seed_scan_resolved

            msl = np.int32(self.min_seed_len)

            def local(sfm_l, reads_l, rlens_l):
                return sharded_seed_scan_resolved(
                    sfm_l, nb_local, ns_local, "idx", reads_l, rlens_l, msl,
                    max_seeds=max_seeds, l_max=l_max, occ_budget=budget,
                    nsamp_local=nsamp_local,
                )

            fn = jax.jit(
                jax.shard_map(
                    local, mesh=mesh,
                    in_specs=(ShardedFMSpecs("idx", sfm.sa_full is not None), P(), P()),
                    out_specs=(P(), P(), P()),
                )
            )
            self._sharded_fns[key] = fn
        import jax.numpy as jnp

        cnts, meta, gpos = fn(sfm, jnp.asarray(reads), jnp.asarray(rl))
        return np.asarray(cnts), np.asarray(meta), np.asarray(gpos)

    def _seed_batch_flat(self, enc_reads: list[np.ndarray]):
        """FastMode seeding for a batch of encoded reads -> flat arrays
        (per-read counts, rpos, length, gpos) in emission x occurrence
        order (the order IdentifySeedPairs_FastMode pushes seeds, before
        its PosDiff sort)."""
        n = len(enc_reads)
        empty = (
            np.zeros(n, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int64),
        )
        if n == 0:
            return empty
        if not self.use_device:
            from ..ops.fm_ref import identify_seed_pairs_fast

            cnts = np.zeros(n, np.int32)
            rp, ln, gp = [], [], []
            for i, enc in enumerate(enc_reads):
                tuples = identify_seed_pairs_fast(self.fm_ref, enc, self.min_seed_len)
                cnts[i] = len(tuples)
                for r, l, g in tuples:
                    rp.append(r)
                    ln.append(l)
                    gp.append(g)
            return (
                cnts,
                np.array(rp, np.int32),
                np.array(ln, np.int32),
                np.array(gp, np.int64),
            )

        rlens = np.array([len(e) for e in enc_reads], dtype=np.int32)
        l_max = _bucket(int(rlens.max()), _L_BUCKETS)
        B = _bucket(n, _B_BUCKETS)
        reads = np.full((B, l_max), 4, dtype=np.int32)
        for i, e in enumerate(enc_reads):
            reads[i, : len(e)] = e[:l_max]
        rl = np.zeros(B, dtype=np.int32)
        rl[:n] = rlens
        max_seeds = l_max // (self.min_seed_len + 1) + 1
        if self.idx_shards > 1:
            # device-resolved stream: occurrences expand + resolve on the
            # mesh (sharded_sa_gather); no host full-SA access
            from ..ops.resolve import decode_resolved_counts

            cnts, meta, gpos = self._sharded_seed_resolved(reads, rl, max_seeds, l_max)
            ok, tot, offs = decode_resolved_counts(cnts)
            overrides = {
                int(i): self._reseed_host_flat(enc_reads[i])
                for i in np.nonzero(~ok[:n])[0]
            }
            res = (tot, offs, (meta & 0xFFFF).astype(np.int32),
                   ((meta >> 16) & 0xFFFF).astype(np.int32), gpos, overrides)
            return self._chunk_flat(res, 0, n)
        elif (tb := self._get_kmer_tables()) is not None:
            from ..ops.kmer_seed import kmer_seed_scan

            hit_cap = int(max(16, 1 << int(np.ceil(np.log2(tb.max_mult + 1)))))
            # covers max_mult (gate: <= 4096): the compacted-hit layout bounds
            # per-round work by the H budget, not hit_cap, so capping at 128
            # only manufactured overflow lanes (r4: 94/32k on the bench genome)
            rounds = l_max // 10 + 4
            from ..ops.kmer_seed import unpack_seed_result

            packed = np.asarray(
                kmer_seed_scan(
                    tb.table_lo,
                    tb.text_words,
                    tb.sa_full,
                    tb.sub_tbl,
                    reads,
                    rl,
                    np.int32(self.min_seed_len),
                    max_seeds=max_seeds,
                    l_max=l_max,
                    hit_cap=hit_cap,
                    rounds=rounds,
                    seq_len=tb.seq_len,
                )
            )[:n]
            out = unpack_seed_result(packed, max_seeds)
            ok = out["ok"]
            n_seeds = out["n_seeds"].copy()
            rpos = out["rpos"].copy()
            slen = out["slen"].copy()
            k0 = out["k0"].copy()
            freq = out["freq"].copy()
            if not ok.all():
                # exact re-seed of overflow/unfinished lanes with the FM stepper
                bad = np.nonzero(~ok)[0]
                nb = len(bad)
                Bb = _bucket(nb, _B_BUCKETS)
                reads_b = np.full((Bb, l_max), 4, dtype=np.int32)
                reads_b[:nb] = reads[bad]
                rl_b = np.zeros(Bb, dtype=np.int32)
                rl_b[:nb] = rl[bad]
                packed2 = np.asarray(
                    seed_scan(
                        self.fm_dev,
                        reads_b,
                        rl_b,
                        np.int32(self.min_seed_len),
                        max_seeds=max_seeds,
                        l_max=l_max,
                    )
                )[:nb]
                out2 = unpack_seed_scan(packed2, max_seeds)
                n_seeds[bad] = out2["n_seeds"]
                rpos[bad] = out2["rpos"]
                slen[bad] = out2["slen"]
                k0[bad] = out2["k0"]
                freq[bad] = out2["freq"]
        else:
            packed = np.asarray(
                seed_scan(
                    self.fm_dev,
                    reads,
                    rl,
                    np.int32(self.min_seed_len),
                    max_seeds=max_seeds,
                    l_max=l_max,
                )
            )[:n]
            out = unpack_seed_scan(packed, max_seeds)
            n_seeds = out["n_seeds"]
            rpos = out["rpos"]
            slen = out["slen"]
            k0 = out["k0"]
            freq = out["freq"]

        # flatten all occurrences, resolve with one full-SA gather
        sidx = np.arange(max_seeds)[None, :] < n_seeds[:, None]
        f = np.where(sidx, freq, 0)
        reps = f.reshape(-1)
        total = int(reps.sum())
        if total == 0:
            return empty
        base = np.repeat(k0.reshape(-1), reps)
        cum = np.cumsum(reps)
        offs = np.arange(total) - np.repeat(cum - reps, reps)
        rows = base + offs  # int64-safe: k0 carries the index dtype
        locs = self._resolve_rows(rows)
        rp_flat = np.repeat(rpos.reshape(-1), reps).astype(np.int32)
        ln_flat = np.repeat(slen.reshape(-1), reps).astype(np.int32)
        cnts = f.sum(axis=1).astype(np.int32)
        return cnts, rp_flat, ln_flat, locs

    def _seeds_to_lists(self, n, flat, key=None) -> list[list[Seed]]:
        """Flat seed arrays -> per-read sorted Seed lists (the
        python-backend representation).  Default sort: PosDiff (FastMode);
        PacBio passes key=(gpos, rpos) (CompByGenomePos)."""
        cnts, rp, ln, gp = flat
        if key is None:
            key = lambda s: (s.posdiff, s.rpos)
        result: list[list[Seed]] = []
        base = 0
        for i in range(n):
            seeds = [
                Seed(True, int(rp[base + t]), int(gp[base + t]), int(ln[base + t]),
                     int(ln[base + t]), int(gp[base + t]) - int(rp[base + t]))
                for t in range(int(cnts[i]))
            ]
            seeds.sort(key=key)
            result.append(seeds)
            base += int(cnts[i])
        return result

    def _seed_sensitive_batch_flat(self, enc_reads: list[np.ndarray]):
        """Batched device SensitiveMode seeding -> flat (cnts, rpos, len,
        gpos) arrays in emission x occurrence order (the order
        IdentifySeedPairs_SensitiveMode pushes, before its gPos sort)."""
        n = len(enc_reads)
        empty = (
            np.zeros(n, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int32),
            np.zeros(0, np.int64),
        )
        if n == 0:
            return empty
        rlens = np.array([len(e) for e in enc_reads], dtype=np.int32)
        l_max = _bucket(int(rlens.max()), _PB_L_BUCKETS)
        B = _bucket(n, _PB_B_BUCKETS)
        reads = np.full((B, l_max), 4, dtype=np.int32)
        for i, e in enumerate(enc_reads):
            reads[i, : len(e)] = e[:l_max]
        rl = np.zeros(B, dtype=np.int32)
        rl[:n] = np.minimum(rlens, l_max)
        max_seeds = l_max // self.min_seed_len + 2
        packed = np.asarray(
            sensitive_scan(
                self.fm_dev,
                reads,
                rl,
                np.int32(self.min_seed_len),
                max_seeds=max_seeds,
                l_max=l_max,
            )
        )[:n]
        out = unpack_seed_scan(packed, max_seeds)
        n_seeds, rpos, slen = out["n_seeds"], out["rpos"], out["slen"]
        k0, freq = out["k0"], out["freq"]
        sidx = np.arange(max_seeds)[None, :] < n_seeds[:, None]
        f = np.where(sidx, freq, 0)
        reps = f.reshape(-1)
        total = int(reps.sum())
        if total == 0:
            return empty
        base = np.repeat(k0.reshape(-1), reps)
        cum = np.cumsum(reps)
        offs = np.arange(total) - np.repeat(cum - reps, reps)
        rows = base + offs  # int64-safe: k0 carries the index dtype
        locs = self._resolve_rows(rows)
        rp_flat = np.repeat(rpos.reshape(-1), reps).astype(np.int32)
        ln_flat = np.repeat(slen.reshape(-1), reps).astype(np.int32)
        cnts = f.sum(axis=1).astype(np.int32)
        return cnts, rp_flat, ln_flat, locs

    def _seed_sensitive_flat(self, enc: np.ndarray):
        """SensitiveMode seeding (IdentifySeedPairs_SensitiveMode,
        AlignmentCandidates.cpp:132-169), host path; returns emission-order
        (rpos, len, gpos) tuples (before the gPos sort)."""
        rlen = len(enc)
        out: list[tuple[int, int, int]] = []
        pos, stop_pos, end_pos = 0, 30, rlen - self.min_seed_len
        while pos < end_pos:
            if enc[pos] > 3:
                pos += 1
                stop_pos += 1
            else:
                length, freq, locs = self.fm_ref.search(enc, pos, stop_pos, self.min_seed_len)
                if freq > 0:
                    for loc in locs:
                        out.append((pos, length, int(loc)))
                    pos += length
                    stop_pos += length
                else:
                    pos += self.min_seed_len
                    stop_pos += self.min_seed_len
                if stop_pos > rlen:
                    stop_pos = rlen
        return out

    def _seed_sensitive(self, enc: np.ndarray) -> list[Seed]:
        seeds = [
            Seed(True, rp, gp, ln, ln, gp - rp) for rp, ln, gp in self._seed_sensitive_flat(enc)
        ]
        seeds.sort(key=lambda s: (s.gpos, s.rpos))
        return seeds

    # ------------------------------------------------------------------
    # Chunk mapping
    # ------------------------------------------------------------------

    def _est_distance(self) -> int:
        # Mapping.cpp:533-540
        if self.stats["paired"] >= 1000:
            est = self.stats["distance"] // (self.stats["paired"] >> 2)
            return est + (est >> 1)
        return self.max_insert_size

    def _make_state(self, r: RawRead) -> ReadState:
        return ReadState(header=r.header, seq=r.seq, qual=r.qual, rlen=r.rlen)

    def map_chunk(self, chunk: list[RawRead], pair_end: bool, fastq: bool) -> list[str]:
        n = len(chunk)
        if n == 0:
            return []
        if self.native is not None:
            return self._map_chunk_native(chunk, pair_end, fastq)
        return self._map_chunk_python(chunk, pair_end, fastq)

    def map_chunks(self, chunks: list, pair_end: bool, fastq: bool) -> list[str]:
        """Map several 4000-read chunks with ONE device seeding call
        (seeding is stateless; per-chunk pairing still sees the running
        insert-size stats in reference order).  Falls back to per-chunk
        mapping for the python backend / PacBio."""
        chunks = [c for c in chunks if c]
        if not chunks:
            return []
        if self.native is None or self.pacbio or len(chunks) == 1 or self._native_seeding_ready():
            out: list[str] = []
            for c in chunks:
                out.extend(self.map_chunk(c, pair_end, fastq))
            return out
        all_reads = [r for c in chunks for r in c]
        flat = self._seed_batch_flat([self._encode(r.seq) for r in all_reads])
        cnts, rp, ln, gp = flat
        sizes = [len(c) for c in chunks]
        read_off = np.concatenate([[0], np.cumsum(sizes)])
        seed_off = np.concatenate([[0], np.cumsum(cnts)])
        out = []
        for ci, c in enumerate(chunks):
            r0, r1 = read_off[ci], read_off[ci + 1]
            s0, s1 = seed_off[r0], seed_off[r1]
            use_pairs = pair_end and len(c) % 2 == 0
            sam_text = self.native.process_chunk(
                c, use_pairs, fastq, cnts[r0:r1], rp[s0:s1], ln[s0:s1], gp[s0:s1], self.stats
            )
            self.stats["total"] += len(c)
            out.extend(sam_text.decode("ascii").splitlines())
        return out

    # ------------------------------------------------------------------
    # Device-pipelined stream: the TPU seeds dispatch-group k+1 (G fused
    # chunks — one jit call amortizes the relay's ~25 ms dispatch over
    # G*4000 reads) while the CPU post-processes and formats group k
    # (depth-1 double buffer; the native reader ring keeps both groups'
    # buffers alive).
    # ------------------------------------------------------------------

    def _occ_budget(self, B: int, l_max: int) -> int:
        """Static occurrence budget for the resolved compaction stream
        (ops/resolve.py).  Illumina reads average ~2.05 occurrences
        (measured r5, repeat-bearing bench genome; overflowing reads
        re-seed exactly), so 3x is ~50% headroom while trimming the d2h
        stream — the device pipeline's largest serial host cost — by 25%.
        PacBio sensitive seeding yields roughly one seed per ~13-30 bp
        window.  KART_OCC_BUDGET overrides the Illumina factor."""
        if self.pacbio:
            # measured r5 (5-7 kb reads, 15% error): ~19 occurrences/kb,
            # max ~30/kb; l_max/24 is ~2x headroom (overflow re-seeds)
            return B * max(64, l_max // 24)
        import os

        return int(os.environ.get("KART_OCC_BUDGET", "3")) * B

    def _dispatch_seed_async(self, reads_i8, rl, l_max):
        """Dispatch device seeding + on-device occurrence expansion + SA
        resolution for an encoded (B, l_max) int8 batch as ONE jit call
        with 2-bit packed read upload (ops/pack.py).  The device returns
        the compact resolved stream (cnts, meta, gpos) — ~9 bytes per
        occurrence through the relay instead of ~200 bytes per read.
        Returns ("resolved", futs, 0); the jax arrays are NOT materialized
        (async dispatch)."""
        import jax.numpy as jnp

        from ..ops.pack import (
            kmer_seed_scan_resolved_packed,
            pack_reads_2bit,
            seed_scan_resolved_packed,
            sensitive_scan_resolved_packed,
        )

        words, amb_r, amb_p = pack_reads_2bit(reads_i8)
        words, amb_r, amb_p = jnp.asarray(words), jnp.asarray(amb_r), jnp.asarray(amb_p)
        rl_d = jnp.asarray(rl)
        msl = np.int32(self.min_seed_len)
        B = reads_i8.shape[0]
        budget = self._occ_budget(B, l_max)
        sa_mode = self._device_sa_mode()
        if self.pacbio:
            max_seeds = l_max // self.min_seed_len + 2
            tb = self._get_kmer_tables()
            if tb is not None:
                # direct-lookup SensitiveMode: the 30-bp window caps the
                # funnel at W=4 words per hit, and the round count is
                # ~rlen/MinSeed instead of the FM stepper's ~2 trips/base
                # (a 7 kb read: ~550 rounds vs ~14k sequential steps)
                hit_cap = int(max(16, 1 << int(np.ceil(np.log2(tb.max_mult + 1)))))
                futs = kmer_seed_scan_resolved_packed(
                    tb.table_lo, tb.text_words, tb.sa_full, tb.sub_tbl,
                    words, amb_r, amb_p, rl_d, msl,
                    max_seeds=max_seeds, l_max=l_max, hit_cap=hit_cap,
                    rounds=l_max // self.min_seed_len + 8,
                    seq_len=tb.seq_len, occ_budget=budget, sensitive=True,
                    pack16=self._pack16(l_max),
                )
                return "resolved", futs, 0
            futs = sensitive_scan_resolved_packed(
                self.fm_dev, words, amb_r, amb_p, rl_d, msl,
                max_seeds=max_seeds, l_max=l_max, occ_budget=budget,
                sa_mode=sa_mode, pack16=self._pack16(l_max),
            )
            return "resolved", futs, 0
        max_seeds = l_max // (self.min_seed_len + 1) + 1
        tb = self._get_kmer_tables()
        if tb is not None:
            hit_cap = int(max(16, 1 << int(np.ceil(np.log2(tb.max_mult + 1)))))
            # covers max_mult (gate: <= 4096): the compacted-hit layout bounds
            # per-round work by the H budget, not hit_cap, so capping at 128
            # only manufactured overflow lanes (r4: 94/32k on the bench genome)
            futs = kmer_seed_scan_resolved_packed(
                tb.table_lo, tb.text_words, tb.sa_full, tb.sub_tbl,
                words, amb_r, amb_p, rl_d, msl,
                max_seeds=max_seeds, l_max=l_max,
                hit_cap=hit_cap, rounds=l_max // 10 + 4, seq_len=tb.seq_len,
                occ_budget=budget, pack16=self._pack16(l_max),
            )
            return "resolved", futs, 0
        futs = seed_scan_resolved_packed(
            self.fm_dev, words, amb_r, amb_p, rl_d, msl,
            max_seeds=max_seeds, l_max=l_max, occ_budget=budget,
            sa_mode=sa_mode, pack16=self._pack16(l_max),
        )
        return "resolved", futs, 0

    def _pack16(self, l_max: int) -> bool:
        """16-bit stream packing is exact iff rpos < 256 and slen <= 256
        (l_max <= 256) on an int32-index genome — the Illumina production
        shapes.  PacBio/i64 keep the 32-bit layout."""
        return l_max <= 256 and self.gidx.index_dtype is np.int32

    def _device_sa_mode(self) -> str:
        """The device resolver must be chosen from what the DEVICE holds,
        not from the host's sa_mode: at i64 scale the host may resolve via
        the .saf sidecar ("full") while FMIndexArrays deliberately leaves
        the 17+ GB full SA host-side (sa_full=None), so the device walks
        the sampled SA (ADVICE r4 high: sa_mode="full" with sa_full=None
        crashed human-scale device runs at trace time)."""
        return "full" if self.fm_dev.sa_full is not None else "sampled"

    def _reseed_host_flat(self, enc: np.ndarray):
        """Exact host re-seed of one read (budget/scan overflow lanes):
        emission-order (rpos, len, gpos) tuples via the host FM model,
        which resolves through the sampled SA (no full SA needed)."""
        from ..ops.fm_ref import identify_seed_pairs_fast

        if self.pacbio:
            return self._seed_sensitive_flat(enc)
        return identify_seed_pairs_fast(self.fm_ref, enc, self.min_seed_len)

    def _reseed_device_flat(self, bad, reads_i8, rl, l_max) -> dict:
        """Exact re-seed of flagged lanes as ONE small device dispatch
        through the FM stepper (no hit_cap; generous occurrence budget).
        The python host model is only the last-ditch fallback — at ~10 ms
        a read it cannot sit on the per-group path (r4 regression: 94
        flagged reads/group ran the host model and sank the device
        pipeline 5x)."""
        import jax.numpy as jnp

        from ..ops.pack import (
            pack_reads_2bit,
            seed_scan_resolved_packed,
            sensitive_scan_resolved_packed,
            unpack_stream,
        )
        from ..ops.resolve import decode_resolved_counts

        nb = len(bad)
        Bb = _bucket(nb, _B_BUCKETS if not self.pacbio else _PB_B_BUCKETS)
        reads_b = np.full((Bb, l_max), 4, dtype=np.int8)
        reads_b[:nb] = reads_i8[bad]
        rl_b = np.zeros(Bb, dtype=np.int32)
        rl_b[:nb] = rl[bad]
        words, ar, ap = pack_reads_2bit(reads_b)
        budget = Bb * 64 if not self.pacbio else self._occ_budget(Bb, l_max)
        msl = np.int32(self.min_seed_len)
        sa_mode = self._device_sa_mode()
        fn = sensitive_scan_resolved_packed if self.pacbio else seed_scan_resolved_packed
        max_seeds = (
            l_max // self.min_seed_len + 2
            if self.pacbio
            else l_max // (self.min_seed_len + 1) + 1
        )
        futs = fn(
            self.fm_dev, jnp.asarray(words), jnp.asarray(ar), jnp.asarray(ap),
            jnp.asarray(rl_b), msl, max_seeds=max_seeds, l_max=l_max,
            occ_budget=budget, sa_mode=sa_mode, pack16=self._pack16(l_max),
        )
        cnts, meta, gpos = unpack_stream(futs, Bb, budget, self._pack16(l_max))
        ok, tot, offs = decode_resolved_counts(cnts)
        out = {}
        for j, i in enumerate(bad):
            if ok[j]:
                seg = slice(int(offs[j]), int(offs[j + 1]))
                m, g = meta[seg], gpos[seg]
                out[int(i)] = [
                    # logical >>16: a 32768-length seed sets meta's sign bit
                    (int(mm & 0xFFFF), int(mm >> 16) & 0xFFFF, int(gg))
                    for mm, gg in zip(m, g)
                ]
            else:  # budget overflow even in the re-seed batch: host model
                out[int(i)] = self._reseed_host_flat(
                    reads_i8[i, : rl[i]].astype(np.int32)
                )
        return out

    def _finalize_seed(self, kind, futs, n, max_seeds, reads_i8, rl, l_max,
                       host=None):
        """Materialize a dispatched resolved-seeding batch.  Returns
        (tot, offs, rpos, slen, gpos, overrides): flat per-occurrence
        arrays plus exact host re-seeds for flagged reads.  `host` may
        carry the already-materialized (cnts, meta, gpos) from the
        pipeline's d2h helper thread."""
        from ..ops.pack import unpack_stream
        from ..ops.resolve import decode_resolved_counts

        B = reads_i8.shape[0]
        if host is not None:
            cnts, meta, gpos = host
        else:
            cnts, meta, gpos = unpack_stream(
                futs, B, self._occ_budget(B, l_max), self._pack16(l_max)
            )
        ok, tot, offs = decode_resolved_counts(cnts)
        rpos = (meta & 0xFFFF).astype(np.int32)
        slen = ((meta >> 16) & 0xFFFF).astype(np.int32)  # logical shift: slen 32768 sets the sign bit
        overrides = {}
        if not ok[:n].all():
            bad = np.nonzero(~ok[:n])[0]
            overrides = self._reseed_device_flat(bad, reads_i8, rl, l_max)
        return (tot, offs, rpos, slen, gpos, overrides)

    @staticmethod
    def _chunk_flat(res, r0, r1):
        """Slice the resolved stream for reads [r0, r1) -> per-chunk
        (cnt, rpos, slen, gpos) arrays, splicing in host re-seeds."""
        tot, offs, rpos, slen, gpos, overrides = res
        s0, s1 = int(offs[r0]), int(offs[r1])
        keys = [i for i in overrides if r0 <= i < r1]
        if not keys:
            return (
                tot[r0:r1],
                rpos[s0:s1],
                slen[s0:s1],
                gpos[s0:s1].astype(np.int64),
            )
        cnt = tot[r0:r1].copy()
        rp_parts, ln_parts, gp_parts = [], [], []
        for i in range(r0, r1):
            if i in overrides:
                tuples = overrides[i]
                cnt[i - r0] = len(tuples)
                if tuples:
                    a = np.array(tuples, dtype=np.int64)
                    rp_parts.append(a[:, 0].astype(np.int32))
                    ln_parts.append(a[:, 1].astype(np.int32))
                    gp_parts.append(a[:, 2])
            else:
                seg = slice(int(offs[i]), int(offs[i + 1]))
                rp_parts.append(rpos[seg])
                ln_parts.append(slen[seg])
                gp_parts.append(gpos[seg].astype(np.int64))
        cat = lambda parts, dt: (
            np.concatenate(parts) if parts else np.zeros(0, dt)
        )
        return (
            cnt,
            cat(rp_parts, np.int32),
            cat(ln_parts, np.int32),
            cat(gp_parts, np.int64),
        )

    def _read_group(self, reader, G):
        group = []
        while len(group) < G:
            n, ptrs = reader.next_chunk()
            if n == 0:
                break
            group.append((n, ptrs))
        return group

    def _encode_group(self, group, l_buckets, b_buckets):
        """Encode G reader chunks into ONE fused (B, l_max) int8 batch."""
        import ctypes

        total = sum(n for n, _ in group)
        l_raw = 0
        for n, ptrs in group:
            off = np.ctypeslib.as_array(
                ctypes.cast(ptrs[1], ctypes.POINTER(ctypes.c_int64)),
                shape=(n + 1,),
            )
            l_raw = max(l_raw, int(np.diff(off).max()))
        l_max = _bucket(l_raw, l_buckets)
        B = _bucket(total, b_buckets)
        reads = np.full((B, l_max), 4, dtype=np.int8)
        rlens = np.zeros(B, dtype=np.int32)
        row = 0
        for n, ptrs in group:
            self.native.encode_reads_into(n, ptrs, reads, rlens, row, l_max)
            row += n
        return reads, rlens, l_max

    def _map_stream_device(self, path1, path2, pair_end, fastq, writer,
                           progress=None) -> None:
        from ..native.post import NativeReader

        l_buckets = _PB_L_BUCKETS if self.pacbio else _L_BUCKETS
        b_buckets = _PB_B_BUCKETS if self.pacbio else _B_BUCKETS
        import os

        # PacBio chunks are 10 reads; amortizing the relay dispatch and the
        # sensitive funnel's ~per-round fixed cost needs far more lanes in
        # flight than Illumina's 4000-read chunks
        g_default = "64" if self.pacbio else "8"
        G = max(1, int(os.environ.get("KART_DEVICE_GROUP", g_default)))
        # fused-group batch buckets: steady state is G full chunks
        chunk_sz = 10 if self.pacbio else 4000
        b_buckets = sorted(set(b_buckets + [G * chunk_sz]))
        # occurrence expansion + SA resolution happen ON DEVICE
        # (ops/resolve.py); the native side consumes the resolved flat
        # stream and never touches an SA.
        # Pipeline depth 2: group k seeds on the device while group k-1's
        # resolved stream is in flight to the host (copy_to_host_async,
        # requested as soon as k is dispatched) and group k-2 is being
        # post-processed — the d2h transfer (the largest serial host cost,
        # ~0.9 MB/group at ~10-30 MB/s through the relay) overlaps the CPU
        # post instead of preceding it.
        depth = max(1, int(os.environ.get("KART_DEVICE_DEPTH", "2")))
        # ring: depth in-flight groups + the group being posted + prefetch
        reader = NativeReader(path1, path2, fastq, pair_end, self.pacbio,
                              n_bufs=(depth + 2) * G + 2)
        device_ok = True  # cleared if the relay/worker dies mid-stream

        def _device_died(exc) -> bool:
            """Device/relay failure -> native fallback; host-side bugs
            (index/type/attribute errors in the unpack path) must surface,
            not silently reroute the run (ADVICE r3)."""
            if isinstance(exc, (IndexError, TypeError, AttributeError, KeyError)):
                return False
            if not self._native_seeding_ready():
                return False
            import sys

            print(
                f"kart-tpu: device seeding failed ({type(exc).__name__}: {exc}); "
                "continuing on the native engine",
                file=sys.stderr,
            )
            return True

        import threading

        def _start_host_copy(entry):
            """Stage the resolved stream's d2h early: request the device
            copy (non-blocking) AND materialize the numpy arrays on a
            helper thread — the blocking relay read then overlaps the
            native post of an older group (C++ releases the GIL)."""
            if entry["kind"] is None or entry["thread"] is not None:
                return
            try:
                import jax

                for arr in jax.tree.leaves(entry["fut"]):
                    arr.copy_to_host_async()
            except Exception:
                pass

            def work():
                try:
                    from ..ops.pack import unpack_stream

                    B = entry["ri"].shape[0]
                    entry["host"] = unpack_stream(
                        entry["fut"], B, self._occ_budget(B, entry["lm"]),
                        self._pack16(entry["lm"]),
                    )
                except Exception as e:  # surfaced at finalize
                    entry["err"] = e

            t = threading.Thread(target=work, daemon=True)
            entry["thread"] = t
            t.start()

        def _post_group(entry, cur_ref):
            nonlocal device_ok
            group0, kind0 = entry["group"], entry["kind"]
            packed = None
            if kind0 is not None:
                n_tot = sum(n for n, _ in group0)
                try:
                    if entry["thread"] is not None:
                        entry["thread"].join()
                    if entry.get("err") is not None:
                        raise entry["err"]
                    packed = self._finalize_seed(
                        kind0, entry["fut"], n_tot, entry["ms"],
                        entry["ri"], entry["rl"], entry["lm"],
                        host=entry.get("host"),
                    )
                except Exception as e:
                    # the TPU worker / axon relay died mid-stream: a
                    # mapper must not lose the run over it.  The kmer
                    # seed tables back the native engine too, so the
                    # remaining groups flow through the all-native
                    # pipeline (exact same SAM output).
                    if not _device_died(e):
                        raise
                    device_ok = False
                    for ent in cur_ref:
                        ent["kind"] = None
            if packed is not None:
                row = 0
                for n0, ptrs0 in group0:
                    if progress is not None:
                        progress(self.stats["total"])
                    cnt, rp, ln, gp = self._chunk_flat(packed, row, row + n0)
                    writer(
                        self.native.process_chunk_flat(
                            n0, pair_end and n0 % 2 == 0 and not self.pacbio,
                            fastq, ptrs0, cnt, rp, ln, gp, self.stats,
                        )
                    )
                    self.stats["total"] += n0
                    row += n0
            else:
                if not self._native_seeding_ready():
                    raise RuntimeError(
                        "device seeding unavailable and no native fallback"
                    )
                for n0, ptrs0 in group0:
                    if progress is not None:
                        progress(self.stats["total"])
                    writer(
                        self.native.process_chunk_ptrs(
                            n0, pair_end, fastq, ptrs0, self.stats
                        )
                    )
                    self.stats["total"] += n0

        try:
            pend: list = []
            eof = False
            while not eof or pend:
                if not eof:
                    group = self._read_group(reader, G)
                    if not group:
                        eof = True
                    else:
                        cur = dict(group=group, kind=None, fut=None, ms=0,
                                   ri=None, rl=None, lm=0, host=None,
                                   thread=None, err=None)
                        if device_ok:
                            # dispatch is wrapped like finalize: if the
                            # relay dies BETWEEN groups, the run continues
                            # natively (ADVICE r3)
                            try:
                                reads_i8, rl, l_max = self._encode_group(
                                    group, l_buckets, b_buckets
                                )
                                kind, fut, ms = self._dispatch_seed_async(
                                    reads_i8, rl, l_max
                                )
                                cur.update(kind=kind, fut=fut, ms=ms,
                                           ri=reads_i8, rl=rl, lm=l_max)
                            except Exception as e:
                                if not _device_died(e):
                                    raise
                                device_ok = False
                        pend.append(cur)
                        if len(pend) >= 2:
                            # previous group's compute is ahead of the one
                            # just dispatched: stage its d2h now
                            _start_host_copy(pend[-2])
                if pend and (eof or len(pend) > depth):
                    if eof and len(pend) == 1:
                        _start_host_copy(pend[0])
                    _post_group(pend.pop(0), pend)
        finally:
            reader.close()

    def map_stream(self, path1: str, path2: str | None, pair_end: bool,
                   fastq: bool, writer, progress=None) -> None:
        """Map one whole library (file or file pair), streaming SAM text to
        `writer`.

        Paths, fastest applicable first:
          * KART_SEED_MODE=device — depth-1 pipelined: device seeding of
            chunk k+1 (kmer engine or FM/sensitive scan) overlapped with
            native post-processing + formatting of chunk k;
          * native (default) — native chunked reader feeding the native
            seed/post pipeline zero-copy, no accelerator involvement;
          * Python reader + batched device seeding when the native engine
            is unavailable."""
        import os

        mode = os.environ.get("KART_SEED_MODE", "native")
        if (
            mode == "device"
            and self.native is not None
            and self.use_device
            # the resolved flat stream carries int64 text positions, so
            # human-scale (i64) indexes take this path too
        ):
            return self._map_stream_device(path1, path2, pair_end, fastq, writer, progress)
        if self._native_seeding_ready():
            from ..native.post import NativeReader

            reader = NativeReader(path1, path2, fastq, pair_end, self.pacbio)
            try:
                while True:
                    n, ptrs = reader.next_chunk()
                    if n == 0:
                        break
                    if progress is not None:
                        progress(self.stats["total"])
                    writer(
                        self.native.process_chunk_ptrs(
                            n, pair_end, fastq, ptrs, self.stats
                        )
                    )
                    self.stats["total"] += n
            finally:
                reader.close()
            return

        from ..io.fastq import ReadStream, next_chunk

        s1 = ReadStream(path1, fastq)
        s2 = ReadStream(path2, fastq) if path2 else None
        try:
            done = False
            while not done:
                group = []
                while len(group) < 4:
                    chunk = next_chunk(s1, s2, pair_end, self.pacbio)
                    if not chunk:
                        done = True
                        break
                    group.append(chunk)
                if not group:
                    break
                if progress is not None:
                    progress(self.stats["total"])
                for line in self.map_chunks(group, pair_end, fastq):
                    writer(line + "\n")
        finally:
            s1.close()
            if s2:
                s2.close()

    def _native_seeding_ready(self) -> bool:
        if self.native is None:
            return False
        tb = self._get_kmer_tables()
        if tb is not None:
            if not getattr(self.native, "has_seed_tables", False):
                self.native.set_seed_tables(tb)
            return True
        if self.idx_shards > 1:
            # the user asked for mesh-sharded seeding (-idx-shards): the
            # native fallback would silently bypass the mesh
            return False
        # No direct tables (human-scale genome past the kmer gate, or the
        # frugal KART_SA_MODE=sampled): seed natively with the FM stepper +
        # inverse-Psi sampled-SA walks — the reference's own scheme
        # (src/bwt_search.cpp, bwt.c:101-123), reference-class memory, no
        # .saf and no full SA anywhere (VERDICT r4 missing #2).
        if not getattr(self.native, "has_fm_index", False):
            self.native.set_fm_index(self.gidx)
        return True

    def _map_chunk_native(self, chunk: list[RawRead], pair_end: bool, fastq: bool) -> list[str]:
        n = len(chunk)
        if self._native_seeding_ready():
            use_pairs = pair_end and n % 2 == 0
            sam_text = self.native.process_chunk(
                chunk, use_pairs, fastq, None, None, None, None, self.stats
            )
            self.stats["total"] += n
            return sam_text.decode("ascii").splitlines()
        if self.pacbio:
            if self.use_device:
                flat = self._seed_sensitive_batch_flat([self._encode(r.seq) for r in chunk])
            else:
                cnts = np.zeros(n, np.int32)
                rp, ln, gp = [], [], []
                for i, r in enumerate(chunk):
                    tuples = self._seed_sensitive_flat(self._encode(r.seq))
                    cnts[i] = len(tuples)
                    for a, b, c in tuples:
                        rp.append(a)
                        ln.append(b)
                        gp.append(c)
                flat = (
                    cnts, np.array(rp, np.int32), np.array(ln, np.int32),
                    np.array(gp, np.int64),
                )
        else:
            flat = self._seed_batch_flat([self._encode(r.seq) for r in chunk])
        use_pairs = pair_end and n % 2 == 0 and not self.pacbio
        sam_text = self.native.process_chunk(
            chunk, use_pairs, fastq, flat[0], flat[1], flat[2], flat[3], self.stats
        )
        self.stats["total"] += n
        return sam_text.decode("ascii").splitlines()

    def _batch_nw(self, report_jobs) -> None:
        """Batched device conquer: dry-run the report pass on deep copies to
        collect every NW fragment pair the chunk will need (NW inputs are
        NW-independent: repartition precedes the DP, decisions follow it),
        run them as ONE device NW batch (ops/nw.py Pallas kernel), and
        prime the conquer memo consumed by the real pass.  Best-effort: a
        memo miss in the real pass falls back to the host DP."""
        import copy
        import os

        if os.environ.get("KART_BATCH_NW") != "1":
            return
        keys: set = set()
        self.conquer.collecting = keys
        try:
            for first_read, st, cands in report_jobs:
                st_copy = ReadState(
                    header=st.header, seq=st.seq, qual=st.qual, rlen=st.rlen
                )
                gen_mapping_report(
                    self.gidx, self.conquer, first_read, st_copy,
                    copy.deepcopy(cands), self.pacbio, self.multi_hit,
                )
        finally:
            self.conquer.collecting = None
        if keys:
            from ..ops.nw import nw_align_batch

            pairs = sorted(keys)  # deterministic batch order
            self.conquer.nw_memo = dict(zip(pairs, nw_align_batch(pairs)))

    def _device_cluster(self, states, seeds_all):
        """Batched device candidate clustering (KART_DEVICE_CLUSTER=1,
        Illumina FastMode only); None -> host clustering."""
        import os

        if os.environ.get("KART_DEVICE_CLUSTER") != "1" or not self.use_device:
            return None
        from ..ops.cluster import cluster_batch_to_candidates

        return cluster_batch_to_candidates(
            self.gidx, seeds_all, [st.rlen for st in states], self.max_gaps
        )

    def _device_pair(self, est: int, cands_all: list):
        """Batched device PE mating for the whole chunk
        (KART_DEVICE_PAIR=1); None -> host pairing.  Applies the
        reference's >1000 candidate-product pre-prune on host first
        (Mapping.cpp:356-360)."""
        import os

        if os.environ.get("KART_DEVICE_PAIR") != "1" or not self.use_device:
            return None
        from ..ops.pairing import pair_chunk_on_device

        pairs = []
        for i in range(0, len(cands_all), 2):
            c1, c2 = cands_all[i], cands_all[i + 1]
            if len(c1) * len(c2) > 1000:
                remove_redundant_candidates(c1, pacbio=False)
                remove_redundant_candidates(c2, pacbio=False)
            pairs.append((c1, c2))
        return pair_chunk_on_device(est, pairs)

    def _map_chunk_python(self, chunk: list[RawRead], pair_end: bool, fastq: bool) -> list[str]:
        n = len(chunk)
        sam: list[str] = []
        my = dict(unique=0, unmapped=0, paired=0, distance=0)
        if self.pacbio:
            states = []
            seeds_dev = None
            if self.use_device:
                flat = self._seed_sensitive_batch_flat([self._encode(r.seq) for r in chunk])
                seeds_dev = self._seeds_to_lists(n, flat, key=lambda s: (s.gpos, s.rpos))
            cands_all = []
            for ri, r in enumerate(chunk):
                states.append(self._make_state(r))
                enc = self._encode(r.seq)
                seeds = seeds_dev[ri] if seeds_dev is not None else self._seed_sensitive(enc)
                cands = gen_candidates_pacbio(r.rlen, seeds)
                remove_redundant_candidates(cands, pacbio=True)
                cands_all.append(cands)
            self._batch_nw([(True, states[i], cands_all[i]) for i in range(n)])
            for ri, st in enumerate(states):
                gen_mapping_report(
                    self.gidx, self.conquer, True, st, cands_all[ri], True, self.multi_hit
                )
                set_single_flag(st)
                evaluate_mapq(st, pacbio=True)
            self.conquer.nw_memo = None
            for st in states:
                sam.extend(output_single(self.gidx, st, fastq, self.multi_hit, my))
        elif pair_end and n % 2 == 0:
            est = self._est_distance()
            seeds_all = self._seeds_to_lists(
                n, self._seed_batch_flat([self._encode(r.seq) for r in chunk])
            )
            states = [self._make_state(r) for r in chunk]
            dev_cands = self._device_cluster(states, seeds_all)
            cands_all: list = [None] * n
            for i in range(0, n, 2):
                j = i + 1
                st1, st2 = states[i], states[j]
                if dev_cands is not None:
                    cands1, cands2 = dev_cands[i], dev_cands[j]
                else:
                    cands1 = gen_candidates_illumina(
                        st1.rlen, seeds_all[i], self.gidx, self.max_gaps
                    )
                    cands2 = gen_candidates_illumina(
                        st2.rlen, seeds_all[j], self.gidx, self.max_gaps
                    )
                cands_all[i], cands_all[j] = cands1, cands2
            pairing_flags = self._device_pair(est, cands_all)
            for i in range(0, n, 2):
                j = i + 1
                st1, st2 = states[i], states[j]
                cands1, cands2 = cands_all[i], cands_all[j]
                if pairing_flags is not None:
                    pairing = pairing_flags[i // 2]
                else:
                    pairing = check_paired_candidates(est, cands1, cands2)
                if not pairing:
                    pairing = rescue_unpaired(
                        self.gidx,
                        est,
                        self.max_insert_size,
                        self.max_gaps,
                        st1,
                        st2,
                        cands1,
                        cands2,
                    )
                if pairing:
                    remove_unmated_candidates(cands1, cands2)
                remove_redundant_candidates(cands1, pacbio=False)
                remove_redundant_candidates(cands2, pacbio=False)
                cands_all[i], cands_all[j] = cands1, cands2
            self._batch_nw(
                [(i % 2 == 0, states[i], cands_all[i]) for i in range(n)]
            )
            for i in range(0, n, 2):
                j = i + 1
                st1, st2 = states[i], states[j]
                gen_mapping_report(
                    self.gidx, self.conquer, True, st1, cands_all[i], False, self.multi_hit
                )
                gen_mapping_report(
                    self.gidx, self.conquer, False, st2, cands_all[j], False, self.multi_hit
                )
                check_paired_final_alignments(st1, st2, self.multi_hit)
                set_paired_flags(st1, st2)
                evaluate_mapq(st1, pacbio=False)
                evaluate_mapq(st2, pacbio=False)
            self.conquer.nw_memo = None
            for i in range(0, n, 2):
                sam.extend(
                    output_paired(self.gidx, states[i], states[i + 1], fastq, self.multi_hit, my)
                )
        else:
            seeds_all = self._seeds_to_lists(
                n, self._seed_batch_flat([self._encode(r.seq) for r in chunk])
            )
            states = [self._make_state(r) for r in chunk]
            dev_cands = self._device_cluster(states, seeds_all)
            cands_all = []
            for i, st in enumerate(states):
                if dev_cands is not None:
                    cands = dev_cands[i]
                else:
                    cands = gen_candidates_illumina(
                        st.rlen, seeds_all[i], self.gidx, self.max_gaps
                    )
                remove_redundant_candidates(cands, pacbio=False)
                cands_all.append(cands)
            self._batch_nw([(True, states[i], cands_all[i]) for i in range(n)])
            for i, st in enumerate(states):
                gen_mapping_report(
                    self.gidx, self.conquer, True, st, cands_all[i], False, self.multi_hit
                )
                set_single_flag(st)
                evaluate_mapq(st, pacbio=False)
            self.conquer.nw_memo = None
            for st in states:
                sam.extend(output_single(self.gidx, st, fastq, self.multi_hit, my))
        self.stats["total"] += n
        self.stats["unique"] += my["unique"]
        self.stats["unmapped"] += my["unmapped"]
        self.stats["paired"] += my["paired"]
        self.stats["distance"] += my["distance"]
        return sam

"""BAM output: decode our BGZF+BAM with an independent parser and compare
record-for-record with the SAM output of the same run."""

import gzip
import struct
import subprocess

import numpy as np
import pytest

from conftest import make_genome

from kart_tpu import cli as kart_cli

_OPS = "MIDNSHP=X"
_NT16 = "=ACMGRSVTWYHKDBN"


def decode_bam(path):
    """Minimal independent BAM reader (BGZF is gzip-member-compatible)."""
    with open(path, "rb") as f:
        raw = f.read()
    data = gzip.decompress(raw)  # concatenated gzip members
    assert data[:4] == b"BAM\x01"
    off = 4
    (l_text,) = struct.unpack_from("<i", data, off)
    off += 4
    header_text = data[off : off + l_text].decode()
    off += l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    refs = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4
        refs.append(data[off : off + l_name - 1].decode())
        off += l_name
        off += 4  # l_ref
    records = []
    while off < len(data):
        (block_size,) = struct.unpack_from("<i", data, off)
        off += 4
        end = off + block_size
        (ref_id, pos, l_qname, mapq, _bin, n_cig, flag, l_seq, next_ref, next_pos,
         tlen) = struct.unpack_from("<iiBBHHHiiii", data, off)
        p = off + 32
        qname = data[p : p + l_qname - 1].decode()
        p += l_qname
        cig = []
        for _ in range(n_cig):
            (op,) = struct.unpack_from("<I", data, p)
            p += 4
            cig.append(f"{op >> 4}{_OPS[op & 0xF]}")
        cigar = "".join(cig) if cig else "*"
        seq = ""
        for i in range(l_seq):
            b = data[p + i // 2]
            seq += _NT16[(b >> 4) if i % 2 == 0 else (b & 0xF)]
        p += (l_seq + 1) // 2
        qual_raw = data[p : p + l_seq]
        p += l_seq
        qual = (
            "*"
            if l_seq == 0 or all(q == 0xFF for q in qual_raw)
            else "".join(chr(q + 33) for q in qual_raw)
        )
        tags = []
        while p < end:
            tg = data[p : p + 2].decode()
            ty = chr(data[p + 2])
            p += 3
            if ty in "cC":
                v = struct.unpack_from("<b" if ty == "c" else "<B", data, p)[0]
                p += 1
                tags.append(f"{tg}:i:{v}")
            elif ty in "sS":
                v = struct.unpack_from("<h" if ty == "s" else "<H", data, p)[0]
                p += 2
                tags.append(f"{tg}:i:{v}")
            elif ty in "iI":
                v = struct.unpack_from("<i" if ty == "i" else "<I", data, p)[0]
                p += 4
                tags.append(f"{tg}:i:{v}")
            elif ty == "A":
                tags.append(f"{tg}:A:{chr(data[p])}")
                p += 1
            elif ty == "f":
                (v,) = struct.unpack_from("<f", data, p)
                p += 4
                tags.append(f"{tg}:f:{v}")
            elif ty == "Z":
                z = data.index(b"\x00", p)
                tags.append(f"{tg}:Z:{data[p:z].decode()}")
                p = z + 1
            else:
                raise AssertionError(f"unhandled tag type {ty}")
        rname = refs[ref_id] if ref_id >= 0 else "*"
        rnext = "*" if next_ref < 0 else ("=" if next_ref == ref_id else refs[next_ref])
        fields = [qname, str(flag), rname, str(pos + 1), str(mapq), cigar, rnext,
                  str(next_pos + 1), str(tlen), seq, qual] + tags
        records.append("\t".join(fields))
        off = end
    return header_text, records


@pytest.fixture(scope="module")
def bam_fixture(workdir, small_genome):
    from kart_tpu.index import build_index, index_files_exist

    prefix = workdir / "small_idx"
    if not index_files_exist(str(prefix)):
        build_index(str(small_genome), str(prefix), verbose=False)
    # simulate a few reads
    rng = np.random.default_rng(3)
    fa = small_genome.read_text()
    seq = "".join(l for l in fa.splitlines() if not l.startswith(">"))[:60000]
    r1 = workdir / "bam_r1.fq"
    with open(r1, "w") as f:
        for i in range(300):
            p = int(rng.integers(0, len(seq) - 100))
            f.write(f"@r{i}\n{seq[p:p+100]}\n+\n{'I'*100}\n")
    return prefix, r1


def test_bam_matches_sam(bam_fixture, workdir):
    prefix, r1 = bam_fixture
    sam_out = workdir / "bam_test.sam"
    bam_out = workdir / "bam_test.bam"
    assert kart_cli.main(["kart-tpu", "-i", str(prefix), "-f", str(r1),
                          "-o", str(sam_out), "-silent"]) == 0
    assert kart_cli.main(["kart-tpu", "-i", str(prefix), "-f", str(r1),
                          "-bo", str(bam_out), "-silent"]) == 0
    header, records = decode_bam(str(bam_out))
    sam_lines = sam_out.read_text().splitlines()
    sam_header = [l for l in sam_lines if l.startswith("@")]
    sam_records = [l for l in sam_lines if not l.startswith("@")]
    assert header == "\n".join(sam_header) + "\n"
    assert len(records) == len(sam_records)
    for got, want in zip(records, sam_records):
        # unmapped SAM records print pos/pnext as 0 (-1 + 1 == 0 round-trips)
        assert got == want, (got, want)

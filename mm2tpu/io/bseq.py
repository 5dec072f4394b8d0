"""FASTA/FASTQ(.gz) batch reader (reference: bseq.c / kseq.h).

Reads records with kseq semantics: name is the first whitespace-delimited
token after '>'/'@', the remainder of the header line is the comment.
Supports mini-batching by base count (bseq.c:80 mm_bseq_read3) and
fragment grouping by read-name stem (bseq.c mm_qname_same).
"""
from __future__ import annotations

import gzip
import io as _io
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence


@dataclass
class Seq:
    name: str
    seq: str
    qual: Optional[str] = None
    comment: Optional[str] = None
    rid: int = -1

    @property
    def l_seq(self) -> int:
        return len(self.seq)


def _open_maybe_gz(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return _io.TextIOWrapper(gzip.GzipFile(fileobj=f))
    return _io.TextIOWrapper(f)


def read_fastx(path: str) -> Iterator[Seq]:
    """Yield all records from a fasta/fastq file, transparently gunzipping."""
    with _open_maybe_gz(path) as f:
        yield from parse_fastx(f)


def parse_fastx(f) -> Iterator[Seq]:
    """Fast whole-buffer parse with a fallback to the exact line-by-line
    parser for anything structurally unusual (blank lines inside fastq,
    mixed fasta/fastq, whitespace inside sequence lines) and for streams
    too large to slurp (stays line-by-line, bounded memory)."""
    # slurp threshold: genome-scale FASTAs (hg38 ~3.1 GB) take the
    # vectorized whole-buffer path — the line parser costs ~40 ns/byte,
    # ~25x the split-based path; truly unbounded streams stay streaming
    _SLURP_MAX = 6 << 30
    data = f.read(_SLURP_MAX)
    if not data:
        return
    if len(data) == _SLURP_MAX:  # oversized stream: exact streaming parse
        yield from _parse_fastx_lines(_ChainReader(data, f))
        return
    i = 0
    while i < len(data) and data[i] in "\r\n \t":
        i += 1
    data = data[i:]
    if data.startswith(">") and "\n@" not in data:
        for ch in data[1:].split("\n>"):
            head, _, body = ch.partition("\n")
            seq = body.replace("\n", "")
            if "\r" in seq:
                seq = seq.replace("\r", "")
            if " " in seq or "\t" in seq:  # exact per-line strip semantics
                seq = "".join(l.strip() for l in body.splitlines())
            name, _, comment = head.partition(" ")
            if not comment:
                name, _, comment = head.partition("\t")
            yield Seq(name=name.split()[0] if name else "", seq=seq,
                      comment=comment or None)
        return
    if data.startswith("@"):
        # split on \n only: the exact parser keeps \r in header fields
        lines = data.split("\n")
        if lines and lines[-1] == "":
            lines.pop()
        if len(lines) % 4 == 0 and \
                all(l.startswith("@") for l in lines[0::4]) and \
                all(l.startswith("+") for l in lines[2::4]):
            for j in range(0, len(lines), 4):
                head = lines[j][1:]
                name, _, comment = head.partition(" ")
                yield Seq(name=name, seq=lines[j + 1].strip(),
                          qual=lines[j + 3].strip() or None,
                          comment=comment or None)
            return
    yield from _parse_fastx_lines(_io.StringIO(data))


class _ChainReader:
    """readline() over a prefetched prefix then the live stream."""

    def __init__(self, prefix: str, f):
        self._sio = _io.StringIO(prefix)
        self._f = f

    def readline(self) -> str:
        line = self._sio.readline()
        if line and not line.endswith("\n"):  # prefix ended mid-line
            return line + self._f.readline()
        if line:
            return line
        return self._f.readline()


def _parse_fastx_lines(f) -> Iterator[Seq]:
    line = f.readline()
    while line:
        line = line.rstrip("\n")
        if not line:
            line = f.readline()
            continue
        if line.startswith(">"):  # fasta
            head = line[1:]
            name, _, comment = head.partition(" ")
            if not comment:
                name, _, comment = head.partition("\t")
            parts: List[str] = []
            line = f.readline()
            while line and not line.startswith((">", "@")):
                parts.append(line.strip())
                line = f.readline()
            yield Seq(name=name.split()[0] if name else "", seq="".join(parts),
                      comment=comment or None)
        elif line.startswith("@"):  # fastq
            head = line[1:]
            name, _, comment = head.partition(" ")
            seq = f.readline().strip()
            f.readline()  # '+'
            qual = f.readline().strip()
            yield Seq(name=name, seq=seq, qual=qual or None,
                      comment=comment or None)
            line = f.readline()
        else:
            line = f.readline()


def qname_same(a: str, b: str) -> bool:
    """True if two read names differ only in a trailing /1 vs /2 style digit
    (bseq.c mm_qname_same / mm_qname_len)."""
    return _qname_len(a) == _qname_len(b) and a[: _qname_len(a)] == b[: _qname_len(b)]


def _qname_len(s: str) -> int:
    l = len(s)
    if l >= 3 and s[l - 2] == "/" and s[l - 1].isdigit():
        return l - 2
    return l


_COMP = str.maketrans("ACGTUacgtuRYSWKMBDHVNryswkmbdhvn",
                      "TGCAAtgcaaYRSWMKVHDBNyrswmkvhdbn")


def revcomp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


class FastxReader:
    """Mini-batch reader: groups of records totalling ~batch_bases bases
    (map.c:530-557 step 0), with optional fragment grouping."""

    def __init__(self, paths: Sequence[str], batch_bases: int = 500_000_000,
                 frag_mode: bool = False):
        self.paths = list(paths)
        self.batch_bases = batch_bases
        self.frag_mode = frag_mode
        self._n_processed = 0

    def batches(self) -> Iterator[List[List[Seq]]]:
        """Yield batches; each batch is a list of fragments (lists of Seqs)."""
        it = self._records()
        batch: List[Seq] = []
        nbase = 0
        for s in it:
            s.rid = self._n_processed
            self._n_processed += 1
            batch.append(s)
            nbase += s.l_seq
            if nbase >= self.batch_bases:
                yield self._group(batch)
                batch, nbase = [], 0
        if batch:
            yield self._group(batch)

    def _records(self) -> Iterator[Seq]:
        if len(self.paths) > 1 and not self.frag_mode:
            # without frag mode files are processed one after another
            # (main.c:404-407, one mm_map_file per file)
            for p in self.paths:
                yield from read_fastx(p)
            return
        if len(self.paths) > 1:  # interleave round-robin (mm_bseq_read_frag2)
            its = [read_fastx(p) for p in self.paths]
            while True:
                recs = []
                for it in its:
                    r = next(it, None)
                    if r is not None:
                        recs.append(r)
                if not recs:
                    return
                yield from recs
        else:
            yield from read_fastx(self.paths[0])

    def _group(self, batch: List[Seq]) -> List[List[Seq]]:
        if not self.frag_mode:
            return [[s] for s in batch]
        frags: List[List[Seq]] = []
        j = 0
        for i in range(1, len(batch) + 1):
            if i == len(batch) or not qname_same(batch[i - 1].name, batch[i].name):
                frags.append(batch[j:i])
                j = i
        return frags

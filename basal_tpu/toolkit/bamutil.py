"""Minimal samtools-equivalent operations over our own BAM codec, so the
reference's pipeline recipes (basal_pipeline_examples/*.sh) run without an
external samtools/sambamba:

  view  -F <flags> / --include-flags <flags>, SAM<->BAM
  sort  coordinate sort
  fastq BAM -> FASTQ (mate-aware naming)
"""

from __future__ import annotations

import gzip
import sys
from typing import List, Optional

from .bamio import BamWriter, decode_bam_to_sam


def _read_any(path: str) -> List[str]:
    if path.upper().endswith(".BAM"):
        return decode_bam_to_sam(path).splitlines()
    return open(path).read().splitlines()


def _write_any(lines: List[str], path: Optional[str]):
    text = "\n".join(lines) + ("\n" if lines else "")
    if path is None:
        sys.stdout.write(text)
    elif path.upper().endswith(".BAM"):
        with BamWriter(path) as bw:
            bw.write(text)
    else:
        with open(path, "w") as f:
            f.write(text)


def view(path: str, out: Optional[str] = None, exclude_flags: int = 0,
         include_flags: int = 0, with_header: bool = True,
         header_only: bool = False):
    lines = _read_any(path)
    res = []
    for l in lines:
        if not l:
            continue
        if l.startswith("@"):
            if with_header or header_only:
                res.append(l)
            continue
        if header_only:  # samtools view -H: header lines only
            continue
        flag = int(l.split("\t", 2)[1])
        if exclude_flags and (flag & exclude_flags):
            continue
        if include_flags and not (flag & include_flags):
            continue
        res.append(l)
    _write_any(res, out)


def sort(path: str, out: str):
    lines = _read_any(path)
    header = [l for l in lines if l.startswith("@")]
    chrs = {}
    for l in header:
        if l.startswith("@SQ"):
            d = dict(f.split(":", 1) for f in l.split("\t")[1:])
            chrs[d["SN"]] = len(chrs)
    recs = [l for l in lines if l and not l.startswith("@")]
    recs.sort(key=lambda l: (
        chrs.get(l.split("\t")[2], 1 << 30), int(l.split("\t")[3])))
    _write_any(header + recs, out)


def to_fastq(path: str, out: Optional[str] = None):
    from ..align.sam import revcomp
    lines = _read_any(path)
    opener = (gzip.open(out, "wt") if out and out.endswith(".gz")
              else open(out, "w") if out else sys.stdout)
    try:
        for l in lines:
            if not l or l.startswith("@"):
                continue
            f = l.split("\t")
            flag = int(f[1])
            seq, qual = f[9], f[10]
            if flag & 0x10:
                seq = revcomp(seq)
                qual = qual[::-1]
            name = f[0]
            if flag & 0x40:
                name += "/1"
            elif flag & 0x80:
                name += "/2"
            opener.write(f"@{name}\n{seq}\n+\n{qual}\n")
    finally:
        if out:
            opener.close()


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: bamutil {view|sort|fastq} ...", file=sys.stderr)
        return 1
    cmd, rest = argv[0], argv[1:]
    import argparse
    if cmd == "view":
        p = argparse.ArgumentParser(prog="bamutil view")
        p.add_argument("input")
        p.add_argument("-o", "--out", default=None)
        p.add_argument("-F", type=lambda x: int(x, 0), default=0,
                       dest="exclude")
        p.add_argument("--include-flags", type=lambda x: int(x, 0), default=0)
        p.add_argument("-H", action="store_true", dest="header_only")
        a = p.parse_args(rest)
        view(a.input, a.out, a.exclude, a.include_flags,
             header_only=a.header_only)
    elif cmd == "sort":
        p = argparse.ArgumentParser(prog="bamutil sort")
        p.add_argument("input")
        p.add_argument("-o", "--out", required=True)
        a = p.parse_args(rest)
        sort(a.input, a.out)
    elif cmd == "fastq":
        p = argparse.ArgumentParser(prog="bamutil fastq")
        p.add_argument("input")
        p.add_argument("-o", "--out", default=None)
        a = p.parse_args(rest)
        to_fastq(a.input, a.out)
    else:
        print(f"unknown bamutil command: {cmd}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

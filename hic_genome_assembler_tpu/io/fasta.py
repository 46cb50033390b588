"""FASTA reading, reverse complement, and fixed-width sequence writing.

Byte-format contract (writeAssembledFasta.py:10-74): 50 chars per line,
no trailing blank line for sequences whose length is a multiple of the
width, reverse complement defined for ACGTN upper/lower ONLY (any other
IUPAC code raises, matching the reference's KeyError behavior at
writeAssembledFasta.py:59-63).
"""

from __future__ import annotations

import gzip
from typing import Dict

_COMPLEMENT = bytes.maketrans(b"ATGCatgcNn", b"TACGtacgNn")
_VALID = frozenset(b"ATGCatgcNn")


def read_fasta(path: str) -> Dict[str, str]:
    """Whole FASTA (plain or .gz) into {name: sequence}
    (writeAssembledFasta.py:10-32)."""
    opener = gzip.open if ".gz" in path else open
    seqs: Dict[str, list] = {}
    name = None
    with opener(path, mode="rt") as handle:
        for line in handle:
            line = line.strip("\r").strip("\n")
            if not line:
                continue
            if line[0] == ">":
                name = line[1:]
                seqs[name] = []
            else:
                seqs[name].append(line)
    return {n: "".join(parts) for n, parts in seqs.items()}


def reverse_complement(seq: str) -> str:
    """Reverse complement over the strict ACGTN alphabet
    (writeAssembledFasta.py:55-63)."""
    raw = seq.encode("ascii")
    bad = set(raw) - _VALID
    if bad:
        raise KeyError(chr(sorted(bad)[0]))
    return raw.translate(_COMPLEMENT)[::-1].decode("ascii")


def write_wrapped_seq(handle, seq: str, chars_per_line: int = 50) -> None:
    """Fixed-width sequence emission (writeAssembledFasta.py:65-74)."""
    for start in range(0, len(seq), chars_per_line):
        handle.write(seq[start : start + chars_per_line] + "\n")

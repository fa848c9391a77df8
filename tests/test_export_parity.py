"""Mechanical export-parity check against the reference's export lists.

Every non-mutating name exported by any module under
/root/reference/src must be reachable at `dsptpu` top level (or on
`dsptpu.windows` for window functions). Mutating `!` variants have no
functional-JAX counterpart by design (arrays are immutable; the
streaming state contract replaces in-place filters).
"""

import glob
import os

import pytest

import dsptpu

REF_SRC = "/root/reference/src"


def _reference_exports():
    names = set()
    for f in glob.glob(os.path.join(REF_SRC, "**", "*.jl"), recursive=True):
        lines = open(f).read().split("\n")
        i = 0
        while i < len(lines):
            line = lines[i].strip()
            if line.startswith("export"):
                acc = line[len("export"):]
                while acc.rstrip().endswith(","):
                    i += 1
                    acc += lines[i]
                for n in acc.split(","):
                    n = n.strip().split("#")[0].strip()
                    if n:
                        names.add(n)
            i += 1
    return names


@pytest.mark.skipif(not os.path.isdir(REF_SRC),
                    reason="reference checkout not present")
def test_every_reference_export_is_available():
    names = _reference_exports()
    assert len(names) > 100  # sanity: the extraction found the lists
    have = set(dir(dsptpu)) | set(dir(dsptpu.windows))
    missing = sorted(n for n in names
                     if not n.endswith("!") and n not in have)
    assert missing == [], f"missing reference exports: {missing}"

"""cs-walk edge cases: introns near record start (the reference's
negative-slice quirk), multiple introns in the ±10 window (last wins),
no intron in range, empty cs."""

import numpy as np
import pytest

import oracle
from mandalorion_tpu.core.csparse import (
    EQ, build_cs_index, splice_context)

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference tree not mounted")


@pytest.fixture(scope="module")
def sdc():
    return oracle.load_sdc()


CASES = [
    # (cs, genome_start, window_start, window_end)
    ("=ACGTA~gt100ag=CCCCC", 1000, 1004, 1006),       # intron right of window
    ("=AC~gt50ag=GGGGGGGG", 1000, 1001, 1003),        # intron at index 2 (<5)
    ("=ACGTACGT~gt30ag=CC~gt40ag=TTTT", 1000, 1040, 1042),  # two introns
    ("=ACGTACGTACGT", 1000, 1005, 1007),              # no intron at all
    ("*ac*tg=ACGT~gt25ag=CCCCCC", 1000, 1005, 1007),  # subs before intron
    ("=AAAA+ggg=TTTT~at60ac=CCCC", 1000, 1007, 1009), # insertion + noncanon
    ("=ACGT", 1000, 5000, 5002),                      # window out of range
]


@pytest.mark.parametrize("cs,gstart,ws,we", CASES)
def test_splice_context_matches_reference(sdc, cs, gstart, ws, we):
    ref_bases, ref_left, ref_right = sdc.getCSaroundSS(cs, gstart, ws, we)
    idx = build_cs_index(cs, gstart)
    bases, left, right = splice_context(idx, ws, we)
    assert bases == ref_bases
    # reference returns lists of (status, base); we return status codes —
    # compare statuses (the only field consumed, SDC.py:530-539)
    # '|' = an intron record inside the flank window (two-intron case)
    code = {"=": 0, "+": 1, "-": 2, "*": 3, "|": 4}
    if not ref_left:
        assert left is None or len(left) == 0
    else:
        assert [code[t[0]] for t in ref_left] == list(left)
    if not ref_right:
        assert right is None or len(right) == 0
    else:
        assert [code[t[0]] for t in ref_right] == list(right)


def test_empty_cs():
    idx = build_cs_index("", 0)
    assert splice_context(idx, 0, 10)[0] == "nnnn"

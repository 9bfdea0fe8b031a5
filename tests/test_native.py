"""Native C++ vs numpy minimizer equality (bit-identical contract)."""

import numpy as np
import pytest

import synthdata
from mandalorion_tpu.align.encode import _minimizers_numpy, encode
from mandalorion_tpu.native import load_native, native_minimizers

pytestmark = pytest.mark.skipif(load_native() is None,
                                reason="no native toolchain")


@pytest.mark.parametrize("seed,length", [(1, 500), (2, 5000), (3, 64)])
def test_native_matches_numpy(seed, length):
    codes = encode(synthdata.make_genome(length, seed=seed))
    p1, h1 = _minimizers_numpy(codes, 15, 5)
    p2, h2 = native_minimizers(codes, 15, 5)
    assert np.array_equal(p1, p2)
    assert np.array_equal(h1, h2)


def test_native_with_n_bases():
    seq = synthdata.make_genome(400, seed=4)
    seq = seq[:100] + "N" * 5 + seq[105:300] + "N" + seq[301:]
    codes = encode(seq)
    p1, h1 = _minimizers_numpy(codes, 15, 5)
    p2, h2 = native_minimizers(codes, 15, 5)
    assert np.array_equal(p1, p2)
    assert np.array_equal(h1, h2)


def test_native_short_and_empty():
    for seq in ["", "ACG", "ACGTACGTACGTACG", "ACGTACGTACGTACGT"]:
        codes = encode(seq)
        p1, h1 = _minimizers_numpy(codes, 15, 5)
        p2, h2 = native_minimizers(codes, 15, 5)
        assert np.array_equal(p1, p2) and np.array_equal(h1, h2), seq


def test_encode_seq_native():
    lib = load_native()
    seq = b"ACGTNacgtnX"
    out = np.empty(len(seq), np.uint8)
    lib.encode_seq(seq, len(seq), out.ctypes.data)
    assert list(out) == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4, 4]

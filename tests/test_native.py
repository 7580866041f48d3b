"""C++ dnaio core vs numpy fallbacks."""

import numpy as np
import pytest

from dna_tpu.data import native
from dna_tpu.data.fasta import reverse_complement as py_rc
from dna_tpu.data.tokenizers import CharTokenizer
from dna_tpu.data.twobit import decode_row, encode_row


def test_native_builds():
    assert native.available(), "g++ build of libdnaio.so failed"


def test_2bit_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(5):
        seq = "".join(rng.choice(list("ACGT"), int(rng.integers(1, 100))))
        packed_c, pad_c = native.encode_2bit(seq)
        packed_py, _, pad_py = encode_row(seq)
        assert packed_c == packed_py
        assert pad_c == pad_py
        assert native.decode_2bit(packed_c, len(seq)) == seq
        assert decode_row(packed_py, pad_py) == seq


def test_char_tokenize_matches_python():
    tok = CharTokenizer()
    seq = "ACGTNacgtnXY"
    np.testing.assert_array_equal(native.char_tokenize(seq), tok.encode(seq))


def test_batch_tokenize():
    tok = CharTokenizer()
    seqs = ["ACGT", "GG", "ACGTACGTACGT"]
    out = native.char_tokenize_batch(seqs, 8, pad_id=tok.pad_token_id,
                                     pad_left=True)
    assert out.shape == (3, 8)
    expected = np.stack([tok.pad(tok.encode(s), 8) for s in seqs])
    np.testing.assert_array_equal(out, expected)


def test_reverse_complement_matches():
    seq = "ACGTNacgtn"
    assert native.reverse_complement(seq) == py_rc(seq)

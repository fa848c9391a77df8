"""Native streaming reader tests: chunked file streaming through the
stateful FIRFilter must equal one-shot filtering."""

from fractions import Fraction

import numpy as np
import pytest

import dsptpu
from dsptpu.native import StreamReader, native_available


@pytest.fixture
def sample_file(tmp_path):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(100_000).astype(np.float32)
    p = tmp_path / "stream.f32"
    x.tofile(p)
    return str(p), x


def test_native_compiles():
    assert native_available(), "C++ toolchain should be available"


def test_reads_whole_file(sample_file):
    path, x = sample_file
    chunks = []
    with StreamReader(path, chunk=8192) as sr:
        for c in sr:
            chunks.append(c)
    got = np.concatenate(chunks)
    np.testing.assert_array_equal(got, x)
    assert len(chunks) == -(-len(x) // 8192)


def test_multichannel_chunks(sample_file, tmp_path):
    rng = np.random.default_rng(8)
    x = rng.standard_normal((5000, 4)).astype(np.float32)
    p = tmp_path / "mc.f32"
    x.tofile(p)  # interleaved
    with StreamReader(str(p), chunk=700, channels=4) as sr:
        got = np.concatenate(list(sr), axis=0)
    np.testing.assert_array_equal(got, x)


def test_streaming_pipeline_matches_oneshot(sample_file):
    path, x = sample_file
    ratio = Fraction(3, 2)
    h = np.asarray(dsptpu.resample_filter(ratio)).astype(np.float32)
    whole = np.asarray(dsptpu.FIRFilter(h, ratio).filt(x))
    sf = dsptpu.FIRFilter(h, ratio)
    parts = []
    with StreamReader(path, chunk=10_000) as sr:
        for c in sr:
            parts.append(np.asarray(sf.filt(c)))
    got = np.concatenate(parts)
    np.testing.assert_allclose(got, whole, atol=1e-6)

"""Native C AWQ repacker vs the numpy reference path."""
import numpy as np
import pytest

from umbrella_tpu.quantization.awq import pack_awq_numpy, unpack_awq_numpy
from umbrella_tpu.quantization.native import (
    repack_weights_native, unpack_zeros_native)


def test_native_repack_matches_numpy():
    rng = np.random.default_rng(0)
    K, N, g = 256, 128, 64
    int_w = rng.integers(0, 16, size=(K, N)).astype(np.int8)
    int_z = rng.integers(0, 16, size=(K // g, N)).astype(np.int8)
    qweight, qzeros = pack_awq_numpy(int_w, int_z)

    w8 = repack_weights_native(qweight)
    if w8 is None:
        pytest.skip("no C compiler available")
    # split-halves: low nibble = rows [0, K/2), high nibble = rows [K/2, K)
    np.testing.assert_array_equal(w8 & 0xF, int_w[: K // 2].astype(np.uint8))
    np.testing.assert_array_equal(w8 >> 4, int_w[K // 2 :].astype(np.uint8))

    zeros = unpack_zeros_native(qzeros)
    np.testing.assert_array_equal(zeros, int_z.astype(np.float32))


def test_native_repack_large_roundtrip_speed():
    rng = np.random.default_rng(1)
    K, N = 1024, 1024
    int_w = rng.integers(0, 16, size=(K, N)).astype(np.int8)
    int_z = rng.integers(0, 16, size=(K // 128, N)).astype(np.int8)
    qweight, qzeros = pack_awq_numpy(int_w, int_z)
    w8 = repack_weights_native(qweight)
    if w8 is None:
        pytest.skip("no C compiler available")
    ref_w, _ = unpack_awq_numpy(qweight, qzeros)
    np.testing.assert_array_equal(w8 & 0xF, ref_w[: K // 2].astype(np.uint8))
    np.testing.assert_array_equal(w8 >> 4, ref_w[K // 2 :].astype(np.uint8))

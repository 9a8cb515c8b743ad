"""Counting-rank (sort-free binning) correctness vs numpy stable argsort."""

import jax.numpy as jnp
import numpy as np
import pytest

from cloth_splatting_tpu.ops.sort import counting_rank, quantize_depth, rank_permutation


class TestCountingRank:
    @pytest.mark.parametrize("b,buckets,chunk", [(100, 7, 16), (1000, 50, 128),
                                                 (5000, 2501, None)])
    def test_matches_stable_argsort(self, b, buckets, chunk):
        rng = np.random.default_rng(b)
        keys = rng.integers(0, buckets, size=b).astype(np.int32)
        pos = np.asarray(counting_rank(jnp.asarray(keys), buckets, chunk))
        # positions must be a permutation
        assert sorted(pos.tolist()) == list(range(b))
        # element i at position pos[i] == stable argsort semantics
        order = np.argsort(keys, kind="stable")
        expected_pos = np.empty(b, np.int64)
        expected_pos[order] = np.arange(b)
        np.testing.assert_array_equal(pos, expected_pos)

    def test_all_same_key(self):
        keys = jnp.zeros(257, jnp.int32)
        pos = np.asarray(counting_rank(keys, 4, 64))
        np.testing.assert_array_equal(pos, np.arange(257))

    def test_rank_permutation_inverse(self):
        rng = np.random.default_rng(0)
        keys = jnp.asarray(rng.integers(0, 9, 300), jnp.int32)
        rank, inverse = rank_permutation(keys, 10, 64)
        np.testing.assert_array_equal(np.asarray(rank)[np.asarray(inverse)],
                                      np.arange(300))

    def test_quantize_depth_ordering(self):
        depth = jnp.asarray([5.0, 1.0, 3.0, jnp.inf])
        valid = jnp.asarray([True, True, True, False])
        b = np.asarray(quantize_depth(depth, valid, 128))
        assert b[1] < b[2] < b[0]
        assert b[3] == 127

"""Unit tests for the batched U-Net execution engine (runtime/engine.py):
shape bucketing, bit-packed mask transfers, and run/run_numpy agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lungmask_tpu.models import unet
from lungmask_tpu.runtime import engine


pytestmark = pytest.mark.slow  # deselect with -m "not slow" for the smoke tier

def test_bucket_chunks_family():
    # 5-smooth family {1,2,3,5}·2^k, smallest ≥ n
    expected = {
        1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 6, 7: 8, 8: 8, 9: 10, 10: 10,
        11: 12, 12: 12, 13: 16, 16: 16, 17: 20, 20: 20, 21: 24, 24: 24,
        25: 32, 33: 40,
    }
    for n, want in expected.items():
        assert engine.bucket_chunks(n) == want, n
    # padding waste bounded by ~33% (gaps 3→4, 6→8 in the {1,2,3,5}·2^k family)
    for n in range(1, 200):
        assert engine.bucket_chunks(n) / n <= 1.34


def test_split_parts_cover_and_shapes():
    for n in range(1, 64):
        parts = engine.split_parts(n)
        assert sum(parts) == n
        assert all(p in (1, 2, 3) for p in parts)
        assert parts.count(1) == (1 if n == 1 else 0)
    assert engine.split_parts(0) == []


def test_pack_roundtrips(rng):
    dense = rng.integers(0, 4, (3, 8, 16)).astype(np.uint8)
    quads = dense.reshape(3, 8, 4, 4)
    packed2 = (
        quads[..., 0] | (quads[..., 1] << 2) | (quads[..., 2] << 4) | (quads[..., 3] << 6)
    )
    assert np.array_equal(engine.unpack_crumbs(packed2), dense)
    dense16 = rng.integers(0, 16, (2, 4, 10)).astype(np.uint8)
    pairs = dense16.reshape(2, 4, 5, 2)
    packed4 = pairs[..., 0] | (pairs[..., 1] << 4)
    assert np.array_equal(engine.unpack_nibbles(packed4), dense16)


@pytest.fixture(scope="module")
def small_runner():
    params = unet.init_params(jax.random.PRNGKey(0), n_classes=3)
    return engine.UNetRunner(params, 3, batch_size=2, compute_dtype=jnp.float32)


@pytest.mark.parametrize("n", [1, 2, 5, 7, 11])
def test_run_numpy_matches_run(small_runner, rng, n):
    """run_numpy (split dispatches + bit-packed downloads) must agree exactly
    with the single-dispatch dense path for every bucket/split shape."""
    x = jnp.asarray(rng.uniform(0, 1, (n, 64, 64)).astype(np.float32))
    dense = np.asarray(small_runner.run(x))
    packed = small_runner.run_numpy(x)
    assert packed.shape == (n, 64, 64)
    assert np.array_equal(dense, packed)


def test_default_chunk_when_batch_size_none():
    params = unet.init_params(jax.random.PRNGKey(1), n_classes=3)
    r = engine.UNetRunner(params, 3)
    assert r.batch_size == engine.DEFAULT_CHUNK
    r2 = engine.UNetRunner(params, 3, batch_size=7)
    assert r2.batch_size == 7


def test_packing_choice_by_classes():
    params = unet.init_params(jax.random.PRNGKey(1), n_classes=3)
    r3 = engine.UNetRunner(params, 3)
    assert r3._packing(256)[0] is engine.volume_argmax_packed2
    r6 = engine.UNetRunner(params, 6)
    assert r6._packing(256)[0] is engine.volume_argmax_packed
    assert r3._packing(255)[1]("x") == "x"  # odd width: dense passthrough


def test_pair_packed_matches_dense():
    """Per-model bit-packed dual forward must unpack to the dense pair
    (2-bit for a 3-class model, 4-bit for a 6-class one)."""
    import jax
    import jax.numpy as jnp

    from lungmask_tpu.models import unet
    from lungmask_tpu.runtime.engine import (
        pack_bits_for,
        unpack_bits_np,
        volume_argmax_pair,
        volume_argmax_pair_packed,
    )

    pa = unet.init_params(jax.random.PRNGKey(0), n_classes=3, wf=2, depth=3)
    pb = unet.init_params(jax.random.PRNGKey(1), n_classes=6, wf=2, depth=3)
    vol = jax.random.uniform(jax.random.PRNGKey(2), (4, 32, 32))
    da, db = volume_argmax_pair(pa, pb, vol, 2, jnp.float32)
    bits_a, bits_b = pack_bits_for(3, 32), pack_bits_for(6, 32)
    assert (bits_a, bits_b) == (2, 4)
    ka, kb = volume_argmax_pair_packed(pa, pb, vol, 2, jnp.float32, bits_a, bits_b)
    np.testing.assert_array_equal(unpack_bits_np(np.asarray(ka), 2), np.asarray(da))
    np.testing.assert_array_equal(unpack_bits_np(np.asarray(kb), 4), np.asarray(db))

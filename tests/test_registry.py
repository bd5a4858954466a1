"""Weight-store integrity: cached checkpoints are verified, not trusted.

Covers the ADVICE round-1 finding that a pre-existing cached .pth (or a
converted .npz) was loaded without any checksum verification.
"""

import jax
import numpy as np
import pytest

from lungmask_tpu.models import convert, registry, unet


@pytest.fixture()
def cache(tmp_path, monkeypatch):
    monkeypatch.setenv("LUNGMASK_TPU_CACHE", str(tmp_path))
    return tmp_path


def test_cached_pth_with_bad_sha_rejected(cache):
    """A manually placed (e.g. truncated) .pth must fail the sha gate before
    conversion is attempted."""
    url, _ = registry.MODEL_URLS["R231"]
    pth = cache / url.rsplit("/", 1)[1]
    pth.write_bytes(b"not a real checkpoint")
    with pytest.raises(RuntimeError, match="Checksum mismatch"):
        registry.get_model("R231")


# The sha-gate tests exercise cache metadata policy, not the network; a tiny
# architecture keeps them in the smoke tier (get_model's npz path reads
# whatever pytree is stored and takes n_classes from the final bias).
# Module-scoped: the PRNG-init compiles are paid once for the file.
@pytest.fixture(scope="module")
def tiny_params():
    # Registry tests only need a structurally-valid pytree (sha gates, cache
    # round-trips) — materialize zeros from eval_shape instead of paying the
    # PRNG-init compiles (~10 s on this host) for values nothing reads.
    shapes = jax.eval_shape(
        lambda: unet.init_params(jax.random.PRNGKey(0), 3, depth=2, wf=2)
    )
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def test_npz_meta_sha_mismatch_rejected(cache, tiny_params):
    """A converted cache whose recorded source sha disagrees with the registry
    must be refused."""
    params = tiny_params
    npz = registry._npz_cache_path("R231")
    convert.save_npz(npz, params, meta={"source_sha256": "feedface" * 8})
    with pytest.raises(RuntimeError, match="sha256"):
        registry.get_model("R231")


def test_npz_meta_sha_match_accepted(cache, tiny_params):
    params = tiny_params
    npz = registry._npz_cache_path("R231")
    # The registry pins only the 8-hex-char prefix from the filename.
    convert.save_npz(npz, params, meta={"source_sha256": "d5d2fc3d" + "0" * 56})
    loaded, n = registry.get_model("R231")
    assert n == 3
    np.testing.assert_array_equal(
        np.asarray(loaded["last"]["b"]), np.asarray(params["last"]["b"])
    )


def test_npz_without_meta_still_loads(cache, tiny_params):
    """Round-1 caches carry no sha; they must keep working."""
    params = tiny_params
    convert.save_npz(registry._npz_cache_path("R231"), params, meta={})
    _, n = registry.get_model("R231")
    assert n == 3

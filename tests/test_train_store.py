"""SliceStore: disk-backed training slice pool (memmap) tests."""

import numpy as np
import pytest

from lungmask_tpu.train.data import SliceDataset
from lungmask_tpu.train.store import SliceStore, build_store, build_store_from_files

pytestmark = pytest.mark.slow

from test_train_data import _pair  # noqa: E402


def test_store_matches_in_memory_dataset(tmp_path):
    """Store batches must equal SliceDataset batches up to fp16 image
    round-off (same preprocessing, same shuffle for the same seed)."""
    pairs = [_pair(0), _pair(1)]
    ds = SliceDataset(pairs, resolution=(64, 64))
    store = build_store(str(tmp_path / "store"), iter(pairs), resolution=(64, 64))
    assert len(store) == len(ds) == 6

    got = list(store.batches(4, seed=3, epochs=2))
    want = list(ds.batches(4, seed=3, epochs=2))
    assert len(got) == len(want) == 2
    for (gi, gl), (wi, wl) in zip(got, want):
        assert gi.dtype == np.float32 and gl.dtype == np.int32
        np.testing.assert_array_equal(gl, wl)  # labels exact
        np.testing.assert_allclose(gi, wi, atol=6e-4)  # fp16 storage


def test_store_from_files_and_reopen(tmp_path):
    from lungmask_tpu.io.image import MedicalImage
    from lungmask_tpu.io.loader import write_image

    file_pairs = []
    for i in range(2):
        vol, mask = _pair(i, n=4, hw=64)
        vp = str(tmp_path / f"v{i}.nii.gz")
        mp = str(tmp_path / f"v{i}_mask.nii.gz")
        write_image(MedicalImage(vol), vp)
        write_image(MedicalImage(mask), mp)
        file_pairs.append((vp, mp))

    sd = str(tmp_path / "store")
    build_store_from_files(sd, file_pairs, resolution=(64, 64))
    store = SliceStore(sd)  # reopen from disk
    assert len(store) == 8
    im, lb = next(store.batches(8, seed=0))
    assert im.shape == (8, 64, 64, 1) and lb.shape == (8, 64, 64)
    assert set(np.unique(lb)) <= {0, 1}


def test_store_drives_fit(tmp_path):
    """fit() accepts a SliceStore interchangeably with SliceDataset."""
    import optax

    import jax
    import jax.numpy as jnp

    from lungmask_tpu.models import unet
    from lungmask_tpu.train import fit

    store = build_store(
        str(tmp_path / "store"), iter([_pair(7, n=8, hw=64)]), resolution=(64, 64)
    )
    params = unet.init_params(jax.random.PRNGKey(0), 2, depth=3, wf=3)
    res = fit(params, store, epochs=2, batch_size=4,
              optimizer=optax.adam(1e-3), compute_dtype=jnp.float32,
              log_every=1)
    losses = [h["loss"] for h in res.history if "loss" in h]
    assert len(losses) == 4 and np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_store_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="not a slice store"):
        SliceStore(str(tmp_path / "nope"))


def test_build_store_empty_pairs_raises(tmp_path):
    """Zero slices (e.g. a glob that matched nothing) must fail clearly at
    build time, not as np.memmap's cryptic empty-file ValueError at load,
    and must not leave broken data files behind."""
    out = tmp_path / "empty_store"
    with pytest.raises(ValueError, match="no slices"):
        build_store(str(out), [])
    assert not (out / "images.f16").exists()
    assert not (out / "store.json").exists()

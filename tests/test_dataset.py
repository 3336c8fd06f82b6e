"""Packed-dataset + native prefetching loader tests (GxM data-layer analog)."""

import os
import tempfile

import numpy as np
import pytest

from xsmm_tpu.utils.dataset import DataLoader, write_dataset


@pytest.fixture(scope="module")
def dataset():
    rng = np.random.default_rng(7)
    n, h, w, c = 100, 6, 6, 3
    imgs = rng.integers(0, 256, (n, h, w, c), dtype=np.uint8)
    labels = rng.integers(0, 5, (n,)).astype(np.int32)
    d = tempfile.mkdtemp()
    path = os.path.join(d, "ds.xsd")
    write_dataset(path, imgs, labels)
    return path, imgs, labels


def _record_ids(imgs, batches):
    """Map each yielded image back to its dataset index."""
    flat = imgs.reshape(imgs.shape[0], -1)
    ids = []
    for x, _ in batches:
        raw = np.round((x + 0.5) * 255).astype(np.uint8)
        raw = raw.reshape(raw.shape[0], -1)
        for row in raw:
            hit = np.nonzero((flat == row).all(axis=1))[0]
            assert hit.size >= 1
            ids.append(int(hit[0]))
    return ids


@pytest.mark.parametrize("native", [False, True])
def test_loader_shapes_and_values(dataset, native):
    path, imgs, labels = dataset
    dl = DataLoader(path, batch=16, epochs=1, native=native)
    if native and dl._lib is None:
        pytest.skip("native library unavailable")
    batches = list(dl)
    assert len(batches) == 100 // 16
    for x, y in batches:
        assert x.shape == (16, 6, 6, 3) and x.dtype == np.float32
        assert y.shape == (16,) and y.dtype == np.int32
        assert float(x.min()) >= -0.5 and float(x.max()) <= 0.5


@pytest.mark.parametrize("native", [False, True])
def test_epoch_shuffled_coverage(dataset, native):
    """Each epoch draws batch*nbatches distinct records, in shuffled order."""
    path, imgs, labels = dataset
    dl = DataLoader(path, batch=20, epochs=2, native=native)
    if native and dl._lib is None:
        pytest.skip("native library unavailable")
    batches = list(dl)
    assert len(batches) == 2 * 5
    ids = _record_ids(imgs, batches)
    ep1, ep2 = ids[:100], ids[100:]
    assert len(set(ep1)) == 100 and len(set(ep2)) == 100  # full coverage
    assert ep1 != list(range(100))                        # actually shuffled
    assert ep1 != ep2                                     # per-epoch reshuffle


def test_labels_match_images(dataset):
    path, imgs, labels = dataset
    dl = DataLoader(path, batch=10, epochs=1)
    batches = list(dl)
    ids = _record_ids(imgs, batches)
    got = np.concatenate([y for _, y in batches])
    np.testing.assert_array_equal(got, labels[ids])


def test_engine_integration(dataset):
    from xsmm_tpu.models import MLEngine, SolverConfig, resnet
    from xsmm_tpu.parallel.mesh import make_mesh
    path, _, _ = dataset
    params, fwd = resnet(depth=18, num_classes=5, width=8)
    eng = MLEngine(params, fwd, SolverConfig(lr=0.01),
                   mesh=make_mesh((8, 1), ("dp", "mp")))
    out = eng.train_epoch(iter(DataLoader(path, batch=16, epochs=1)),
                          verbose=False)
    assert np.isfinite(out["loss"])


def test_augment_pipeline():
    """JitterData-analog device augmentation (utils/augment.py)."""
    import jax
    import jax.numpy as jnp
    from xsmm_tpu.utils.augment import make_augment

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))
    aug = make_augment(crop=16, pad=2, flip=True, brightness=0.2,
                       contrast=0.2, mean=(0.1, 0.2, 0.3))
    y = aug(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
    # different keys give different augmentations; same key is deterministic
    y2 = aug(jax.random.PRNGKey(1), x)
    y1b = aug(jax.random.PRNGKey(0), x)
    assert not np.allclose(np.asarray(y), np.asarray(y2))
    assert np.allclose(np.asarray(y), np.asarray(y1b))
    # crop-only config: every output pixel must come from the padded input
    aug2 = make_augment(crop=12, pad=0, flip=False)
    y3 = aug2(jax.random.PRNGKey(2), x)
    assert y3.shape == (8, 12, 12, 3)


def test_image_ingestion_roundtrip(tmp_path):
    """Standard image formats (PPM/PGM/BMP/MHD) -> XSD1 -> DataLoader
    (closes the r2 L7 'no standard image ingestion' gap)."""
    import numpy as np
    from xsmm_tpu.utils import images as im
    from xsmm_tpu.utils.dataset import DataLoader
    rng = np.random.default_rng(0)
    # exact roundtrips per format
    rgb = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    p = str(tmp_path / "a.ppm"); im.write_pnm(p, rgb)
    assert np.array_equal(im.read_image(p), rgb)
    gray = rng.integers(0, 256, (11, 9), dtype=np.uint8)
    p = str(tmp_path / "g.pgm"); im.write_pnm(p, gray)
    assert np.array_equal(im.read_image(p)[:, :, 0], gray)
    p = str(tmp_path / "b.bmp"); im.write_bmp(p, rgb)
    assert np.array_equal(im.read_image(p), rgb)
    # class-directory ingestion -> packed dataset -> loader
    root = tmp_path / "data"
    for ci, cls in enumerate(["cat", "dog"]):
        (root / cls).mkdir(parents=True)
        for i in range(3):
            img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            im.write_bmp(str(root / cls / f"{i}.bmp"), img)
        im.write_pnm(str(root / cls / "x.ppm"),
                     rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
    man = im.ingest_image_dir(str(root), str(tmp_path / "out.xsd"),
                              hw=(16, 16))
    assert man["classes"] == ["cat", "dog"] and man["n_images"] == 8
    batches = list(DataLoader(str(tmp_path / "out.xsd"), batch=4,
                              epochs=1))
    assert len(batches) == 2
    x, y = batches[0]
    assert x.shape == (4, 16, 16, 3) and x.dtype == np.float32
    assert set(np.concatenate([b[1] for b in batches]).tolist()) == {0, 1}


def test_image_resize_modes():
    import numpy as np
    from xsmm_tpu.utils import images as im
    img = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    down = im.resize(img, (8, 8))      # area-average (divisible)
    assert down.shape == (8, 8, 3)
    assert abs(int(down[0, 0, 0]) - int(np.mean(img[:2, :2, 0]))) <= 1
    odd = im.resize(img, (10, 7))      # nearest (non-divisible)
    assert odd.shape == (10, 7, 3)
    up = im.resize(img, (32, 32))
    assert up.shape == (32, 32, 3)


def test_image_edge_cases(tmp_path):
    """Review-finding regressions: low-maxval netpbm rescales, float
    images in [0,1] scale to u8, volumes are rejected loudly."""
    import numpy as np
    import pytest
    from xsmm_tpu.utils import images as im
    from xsmm_tpu.utils.mhd import mhd_write
    # maxval=15 P6: values rescale to full range
    p = str(tmp_path / "low.ppm")
    with open(p, "wb") as f:
        f.write(b"P6\n2 1\n15\n" + bytes([15, 0, 7, 15, 15, 15]))
    img = im.read_image(p)
    assert img[0, 0, 0] == 255 and img[0, 0, 2] == 119 and \
        img[0, 1, 0] == 255
    # [0,1] float MHD scales, not clips
    p = str(tmp_path / "f.mhd")
    mhd_write(p, np.full((4, 4), 0.5, np.float32))
    img = im.read_image(p)
    assert 120 <= img[0, 0, 0] <= 135
    # a [D,H,W] volume is rejected, not mislabeled
    p = str(tmp_path / "v.mhd")
    mhd_write(p, np.zeros((5, 6, 7), np.float32))
    with pytest.raises(ValueError, match="volume"):
        im.read_image(p)

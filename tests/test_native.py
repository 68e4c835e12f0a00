import numpy as np
import pytest


def test_native_reranking_matches_numpy():
    from editor_tpu.native import load_native, k_reciprocal_rerank_native
    if load_native() is None:
        pytest.skip("no C++ toolchain available")
    from editor_tpu.evals.reranking import k_reciprocal_rerank

    rng = np.random.RandomState(0)
    centers = rng.randn(10, 16) * 5
    q = (centers[rng.randint(0, 10, 30)] + 0.5 * rng.randn(30, 16)).astype(np.float32)
    g = (centers[rng.randint(0, 10, 120)] + 0.5 * rng.randn(120, 16)).astype(np.float32)
    d_py = k_reciprocal_rerank(q, g, k1=10, k2=4, lambda_value=0.3)
    d_cc = k_reciprocal_rerank_native(q, g, k1=10, k2=4, lambda_value=0.3)
    np.testing.assert_allclose(d_cc, d_py, atol=1e-5)


def test_rerank_auto_fallback():
    from editor_tpu.native import rerank_auto
    rng = np.random.RandomState(1)
    q = rng.randn(8, 8).astype(np.float32)
    g = rng.randn(30, 8).astype(np.float32)
    d = rerank_auto(q, g, k1=5, k2=2, lambda_value=0.3)
    assert d.shape == (8, 30)
    assert np.isfinite(d).all()


# ---------------------------------------------------------------------------
# native JPEG decode + bicubic resize (imagecodec.cpp)
# ---------------------------------------------------------------------------

def _codec_or_skip():
    from editor_tpu.native import load_imagecodec
    if load_imagecodec() is None:
        pytest.skip("no g++/libjpeg for the native image codec")


def test_native_decode_matches_pil(tmp_path):
    """Native libjpeg decode + bicubic == PIL within a few u8 LSB (PIL uses
    fixed-point filtering; same a=-0.5 kernel, same half-pixel grid)."""
    _codec_or_skip()
    from PIL import Image
    from editor_tpu.native import decode_resize_batch
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        img = rng.randint(0, 255, (96 + 8 * i, 48, 3), np.uint8)
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    out = decode_resize_batch(paths, (64, 32))
    ref = np.stack([np.asarray(Image.open(p).convert("RGB")
                               .resize((32, 64), Image.BICUBIC))
                    for p in paths])
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 8 and diff.mean() < 1.0, (diff.max(), diff.mean())


def test_native_decode_wide_crop(tmp_path):
    """Wide-JPEG modality tiling: per-item crop_x0 slices the 256-px tiles
    (reference bases.py:21-26) before the resize."""
    _codec_or_skip()
    from PIL import Image
    from editor_tpu.native import decode_resize_batch
    rng = np.random.RandomState(1)
    wide = rng.randint(0, 255, (128, 3 * 256, 3), np.uint8)
    p = str(tmp_path / "wide.jpg")
    Image.fromarray(wide).save(p, quality=95)
    out = decode_resize_batch([p, p, p], (64, 32),
                              crop_x0=[0, 256, 512], crop_w=256, crop_h=128)
    img = Image.open(p).convert("RGB")
    for t in range(3):
        tile = img.crop((256 * t, 0, 256 * (t + 1), 128))
        ref = np.asarray(tile.resize((32, 64), Image.BICUBIC))
        diff = np.abs(out[t].astype(int) - ref.astype(int))
        assert diff.max() <= 8, (t, diff.max())


def test_native_decode_reports_failures(tmp_path):
    _codec_or_skip()
    from editor_tpu.native import decode_resize_batch
    with pytest.raises(RuntimeError, match="decodes failed"):
        decode_resize_batch([str(tmp_path / "missing.jpg")], (64, 32))


def test_loader_native_decode_batches_match_pil(tmp_path):
    """BatchLoader with native_decode=True assembles the same uint8 batches
    as the PIL thread-pool path (within codec tolerance)."""
    _codec_or_skip()
    from PIL import Image
    from editor_tpu.data.loader import BatchLoader
    rng = np.random.RandomState(2)
    items = []
    for i in range(8):
        mods = []
        for m in ("RGB", "NI", "TI"):
            p = str(tmp_path / f"{i}_{m}.jpg")
            Image.fromarray(rng.randint(0, 255, (96, 48, 3), np.uint8)
                            ).save(p, quality=95)
            mods.append(p)
        items.append((tuple(mods), i % 4, i % 2))
    idx = np.arange(8)
    nat = BatchLoader(items, (64, 32), wide_jpeg=False, num_modalities=3,
                      num_workers=2, native_decode=True)
    pil = BatchLoader(items, (64, 32), wide_jpeg=False, num_modalities=3,
                      num_workers=2, native_decode=False)
    assert nat.native_decode  # codec availability checked above
    b_nat = nat._assemble(idx)
    b_pil = pil._assemble(idx)
    for k in ("RGB", "NI", "TI"):
        diff = np.abs(b_nat[k].astype(int) - b_pil[k].astype(int))
        assert diff.max() <= 8, (k, diff.max())
    np.testing.assert_array_equal(b_nat["pid"], b_pil["pid"])
    np.testing.assert_array_equal(b_nat["camid"], b_pil["camid"])


def test_native_multicrop_matches_per_crop(tmp_path):
    """decode_resize_multicrop (decode once, k crops) == k independent
    decode_resize_batch calls — the wide-JPEG fast path is exact."""
    _codec_or_skip()
    from PIL import Image
    from editor_tpu.native import decode_resize_batch, decode_resize_multicrop
    rng = np.random.RandomState(3)
    paths = []
    for i in range(4):
        wide = rng.randint(0, 255, (128, 3 * 256, 3), np.uint8)
        p = str(tmp_path / f"wide{i}.jpg")
        Image.fromarray(wide).save(p, quality=95)
        paths.append(p)
    crops = [[0, 256, 512]] * 4
    got = decode_resize_multicrop(paths, (64, 32), crops,
                                  crop_w=256, crop_h=128)
    want = decode_resize_batch(
        [p for p in paths for _ in range(3)], (64, 32),
        crop_x0=[x for _ in paths for x in (0, 256, 512)],
        crop_w=256, crop_h=128)
    assert got.shape == want.shape == (12, 64, 32, 3)
    assert np.array_equal(got, want)

    with pytest.raises(RuntimeError, match="decodes failed"):
        decode_resize_multicrop([str(tmp_path / "nope.jpg")], (64, 32),
                                [[0]], crop_w=256, crop_h=128)

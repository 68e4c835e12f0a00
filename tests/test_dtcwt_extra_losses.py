import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editor_tpu.ops.dtcwt import (
    dtcwt2,
    dtcwt_magnitude,
    idtcwt2,
    scat_layer,
    scat_layer_j2,
)


def rand(shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape), jnp.float32)


@pytest.mark.parametrize("J", [1, 2, 3])
def test_dtcwt_roundtrip(J):
    x = rand((2, 64, 32, 3), seed=1)
    lows, highs = dtcwt2(x, J=J)
    y = idtcwt2(lows, highs)
    # exact in the interior; borders affected by zero-extension
    m = 8
    np.testing.assert_allclose(np.asarray(y[:, m:-m, m:-m]),
                               np.asarray(x[:, m:-m, m:-m]), atol=1e-4)


def test_dtcwt_shapes():
    x = rand((1, 64, 64, 2), seed=2)
    lows, highs = dtcwt2(x, J=2)
    assert len(lows) == 4
    assert highs[0].shape == (1, 32, 32, 2, 6, 2)
    # zero-extension q-shift levels grow by (L-2)/2=4: (32+10-1)//2 = 20
    assert highs[1].shape == (1, 20, 20, 2, 6, 2)


def test_dtcwt_shift_invariant_magnitudes():
    """The DTCWT's selling point: band magnitudes vary far less under a
    1-pixel shift than real-DWT band magnitudes."""
    from editor_tpu.ops.wavelets import wavedec2
    rng = np.random.RandomState(3)
    x = np.zeros((1, 64, 64, 1), np.float32)
    x[0, 28:36, 28:36, 0] = 1.0  # a box
    xs = np.roll(x, 1, axis=1)

    def dt_mag(im):
        _, highs = dtcwt2(jnp.asarray(im), J=2)
        return np.asarray(dtcwt_magnitude(highs[1]))

    def dwt_mag(im):
        _, highs = wavedec2(jnp.asarray(im), "haar", J=2)
        return np.abs(np.asarray(highs[1]))

    d_dt = np.abs(dt_mag(x) - dt_mag(xs)).sum() / dt_mag(x).sum()
    d_dw = np.abs(dwt_mag(x) - dwt_mag(xs)).sum() / dwt_mag(x).sum()
    assert d_dt < d_dw * 0.75, (d_dt, d_dw)


def test_scat_layers():
    x = rand((2, 32, 32, 3), seed=4)
    s1 = scat_layer(x)
    assert s1.shape == (2, 16, 16, 21)
    s2 = scat_layer_j2(x)
    assert s2.shape == (2, 8, 8, 147)
    assert np.isfinite(np.asarray(s2)).all()


# ---------------------------------------------------------------------------
# extra losses
# ---------------------------------------------------------------------------

def test_cluster_loss():
    from editor_tpu.losses.extra import cluster_loss
    rng = np.random.RandomState(0)
    P, K, d = 4, 4, 16
    centers = rng.randn(P, d) * 10
    feats = (centers[:, None] + 0.1 * rng.randn(P, K, d)).reshape(P * K, d)
    targets = np.repeat(np.arange(P), K)
    loss, intra, inter = cluster_loss(jnp.asarray(feats, jnp.float32),
                                      jnp.asarray(targets), P, K, margin=1.0)
    # well separated clusters with margin 1: intra_max << inter_min
    assert float(loss) == 0.0
    tight = feats + 0 * feats
    loss2, *_ = cluster_loss(jnp.asarray(rng.randn(P * K, d), jnp.float32),
                             jnp.asarray(targets), P, K, margin=10.0)
    assert float(loss2) > 0


def test_range_loss():
    from editor_tpu.losses.extra import range_loss
    rng = np.random.RandomState(1)
    P, K, d = 4, 4, 8
    feats = jnp.asarray(rng.randn(P * K, d), jnp.float32)
    targets = jnp.asarray(np.repeat(np.arange(P), K))
    total, intra, inter = range_loss(feats, targets, P, K, k=2, margin=5.0)
    assert float(total) > 0 and np.isfinite(float(total))


def test_hetero_and_multimodal_margin():
    from editor_tpu.losses.extra import hetero_center_loss, multi_modal_margin_loss
    rng = np.random.RandomState(2)
    P, K, d = 4, 4, 8
    f1 = jnp.asarray(rng.randn(P * K, d), jnp.float32)
    f2 = f1 + 0.01
    f3 = f1 - 0.01
    targets = jnp.asarray(np.repeat(np.arange(P), K))
    h = float(hetero_center_loss(f1, f2, P, K))
    assert h < 0.1  # nearly aligned modalities
    m = float(multi_modal_margin_loss(f1, f2, f3, targets, P, K, margin=3.0))
    assert m > 0  # |margin - tiny distance| is ~margin per class

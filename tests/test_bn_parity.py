import numpy as np
import pytest

import jax.numpy as jnp

from editor_tpu.models.layers import batchnorm1d, batchnorm1d_init


def test_batchnorm1d_matches_torch_train_and_eval():
    """The BN-neck heads must reproduce torch BatchNorm1d exactly — biased
    batch var for normalization, unbiased for running stats, momentum 0.1
    (shared-head sequential updates depend on this, make_model.py:169-171)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    dim = 16
    params, state = batchnorm1d_init(dim)
    tbn = torch.nn.BatchNorm1d(dim)
    tbn.train()

    # three sequential training batches (mimicking RGB->NIR->TIR shared head)
    for i in range(3):
        x = rng.randn(8, dim).astype(np.float32) * (i + 1) + i
        ours, state = batchnorm1d(params, state, jnp.asarray(x), training=True)
        theirs = tbn(torch.tensor(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    np.testing.assert_allclose(np.asarray(state["mean"]),
                               tbn.running_mean.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state["var"]),
                               tbn.running_var.numpy(), atol=1e-4)

    # eval mode uses the running stats
    tbn.eval()
    x = rng.randn(4, dim).astype(np.float32)
    ours, state2 = batchnorm1d(params, state, jnp.asarray(x), training=False)
    theirs = tbn(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)
    # eval does not touch running stats
    np.testing.assert_array_equal(np.asarray(state2["mean"]),
                                  np.asarray(state["mean"]))


def test_layernorm_matches_torch():
    torch = pytest.importorskip("torch")
    from editor_tpu.models.layers import layernorm, layernorm_init
    rng = np.random.RandomState(1)
    x = rng.randn(4, 7, 24).astype(np.float32)
    p = layernorm_init(24)
    ours = np.asarray(layernorm(p, jnp.asarray(x), eps=1e-6))
    theirs = torch.nn.functional.layer_norm(
        torch.tensor(x), (24,), eps=1e-6).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_gelu_matches_torch_exact():
    torch = pytest.importorskip("torch")
    from editor_tpu.models.layers import gelu
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(gelu(jnp.asarray(x)))
    theirs = torch.nn.functional.gelu(torch.tensor(x)).numpy()  # erf form
    np.testing.assert_allclose(ours, theirs, atol=1e-6)

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("name,expected_m", [
    ("resnet50", 25.557), ("resnet50_ibn_a", 25.557),
    ("mobilenetv2", 3.505), ("shufflenetv2", 2.279)])
def test_cnn_zoo_param_counts(name, expected_m):
    """Match the published ImageNet parameter counts (the reference zoo's
    whole purpose, params.py:72-79)."""
    from editor_tpu.models.cnn_zoo import cnn_param_count
    n = cnn_param_count(name, num_classes=1000) / 1e6
    assert abs(n - expected_m) < 0.01, n


@pytest.mark.slow
def test_cnn_zoo_forward():
    from editor_tpu.models.cnn_zoo import build_cnn
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    for name in ("resnet50_ibn_a", "mobilenetv2", "shufflenetv2"):
        params, apply = build_cnn(name, num_classes=7)
        out = apply(params, x)
        assert out.shape == (2, 7)
        assert np.isfinite(np.asarray(out)).all()
        feat = apply(params, x, num_classes_head=False)
        assert feat.ndim == 2 and feat.shape[0] == 2


def test_benchmark_and_cost_analysis():
    from editor_tpu.utils.profiling import benchmark, cost_analysis, flops_per_second
    f = lambda a, b: a @ b
    a = jnp.ones((256, 256))
    b = jnp.ones((256, 256))
    timing = benchmark(jax.jit(f), a, b, iters=3)
    assert timing["min_s"] > 0
    costs = cost_analysis(f, a, b)
    # 2*M*K*N flops for the matmul
    assert abs(costs.get("flops", 0) - 2 * 256 ** 3) / (2 * 256 ** 3) < 0.5
    perf = flops_per_second(f, a, b, iters=3)
    assert perf["tflops_per_s"] > 0


def test_debug_nan_tools():
    from editor_tpu.utils.debug import assert_tree_finite, nonfinite_leaves
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert nonfinite_leaves(good) == []
    bad = {"a": jnp.ones(3), "b": {"c": jnp.asarray([1.0, np.nan])}}
    leaves = nonfinite_leaves(bad)
    assert leaves and "c" in leaves[0]
    with pytest.raises(FloatingPointError):
        assert_tree_finite(bad)


def test_checked_update_wrapper():
    from editor_tpu.utils.debug import checked_update

    def step(state, x):
        return state + x, {"loss": x}

    wrapped = checked_update(step, check_every=2)
    s = jnp.zeros(2)
    s, _ = wrapped(s, jnp.ones(2))
    s, _ = wrapped(s, jnp.ones(2))  # check fires, passes
    bad_step = checked_update(lambda s, x: (s * jnp.nan, {}), check_every=1)
    with pytest.raises(FloatingPointError):
        bad_step(s, jnp.ones(2))

"""CNN-zoo golden forward parity vs the actual reference torch models.

For every factory entry (reference basic_cnn_params/__init__.py:25-96): build
the torch reference with randomized BN stats, import its state_dict through
the ordered structural importer (editor_tpu/utils/zoo_import.py), run both
forwards at f64 (f32 for hacnn — its torch STN hardcodes float32 tensors,
hacnn.py:167,275-300), and compare outputs. This certifies both the importer
mapping AND every architectural detail (BN eps, relu placement, flatten
order, attention algebra) — the bugs it has caught are regression-pinned
here: resnet50_ibn_b's pre-relu IN, mlfn's residual relu, mudeep's NCHW
flatten, inception/nasnet/cal BN eps=0.001.

A small-model subset runs in the default suite; the full matrix is -m slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from editor_tpu.models.zoo import MODEL_FACTORY, build_model
from editor_tpu.utils.zoo_import import load_torch_zoo_state
from tests.reference_compat import load_reference_zoo

# input sizes for architectures with fixed or minimum spatial requirements
# (same table as tools/probe_zoo_golden.py)
HW = {
    "squeezenet1_0": (64, 64), "squeezenet1_0_fc512": (64, 64),
    "squeezenet1_1": (64, 64),
    "xception": (128, 64), "inceptionv4": (160, 96),
    "inceptionresnetv2": (160, 96), "nasnsetmobile": (96, 96),
    "mudeep": (256, 128), "hacnn": (160, 64),
    "pcb_p6": (96, 32), "cal": (128, 64),
}

# observed f64 errors are <=5e-15; cal's sign-sqrt near zero conditions the
# comparison (~1e-8); hacnn runs at f32 (~6e-7)
TOL = {"cal": 1e-6, "hacnn": 5e-5}

FAST = ["resnet18", "osnet_x0_25", "shufflenet_v2_x0_5", "squeezenet1_1"]
SLOW = sorted(set(MODEL_FACTORY) - set(FAST))


@pytest.fixture(scope="module")
def zoo_t(request):
    jax.config.update("jax_enable_x64", True)
    request.addfinalizer(
        lambda: jax.config.update("jax_enable_x64", False))
    return load_reference_zoo()


def _flat(out):
    if isinstance(out, (list, tuple)):
        return np.concatenate([_flat(o) for o in out], axis=-1)
    return out.detach().numpy()


def _golden(zoo_t, name):
    nc, hw = 7, HW.get(name, (64, 32))
    tdtype = torch.float32 if name == "hacnn" else torch.float64
    jdtype = jnp.float32 if name == "hacnn" else jnp.float64
    m = zoo_t.build_model(name, nc, pretrained=False, use_gpu=False).to(tdtype)
    m.train()
    for mod in m.modules():
        if isinstance(mod, (torch.nn.modules.batchnorm._BatchNorm,
                            torch.nn.modules.instancenorm._InstanceNorm,
                            torch.nn.Dropout)):
            mod.eval()
    with torch.no_grad():
        g = torch.Generator().manual_seed(0)
        for mod in m.modules():
            if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                mod.running_mean.normal_(0, 0.5, generator=g)
                mod.running_var.uniform_(0.5, 2.0, generator=g)

    if name == "cal":
        # the reference forward is unrunnable as shipped (BAP emits
        # M*2048-d but classifier_bap expects M*768-d, cal.py:316,360);
        # apply the SAME documented repair as the DSL (slice the trunk to
        # in_planes channels before BAP), and eval mode — the train branch
        # returns a counterfactual tuple using RANDOM fake attention
        bap_fwd = m.bap.forward
        m.bap.forward = lambda f, a, counterfactual=False: bap_fwd(
            f[:, :768], a, counterfactual)
        m.eval()

    # frozen all-zero params (e.g. CAL's no-shift BN biases) have no DSL slot
    skip = tuple(n for n, p in m.named_parameters()
                 if not p.requires_grad and float(p.abs().max()) == 0.0)
    params, apply = build_model(name, num_classes=nc)
    params = load_torch_zoo_state(params, m.state_dict(), dtype=jdtype,
                                  skip_keys=skip)
    x = np.random.RandomState(0).randn(1, *hw, 3)
    with torch.no_grad():
        # ascontiguousarray: a transposed VIEW keeps channels-last strides,
        # which breaks reference models using .view (mudeep's fc flatten)
        yt = _flat(m(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))).to(tdtype)))
    yj = np.asarray(apply(params, jnp.asarray(x, jdtype)))
    if yt.shape != yj.shape and yt.size == yj.size:
        # pcb: torch returns a list of per-part logits; ours stacks them
        yj = yj.reshape(yt.shape)
    assert yt.shape == yj.shape, (name, yt.shape, yj.shape)
    err = np.abs(yt - yj).max() / (np.abs(yt).max() + 1e-12)
    assert err < TOL.get(name, 5e-12), f"{name}: rel err {err:.2e}"


@pytest.mark.parametrize("name", FAST)
def test_zoo_golden_fast(zoo_t, name):
    _golden(zoo_t, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW)
def test_zoo_golden_slow(zoo_t, name):
    _golden(zoo_t, name)

"""CNN zoo: parameter parity vs the torch reference + runnable forwards.

The expected counts were produced by building every reference factory entry
(modeling/backbones/basic_cnn_params/__init__.py:25-96) with torch CPU at
num_classes=100 and summing requires_grad parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from editor_tpu.models.zoo import MODEL_FACTORY, build_model, model_param_count

# torch oracle: sum(p.numel() for p in m.parameters() if p.requires_grad),
# num_classes=100
TORCH_COUNTS = {
    "resnet18": 11227812, "resnet34": 21335972, "resnet50": 23712932,
    "resnet101": 42705060, "resnet152": 58348708,
    "resnext50_32x4d": 23184804, "resnext101_32x8d": 86947236,
    "resnet50_fc512": 24609444, "se_resnet50": 26243924,
    "se_resnet50_fc512": 27140436, "se_resnet101": 47482772,
    "se_resnext50_32x4d": 25715796, "se_resnext101_32x4d": 47111316,
    "densenet121": 7056356, "densenet169": 12650980,
    "densenet201": 18285028, "densenet161": 26692900,
    "densenet121_fc512": 7530980, "inceptionresnetv2": 54460164,
    "inceptionv4": 41296516, "xception": 21011852,
    "resnet50_ibn_a": 23712932, "resnet50_ibn_b": 23714468,
    "nasnsetmobile": 4338678, "mobilenetv2_x1_0": 2353060,
    "mobilenetv2_x1_4": 4470904, "shufflenet": 1000828,
    "squeezenet1_0": 786724, "squeezenet1_0_fc512": 1050404,
    "squeezenet1_1": 773796, "shufflenet_v2_x0_5": 444292,
    "shufflenet_v2_x1_0": 1356104, "shufflenet_v2_x1_5": 2581124,
    "shufflenet_v2_x2_0": 5549896, "mudeep": 25955316,
    "resnet50mid": 28012708, "hacnn": 3575968, "pcb_p6": 24187032,
    "pcb_p4": 24135632, "mlfn": 31893540, "osnet_x1_0": 2378248,
    "osnet_x0_75": 1461726, "osnet_x0_5": 773238, "osnet_x0_25": 312300,
    "osnet_ibn_x1_0": 2379272, "osnet_ain_x1_0": 2220808,
    "osnet_ain_x0_75": 1337054, "osnet_ain_x0_5": 681334,
    "osnet_ain_x0_25": 253164, "cal": 32577712,
}


def test_factory_covers_every_reference_name():
    assert set(MODEL_FACTORY) == set(TORCH_COUNTS)


@pytest.mark.parametrize("name", sorted(TORCH_COUNTS))
def test_param_count_matches_torch(name):
    assert model_param_count(name, num_classes=100) == TORCH_COUNTS[name]


# one representative per family: cheap enough for the default CPU suite
_FAST_FORWARD = [
    ("resnet18", (64, 32)), ("osnet_x0_25", (64, 32)),
    ("shufflenet_v2_x0_5", (64, 32)), ("squeezenet1_1", (64, 64)),
    ("mobilenetv2_x1_0", (64, 32)), ("shufflenet", (64, 32)),
]

# heavier architectures (big stacks / fixed input sizes) — run with -m slow
_SLOW_FORWARD = [
    ("densenet121", (64, 32)),
    ("resnet50_ibn_b", (64, 32)), ("se_resnext50_32x4d", (64, 32)),
    ("resnet50mid", (64, 32)), ("pcb_p6", (96, 32)),
    ("xception", (128, 64)), ("inceptionv4", (160, 96)),
    ("inceptionresnetv2", (160, 96)), ("nasnsetmobile", (96, 96)),
    ("mlfn", (64, 32)), ("mudeep", (256, 128)), ("hacnn", (160, 64)),
    ("cal", (128, 64)), ("osnet_ain_x1_0", (64, 32)),
]


def _smoke(name, hw):
    params, apply = build_model(name, num_classes=7)
    x = jnp.asarray(np.random.RandomState(0).randn(2, *hw, 3), jnp.float32)
    out = apply(params, x)
    # hacnn emits [global|local] logits (2*nc); pcb one head per part
    assert out.shape[0] == 2 and out.shape[-1] % 7 == 0, (name, out.shape)
    assert np.isfinite(np.asarray(out)).all(), name


@pytest.mark.parametrize("name,hw", _FAST_FORWARD)
def test_forward_fast(name, hw):
    _smoke(name, hw)


@pytest.mark.slow
@pytest.mark.parametrize("name,hw", _SLOW_FORWARD)
def test_forward_slow(name, hw):
    _smoke(name, hw)

"""Probe torch->jax forward parity for every CNN-zoo entry (dev tool).

For each factory name: build the reference torch model (CPU, f64,
randomized BN stats, logits branch with norm/dropout in eval), import its
state_dict via editor_tpu.utils.zoo_import, run both forwards, print the
max relative error. Used to develop tests/test_zoo_golden.py.
"""

import sys
import traceback

import numpy as np
import jax

# the ambient sitecustomize pins the tunneled TPU platform even with
# JAX_PLATFORMS=cpu in the env — force CPU through jax.config (the f64
# oracle path; same bootstrap as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")
import torch  # noqa: E402

from tests.reference_compat import load_reference_zoo  # noqa: E402
from editor_tpu.models.zoo import MODEL_FACTORY, build_model  # noqa: E402
from editor_tpu.utils.zoo_import import load_torch_zoo_state  # noqa: E402

HW = {
    "squeezenet1_0": (64, 64), "squeezenet1_0_fc512": (64, 64),
    "squeezenet1_1": (64, 64),
    "xception": (128, 64), "inceptionv4": (160, 96),
    "inceptionresnetv2": (160, 96), "nasnsetmobile": (96, 96),
    "mudeep": (256, 128), "hacnn": (160, 64),
    "pcb_p6": (96, 32), "cal": (128, 64),
}


def flat(out):
    if isinstance(out, (list, tuple)):
        return np.concatenate([flat(o) for o in out], axis=-1)
    return out.detach().numpy()


def probe(zoo_t, name):
    nc, hw = 7, HW.get(name, (64, 32))
    # hacnn's STN hardcodes float32 tensors (hacnn.py:167,275-300) — its
    # torch forward cannot run at f64; probe it at f32 instead
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
        # M*2048-d but classifier_bap expects M*768-d — cal.py:316,360);
        # apply the SAME documented repair as the DSL (slice the trunk to
        # in_planes channels before BAP) so both sides compute one function
        bap_fwd = m.bap.forward
        m.bap.forward = lambda f, a, counterfactual=False: bap_fwd(
            f[:, :768], a, counterfactual)
        # eval: the train branch returns a counterfactual tuple whose hat
        # term uses RANDOM fake attention (cal.py:205-211) — not comparable
        m.eval()

    # frozen all-zero params (e.g. CAL's no-shift BN biases) have no DSL slot
    skip = tuple(n for n, p in m.named_parameters()
                 if not p.requires_grad and float(p.abs().max()) == 0.0)
    params, apply = build_model(name, num_classes=nc)
    params = load_torch_zoo_state(params, m.state_dict(), dtype=jdtype,
                                  skip_keys=skip)
    x = np.random.RandomState(0).randn(1, *hw, 3)
    with torch.no_grad():
        # contiguous: a transposed VIEW keeps channels-last strides, which
        # breaks reference models that use .view (mudeep's fc flatten)
        yt = flat(m(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2))).to(tdtype)))
    yj = np.asarray(apply(params, jnp.asarray(x, jdtype)))
    if yt.shape != yj.shape and yt.size == yj.size:
        # pcb: torch returns a list of per-part logits (flattened by
        # flat()); ours stacks them [B, parts, C] — same order
        yj = yj.reshape(yt.shape)
    if yt.shape != yj.shape:
        return f"SHAPE {yt.shape} vs {yj.shape}"
    err = np.abs(yt - yj).max() / (np.abs(yt).max() + 1e-12)
    return f"rel {err:.2e}"


def main():
    zoo_t = load_reference_zoo()
    names = sys.argv[1:] or sorted(MODEL_FACTORY)
    for name in names:
        try:
            print(f"{name:26s} {probe(zoo_t, name)}", flush=True)
        except Exception as e:
            msg = traceback.format_exc().splitlines()[-1][:160]
            print(f"{name:26s} FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()

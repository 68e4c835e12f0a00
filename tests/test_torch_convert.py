import numpy as np
import pytest

import jax
import jax.numpy as jnp

from editor_tpu.models import ViTConfig, vit_apply, vit_init
from editor_tpu.models.editor import EditorConfig, editor_init
from editor_tpu.utils import torch_convert as TC


def test_vit_sd_roundtrip():
    """params -> torch-layout state dict -> converted back == identity."""
    cfg = ViTConfig(img_size=(64, 32), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, camera=3)
    params = vit_init(jax.random.PRNGKey(0), cfg)
    sd = TC._tree_to_sd(params)
    back = TC.convert_vit_from_torch(sd, cfg)
    back["sie_embed"] = params["sie_embed"]  # sd carries it; keep comparable
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(kp))


def test_vit_parity_vs_huggingface():
    """Forward parity against transformers' independent ViT implementation
    (erf-GELU, pre-LN, eps=1e-6) — validates matmul orientation, LN, GELU,
    attention math end-to-end through a converted checkpoint."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import ViTConfig as HFConfig, ViTModel

    hidden, heads, layers, patch, img = 96, 4, 2, 16, 64
    hf_cfg = HFConfig(hidden_size=hidden, num_hidden_layers=layers,
                      num_attention_heads=heads, intermediate_size=hidden * 4,
                      image_size=img, patch_size=patch, num_channels=3,
                      hidden_act="gelu", layer_norm_eps=1e-6,
                      hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()

    # map HF weights into a Trans-layout torch state dict, then convert
    hsd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    sd = {
        "cls_token": hsd["embeddings.cls_token"],
        "pos_embed": hsd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            hsd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            hsd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": hsd["layernorm.weight"],
        "norm.bias": hsd["layernorm.bias"],
    }
    for i in range(layers):
        hp = f"encoder.layer.{i}."
        q_w = hsd[hp + "attention.attention.query.weight"]
        k_w = hsd[hp + "attention.attention.key.weight"]
        v_w = hsd[hp + "attention.attention.value.weight"]
        sd[f"blocks.{i}.attn.qkv.weight"] = np.concatenate([q_w, k_w, v_w], 0)
        sd[f"blocks.{i}.attn.qkv.bias"] = np.concatenate([
            hsd[hp + "attention.attention.query.bias"],
            hsd[hp + "attention.attention.key.bias"],
            hsd[hp + "attention.attention.value.bias"]], 0)
        sd[f"blocks.{i}.attn.proj.weight"] = hsd[hp + "attention.output.dense.weight"]
        sd[f"blocks.{i}.attn.proj.bias"] = hsd[hp + "attention.output.dense.bias"]
        sd[f"blocks.{i}.norm1.weight"] = hsd[hp + "layernorm_before.weight"]
        sd[f"blocks.{i}.norm1.bias"] = hsd[hp + "layernorm_before.bias"]
        sd[f"blocks.{i}.norm2.weight"] = hsd[hp + "layernorm_after.weight"]
        sd[f"blocks.{i}.norm2.bias"] = hsd[hp + "layernorm_after.bias"]
        sd[f"blocks.{i}.mlp.fc1.weight"] = hsd[hp + "intermediate.dense.weight"]
        sd[f"blocks.{i}.mlp.fc1.bias"] = hsd[hp + "intermediate.dense.bias"]
        sd[f"blocks.{i}.mlp.fc2.weight"] = hsd[hp + "output.dense.weight"]
        sd[f"blocks.{i}.mlp.fc2.bias"] = hsd[hp + "output.dense.bias"]

    cfg = ViTConfig(img_size=(img, img), patch_size=patch,
                    stride_size=(patch, patch), embed_dim=hidden, depth=layers,
                    num_heads=heads, mlp_ratio=4.0, qkv_bias=True, camera=0,
                    drop_path_rate=0.0)
    params = TC.convert_vit_from_torch(sd, cfg)

    rng = np.random.RandomState(0)
    x = rng.randn(2, img, img, 3).astype(np.float32)
    ours, _ = vit_apply(params, jnp.asarray(x), cfg)

    with torch.no_grad():
        theirs = hf(torch.tensor(x.transpose(0, 3, 1, 2))).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_resize_pos_embed_matches_torch_interp():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.RandomState(1)
    pe = rng.randn(1, 1 + 14 * 14, 32).astype(np.float32)
    ours = TC.resize_pos_embed(pe, (16, 8))
    grid = torch.tensor(pe[0, 1:].reshape(1, 14, 14, 32).transpose(0, 3, 1, 2))
    ref = F.interpolate(grid, size=(16, 8), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).reshape(1, 128, 32).numpy()
    np.testing.assert_allclose(ours[0, 1:], ref[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours[0, 0], pe[0, 0])


def test_editor_torch_checkpoint_import(tmp_path):
    """Construct a torch-format EDITOR checkpoint file and import it fully."""
    torch = pytest.importorskip("torch")
    vit = ViTConfig(img_size=(64, 32), patch_size=16, stride_size=(16, 16),
                    embed_dim=96, depth=2, num_heads=4, camera=3)
    ecfg = EditorConfig(num_classes=5, vit=vit, use_pallas=False)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)

    rng = np.random.RandomState(0)
    d = 96
    sd = {}
    for k, v in TC._tree_to_sd(params["BACKBONE"]).items():
        sd["BACKBONE.base." + k] = v
    for mod in ("R", "N", "T"):
        for nm in (f"norm{mod}", f"norm{mod}_"):
            sd[f"FUSE_block.{nm}.weight"] = rng.randn(d).astype(np.float32)
            sd[f"FUSE_block.{nm}.bias"] = rng.randn(d).astype(np.float32)
        sd[f"FUSE_block.attn{mod}.qkv.weight"] = rng.randn(3 * d, d).astype(np.float32)
        sd[f"FUSE_block.attn{mod}.proj.weight"] = rng.randn(d, d).astype(np.float32)
        sd[f"FUSE_block.mlp{mod}.fc1.weight"] = rng.randn(2 * d, d).astype(np.float32)
        sd[f"FUSE_block.mlp{mod}.fc2.weight"] = rng.randn(d, 2 * d).astype(np.float32)
    for nm in ("norm1", "norm2", "out_norm"):
        sd[f"FUSE_block.{nm}.weight"] = rng.randn(d).astype(np.float32)
        sd[f"FUSE_block.{nm}.bias"] = rng.randn(d).astype(np.float32)
    sd["FUSE_block.attn1.qkv.weight"] = rng.randn(3 * d, d).astype(np.float32)
    sd["FUSE_block.attn1.proj.weight"] = rng.randn(d, d).astype(np.float32)
    sd["FUSE_block.mlp.fc1.weight"] = rng.randn(2 * d, d).astype(np.float32)
    sd["FUSE_block.mlp.fc2.weight"] = rng.randn(d, 2 * d).astype(np.float32)
    for ours, theirs in (("rgb", "RGB"), ("nir", "NIR"), ("tir", "TIR")):
        sd[f"FUSE_block.memory_cls.{theirs}_centers"] = rng.randn(5, d).astype(np.float32)
    for name in ("RGB_REDUCE", "NIR_REDUCE", "TIR_REDUCE"):
        sd[f"{name}.weight"] = rng.randn(d, 2 * d).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(d).astype(np.float32)
    sd["FUSE_HEAD.weight"] = rng.randn(5, 3 * d).astype(np.float32)
    sd["BACKBONE_HEAD.weight"] = rng.randn(5, d).astype(np.float32)
    for bn, dim in (("FUSE_BN", 3 * d), ("BACKBONE_BN", d)):
        sd[f"{bn}.weight"] = rng.randn(dim).astype(np.float32)
        sd[f"{bn}.bias"] = rng.randn(dim).astype(np.float32)
        sd[f"{bn}.running_mean"] = rng.randn(dim).astype(np.float32)
        sd[f"{bn}.running_var"] = np.abs(rng.randn(dim)).astype(np.float32)

    path = str(tmp_path / "editor.pth")
    # prefix with 'module.' like DDP-trained checkpoints (make_model.py:147)
    torch.save({"module." + k: torch.tensor(v) for k, v in sd.items()}, path)

    new_p, new_s = TC.convert_editor_from_torch(path, ecfg, params, state)
    np.testing.assert_allclose(
        np.asarray(new_p["FUSE_HEAD"]["w"]), sd["FUSE_HEAD.weight"].T)
    np.testing.assert_allclose(
        np.asarray(new_p["FUSE_block"]["attnR"]["qkv"]["w"]),
        sd["FUSE_block.attnR.qkv.weight"].T)
    np.testing.assert_allclose(
        np.asarray(new_s["bn"]["FUSE_BN"]["mean"]), sd["FUSE_BN.running_mean"])
    np.testing.assert_allclose(
        np.asarray(new_s["ocfr"]["tir"]), sd["FUSE_block.memory_cls.TIR_centers"])
    # converted model runs
    from editor_tpu.models import editor_apply
    imgs = {m: jnp.asarray(np.random.RandomState(3).rand(2, 64, 32, 3),
                           jnp.float32) for m in ("RGB", "NI", "TI")}
    feat, _ = editor_apply(new_p, new_s, ecfg, imgs,
                           cam_ids=jnp.zeros(2, jnp.int32), training=False)
    assert np.isfinite(np.asarray(feat)).all()

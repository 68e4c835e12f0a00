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


# ---------------------------------------------------------------------------
# converter robustness matrix (reference vit_pytorch.py:646-690):
# grid resizes, distilled tokens, module.-prefixed EDITOR state dicts
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gs_old,new_hw", [(14, (16, 8)),   # 224² → 256×128
                                           (14, (8, 16)),
                                           (24, (16, 8)),
                                           (7, (12, 6))])
def test_resize_pos_embed_matrix_vs_reference(gs_old, new_hw):
    """Our numpy half-pixel bilinear == torch F.interpolate(bilinear,
    align_corners=False) across a matrix of source grids and target aspect
    ratios (reference resize_pos_embed, vit_pytorch.py:674-690)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    C = 32
    rng = np.random.RandomState(gs_old)
    pe = rng.randn(1, 1 + gs_old * gs_old, C).astype(np.float32)
    h, w = new_hw

    ours = TC.resize_pos_embed(pe, (h, w))

    t = torch.from_numpy(pe[0, 1:]).reshape(1, gs_old, gs_old, C)
    t = t.permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(h, w), mode="bilinear")
    ref = np.concatenate(
        [pe[:, :1], t.permute(0, 2, 3, 1).reshape(1, h * w, C).numpy()], 1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_load_imagenet_vit_distilled_resize(tmp_path):
    """A timm-style distilled 224² checkpoint loads into a 256×128 config:
    the dist token is dropped (reference load_param 'distilled' branch,
    vit_pytorch.py:661-663), head/dist keys ignored, the grid bilinearly
    resized, and the cls row carried through untouched."""
    torch = pytest.importorskip("torch")

    cfg = ViTConfig(img_size=(256, 128), patch_size=16, stride_size=(16, 16),
                    embed_dim=32, depth=1, num_heads=4, camera=2)
    params = vit_init(jax.random.PRNGKey(1), cfg)

    sd = TC._tree_to_sd(params)
    del sd["sie_embed"], sd["fc.weight"], sd["fc.bias"]
    rng = np.random.RandomState(0)
    pe224 = rng.randn(1, 2 + 14 * 14, 32).astype(np.float32)  # cls+dist+196
    sd["pos_embed"] = pe224
    sd["dist_token"] = rng.randn(1, 1, 32).astype(np.float32)
    sd["head.weight"] = rng.randn(10, 32).astype(np.float32)
    sd["head_dist.bias"] = rng.randn(10).astype(np.float32)
    path = str(tmp_path / "deit_distilled_patch16_224.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)

    loaded = TC.load_imagenet_vit(path, cfg, params)
    assert loaded["pos_embed"].shape == (1, 1 + cfg.num_patches, 32)
    # cls row kept verbatim; grid equals our resize of the dist-stripped grid
    np.testing.assert_allclose(np.asarray(loaded["pos_embed"][:, :1]),
                               pe224[:, :1], atol=1e-6)
    expect = TC.resize_pos_embed(
        np.concatenate([pe224[:, :1], pe224[:, 2:]], 1),
        (cfg.num_y, cfg.num_x))
    np.testing.assert_allclose(np.asarray(loaded["pos_embed"]), expect,
                               atol=1e-6)
    # our sie_embed kept (absent from the checkpoint)
    np.testing.assert_allclose(np.asarray(loaded["sie_embed"]),
                               np.asarray(params["sie_embed"]), atol=1e-6)


def test_editor_module_prefix_import(tmp_path):
    """An EDITOR checkpoint saved with DataParallel 'module.' prefixes
    converts identically to the bare one (reference EDITOR.load_param strip,
    make_model.py:144-148)."""
    torch = pytest.importorskip("torch")
    from tests.reference_compat import load_reference_modeling, RefCfg

    torch_mods = load_reference_modeling()
    import modeling.backbones.vit_pytorch as vp
    from functools import partial

    def tiny(img_size=(256, 128), stride_size=16, camera=0, sie_xishu=1.5,
             local_feature=False, **kw):
        kw.pop("drop_rate", None), kw.pop("attn_drop_rate", None)
        kw.pop("drop_path_rate", None)
        return vp.Trans(img_size=img_size, patch_size=16,
                        stride_size=stride_size, embed_dim=768, depth=1,
                        num_heads=12, mlp_ratio=4, qkv_bias=True,
                        camera=camera, view=0,
                        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6),
                        sie_xishu=sie_xishu, local_feature=local_feature)

    torch.manual_seed(0)
    ref = torch_mods.EDITOR(8, RefCfg, 2, {"vit_base_patch16_224": tiny})
    sd = ref.state_dict()
    p_bare = str(tmp_path / "bare.pth")
    p_mod = str(tmp_path / "module.pth")
    torch.save(sd, p_bare)
    torch.save({"module." + k: v for k, v in sd.items()}, p_mod)

    vit_cfg = ViTConfig(img_size=(128, 64), patch_size=16,
                        stride_size=(16, 16), embed_dim=768, depth=1,
                        num_heads=12, camera=2, num_fc_classes=8)
    ecfg = EditorConfig(num_classes=8, vit=vit_cfg, head_keep=2,
                        frequency_keep=3, use_pallas=False)
    params, state = editor_init(jax.random.PRNGKey(0), ecfg)
    p1, s1 = TC.convert_editor_from_torch(p_bare, ecfg, params, state)
    p2, s2 = TC.convert_editor_from_torch(p_mod, ecfg, params, state)
    for (kp, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path((p1, s1)),
                               jax.tree_util.tree_leaves_with_path((p2, s2))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=jax.tree_util.keystr(kp))

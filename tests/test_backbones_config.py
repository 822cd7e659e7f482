"""from_config wiring for the remaining backbone families
(DenseCLIP / OpenCLIP / DINO.txt names / ProxyCLIP)."""

import numpy as np
import pytest
import yaml

from patchioner_tpu.models.patchioner import Patchioner


def test_denseclip_from_config(tmp_path):
    dc = {"model": {"vision": {"vision_patch_size": 16, "vision_width": 64,
                               "vision_layers": 2, "embed_dim": 48}}}
    p = tmp_path / "denseclip_tiny.yaml"
    p.write_text(yaml.safe_dump(dc))
    cfg = dict(prefix_size=48, support_memory_size=64,
               denseclip_config=str(p), dino_model="denseclip_vitb16",
               crop_dim=32, projection_type="coco", normalize=False)
    m = Patchioner.from_config(cfg, allow_missing_weights=True)
    assert m.backbone_type == "DenseClip"
    imgs = np.random.default_rng(0).standard_normal((1, 32, 32, 3)).astype(
        np.float32)
    outs = m.forward(imgs, get_cls_capt=True, get_avg_self_attn_capt=True)
    assert len(outs["cls_capt"]) == 1
    assert len(outs["avg_self_attn_capt"]) == 1  # attention IS extractable


def test_vendored_denseclip_configs_parse():
    import os

    from patchioner_tpu.models import vit as vit_mod

    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(vit_mod.__file__))), "data", "denseclip_configs")
    names = os.listdir(d)
    assert "denseclip_segmentation_vitb16.yaml" in names
    with open(os.path.join(d, "denseclip_segmentation_vitb16.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["model"]["vision"]["vision_patch_size"] == 16


def test_openclip_from_config():
    cfg = dict(prefix_size=512, support_memory_size=0, use_open_clip=True,
               dino_model="ViT-B/16", crop_dim=32, projection_type="coco",
               normalize=False, calculate_argmax_text=True)
    m = Patchioner.from_config(cfg, allow_missing_weights=True)
    assert m.backbone_type == "OpenCLIP"
    assert m.skip_ln_post  # pre-ln_post projection quirk (model.py:848-859)
    assert m.patch_size == 16


def test_dinotxt_name_maps_to_vitl():
    cfg = dict(prefix_size=1024, support_memory_size=0,
               dino_model="dinov2_vitl14_reg4_dinotxt_tet1280d20h24l",
               crop_dim=28, projection_type="coco",
               calculate_argmax_text=True)
    m = Patchioner.from_config(cfg, allow_missing_weights=True)
    assert m.vit_cfg.embed_dim == 1024
    assert m.vit_cfg.num_registers == 4


def test_proxyclip_from_config_builds():
    cfg = dict(prefix_size=512, support_memory_size=0,
               proxyclip_clipmodel="ViT-B/16", proxyclip_vfm="dinov2",
               crop_dim=28, calculate_argmax_text=True,
               projection_type="coco")
    m = Patchioner.from_config(cfg, allow_missing_weights=True)
    assert m.backbone_type == "ProxyCLIP"
    assert m.patch_size == 14  # geometry from the VFM


def test_perf_keys_reach_vit_config():
    """The PERF.md config extensions (attn_impl / mlp_fused / qkv_fused /
    proj_fused / gelu_approx / softmax_f32) must land on the built
    ViTConfig — an ignored perf key would silently benchmark the wrong
    kernels."""
    cfg = dict(prefix_size=32, support_memory_size=16,
               dino_model="dinov2_vitb14_reg", crop_dim=28,
               projection_type="coco", normalize=False,
               attn_impl="fusedqkv", mlp_fused=True, qkv_fused=True,
               proj_fused=True, gelu_approx=True)
    m = Patchioner.from_config(cfg, allow_missing_weights=True)
    v = m.vit_cfg
    assert v.attn_impl == "fusedqkv"
    assert v.mlp_fused and v.qkv_fused and v.proj_fused and v.gelu_approx


def test_tpu_serving_preset_keys():
    import os

    import patchioner_tpu

    root = os.path.dirname(os.path.dirname(
        os.path.abspath(patchioner_tpu.__file__)))
    with open(os.path.join(root, "configs", "mlp.k.tpu-serving.yaml")) as f:
        cfg = yaml.safe_load(f)
    assert cfg["attn_impl"] == "fusedqkv"
    assert cfg["mlp_fused"] and cfg["qkv_fused"]

"""Every shipped config in configs/ must build with allow_missing_weights
(weights absent in zero-egress environments) — guards the config schema."""

import glob
import os

import pytest

from patchioner_tpu.models.patchioner import Patchioner

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))

# Full-size towers are too slow to *run* on CPU, but building (random init,
# no forward) is cheap enough for every config except the ViT-L ones.
SLOW = {"dinotxt.yaml", "denseclip_B16_seg_40patches.k.yaml",
        "proxyclip_b16_dinov2.k.yaml"}


@pytest.mark.parametrize(
    "path", [c for c in CONFIGS if os.path.basename(c) not in SLOW],
    ids=os.path.basename,
)
def test_config_builds(path):
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)
    # cap memory-bank size so random banks stay small
    model = Patchioner.from_config(
        path, allow_missing_weights=True, random_bank_size=32
    )
    assert model is not None
    if cfg.get("support_memory_size", 0) > 0:
        assert model.bank is not None


def test_all_reference_configs_present():
    """All 21 reference configs ship under the same names."""
    names = {os.path.basename(c) for c in CONFIGS}
    for family in (
        "mlp.k.yaml", "mlp_noise.k.yaml", "decap_B16.k.yaml",
        "decap_B16_resize.k.yaml", "decap_B32.k.yaml", "mlp.viecap.k.yaml",
        "viecap.k.yaml", "viecap_b16_14patches.k.yaml",
        "viecap_b16_37patches.k.yaml", "mlp.meacap.k.yaml",
        "meacap_invlm.k.yaml", "meacap_invlm_b16_14patches.k.yaml",
        "meacap_invlm_b16_37patches.k.yaml", "alphaclip_B16_CLS.k.yaml",
        "proxyclip_b16.k.yaml", "proxyclip_b16_dinov2.k.yaml",
        "INViTE_B16_1layer.k.yaml", "INViTE_B16_1layer_bigResize.k.yaml",
        "regionclip_resnet50_p32_512.k.yaml", "dinotxt.yaml",
        "denseclip_B16_seg_40patches.k.yaml",
    ):
        assert family in names, f"missing shipped config: {family}"

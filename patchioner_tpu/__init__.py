"""patchioner_tpu — a TPU-native zero-shot captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Ruggero1912/Patch-ioner ("One Patch to Caption Them All"): frozen vision
backbones emit patch tokens; any spatial query (image, bbox, trace, region
set, patch) reduces to one embedding by weighted patch aggregation; that
embedding is projected into CLIP-text space and decoded by a lightweight
text-only-trained GPT-2 decoder.

Compute path: jit-compiled functional JAX with Pallas TPU kernels for the hot
ops (support-memory projection, encoder attention). Scaling: `jax.sharding`
meshes (data-parallel eval/training, bank-sharded tensor parallelism).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy import: keeps `import patchioner_tpu.ops...` light and avoids
    # pulling the whole model stack (and jax tracing) at package import.
    if name == "Patchioner":
        from patchioner_tpu.models.patchioner import Patchioner

        return Patchioner
    raise AttributeError(name)

"""empanada_tpu: a TPU-native framework for panoptic segmentation of
organelles in 2D/3D electron-microscopy volumes.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of volume-em/empanada
(reference: /root/reference). Design stance:

- All dense compute (model forward, panoptic post-processing, median
  filtering, run-boundary extraction) runs on TPU under ``jax.jit`` with
  static shapes and bf16 matmul/conv policies.
- All sparse, pointer-chasing work (RLE algebra, connected components,
  instance matching/tracking, consensus graphs) runs on host, backed by a
  C++ core with vectorized NumPy fallbacks; only compact run buffers cross
  the host/device boundary.
- Multi-device scaling uses ``jax.sharding.Mesh`` + NamedSharding (data
  parallel training, slice-parallel 3D inference) with XLA collectives.
"""

__version__ = "0.1.0"

_SUBMODULES = (
    "core", "models", "ops", "inference", "parallel", "train", "data",
    "evaluation", "cli", "utils", "config", "losses", "metrics", "export",
)


def __getattr__(name):
    """Lazy submodule access: `import empanada_tpu as et; et.models...`"""
    if name in _SUBMODULES:
        import importlib

        return importlib.import_module(f"empanada_tpu.{name}")
    raise AttributeError(f"module 'empanada_tpu' has no attribute {name!r}")

"""edgegraph3d_tpu — TPU-native multi-view 3D edge reconstruction.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
abignoli/EdgeGraph3D (WACV 2018): RGB images + binary edge images +
OpenMVG SfM JSON -> edge-point-augmented OpenMVG JSON.

Design stance (vs. the reference's pointer-graph C++):
  * polyline graphs are fixed-shape padded struct-of-arrays,
  * matching is dense batched epipolar geometry (vmap / Pallas),
  * chain following is `lax.scan` with bounded step counts,
  * dedup is occupancy/interval rasters claimed with scatter-max,
  * refinement is batched 3x3 Gauss-Newton / Schur-complement BA,
  * scale-out is `shard_map` over a `jax.sharding.Mesh` (views/points
    sharded, `psum`/`all_gather` collectives over ICI).
"""

__version__ = "0.1.0"

from edgegraph3d_tpu.config import EdgeGraphConfig

__all__ = ["EdgeGraphConfig", "__version__"]

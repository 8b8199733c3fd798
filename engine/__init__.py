"""ray-geo: a Ray-Data-native spatial-join + tiling engine.

From-scratch reimplementation of the query capabilities of shapely/shapely
(predicates, STRtree bulk spatial joins, nearest-neighbor, GeoArrow ragged
columnar geometry) as vectorized numpy kernels over zero-copy Arrow batches
driven by ray.data.Dataset pipelines.  No GEOS anywhere: the ragged
coord+offset arrays (the reference's `shapely/_ragged_array.py` layout,
which is the Arrow list layout) are the primary representation and all
kernels operate on them directly.

Subpackages:
  engine.geo     pure-numpy geometry kernels (no ray dependency)
  engine.rayops  ray.data pipeline stages (encode/join/tile/checkpoint)
  engine.img     pure-python image codecs + synthetic data generator
"""

__version__ = "0.1.0"

"""instageo_e2e_geospatial_ml_spark — a PySpark-native spatial-join + tiling engine.

From-scratch reimplementation of the query/data-processing capabilities of
instadeepai/InstaGeo-E2E-Geospatial-ML's data pipeline (chip creation:
observation→tile assignment, STAC-style granule matching via point-in-polygon
+ as-of joins, raster chip extraction with masking and label rasterization),
re-expressed as idiomatic Spark DataFrame operators plus vectorized
pandas/Arrow UDF kernels.

Everything here derives from public knowledge: the Apache Spark / PySpark
API, the reference repo snapshot at /root/reference (behavior only), and
standard published geodesy (Transverse Mercator / MGRS lettering scheme).
"""

__version__ = "0.1.0"

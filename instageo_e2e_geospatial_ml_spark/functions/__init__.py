from .geo import (  # noqa: F401
    cell_of,
    cell_udf,
    knn_cell_udf,
    mgrs_udf,
    reproject_to_4326_udf,
)

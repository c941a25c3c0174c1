"""moaray — a from-scratch Ray-Data-native mosaic + spatial-join engine.

Re-expresses the capabilities of the reference engine (ubarsc/moamosaic,
read-only at /root/reference) as streaming ``ray.data.Dataset`` pipelines:
zero-copy Arrow batches, actor pools for stateful stages, one
groupby(tile_id) shuffle for tile assembly, committed-partition sinks with
lineage + metrics for resumability. See SURVEY.md for the full design.

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned
by the caller (bench.py, CLI, pytest fixture, or the evaluation driver).
"""

from .geo import BlockSpec, ImageMeta, OutputGrid, make_output_grid  # noqa: F401
from .pipelines.mosaic import (  # noqa: F401
    MosaicConfig,
    MosaicResult,
    do_mosaic,
    mosaic_array,
    overview_array,
    plan_assignments,
)
from .pipelines.update import extend_mosaic, update_mosaic  # noqa: F401
from .crs import ProjectionError  # noqa: F401
from .stages.reproject import WarpSpec  # noqa: F401
from .testgen import Layout  # noqa: F401

__version__ = "0.1.0"

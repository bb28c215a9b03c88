"""raygraph — a Ray-Data-native knowledge-graph construction engine.

Re-expresses the capabilities of ``arangodb/arangors-graph-exporter``
(reference at /root/reference, Rust) as Ray Data pipelines: parallel
shard-fan-out reading becomes ``ray.data.read_parquet``/``read_lance``
streaming execution; the export callbacks become ``iter_batches`` /
``map_batches``; and on top of the exporter's data model we build the full
KG-construction path (triple extraction → entity linking →
canonicalization → graph materialization) described in SURVEY.md.

No module in this package calls ``ray.init`` — the caller owns the session.
"""

from .config import CollectionInfo, DataLoadConfig, GraphBuildConfig
from .errors import GraphBuildError

__all__ = [
    "CollectionInfo",
    "DataLoadConfig",
    "GraphBuildConfig",
    "GraphBuildError",
]
__version__ = "0.1.0"

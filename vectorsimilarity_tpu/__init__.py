"""vectorsimilarity_tpu — a TPU-native vector similarity index & query engine.

A from-scratch JAX/XLA/Pallas re-design with the capability surface of the
RedisAI/VectorSimilarity C++ library: Flat (brute-force), HNSW, SVS-Vamana
and Tiered indexes; KNN / range / batched / hybrid queries; L2 / IP / Cosine;
fp32/fp64/bf16/fp16/int8/uint8 (+ SQ8 quantization); multi-value labels;
incremental insert/delete/update; async background ingest; timeouts;
serialization. Distances run as tiled MXU matmuls fused with device top-k;
graphs are flat SoA adjacency searched in jitted loops; scale-out shards the
store across a TPU mesh over ICI.
"""

from .types import (  # noqa: F401
    DEFAULT_BLOCK_SIZE,
    BFParams,
    HNSWParams,
    SVSParams,
    TieredHNSWParams,
    TieredIndexParams,
    TieredSVSParams,
    HNSWRuntimeParams,
    SVSRuntimeParams,
    QueryReplyOrder,
    VecSearchMode,
    VecSimAlgo,
    VecSimBool,
    VecSimIndexBasicInfo,
    VecSimIndexDebugInfo,
    VecSimIndexStatsInfo,
    VecSimMetric,
    VecSimOptionMode,
    VecSimParams,
    VecSimQueryParams,
    VecSimQueryReplyCode,
    VecSimResolveCode,
    VecSimSvsQuantBits,
    VecSimType,
    VecsimQueryType,
    VecSimWriteMode,
)
from .core.interface import VecSimIndexBase  # noqa: F401
from .core.results import QueryReply, filter_results_by_id, merge_replies  # noqa: F401
from .indexes.factory import (  # noqa: F401
    create_index,
    estimate_element_size,
    estimate_initial_size,
)
from .ops.normalize import normalize_blob as normalize  # noqa: F401
from .parallel.sharded_graph import ShardedHNSW, ShardedVamana  # noqa: F401
from .parallel.sharding import make_mesh  # noqa: F401
from .query_params import resolve_params  # noqa: F401

__version__ = "0.1.0"


def set_timeout_callback(cb) -> None:
    """``VecSim_SetTimeoutCallbackFunction`` parity."""
    VecSimIndexBase.set_timeout_callback(cb)


def set_log_callback(cb) -> None:
    """``VecSim_SetLogCallbackFunction`` parity."""
    VecSimIndexBase.set_log_callback(cb)


def set_write_mode(mode) -> None:
    """``VecSim_SetWriteMode`` parity."""
    VecSimIndexBase.set_write_mode(mode)

"""Operator registry: every (name -> (spark_fn, oracle_sql|None)) pair
the engine exposes. The driver contract (__spark_entry__.py) is a thin
view over this dict."""

from .cleaning import CLEANING_QUERIES
from .dedup import DEDUP_QUERIES
from .joins_advanced import ADVANCED_JOIN_QUERIES
from .multimodal import (
    AVI_QUERIES,
    JPEG_QUERIES,
    MJPEG_QUERIES,
    PROG_JPEG_QUERIES,
    MULTIMODAL_QUERIES,
    PNG_QUERIES,
    WAV_QUERIES,
)
from .relational import RELATIONAL_QUERIES
from .similarity import SIMILARITY_QUERIES
from .textops import TEXT_QUERIES
from .windows_batch import WINDOW_QUERIES

ALL_QUERIES = {
    **RELATIONAL_QUERIES,
    **TEXT_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **MULTIMODAL_QUERIES,
    **WINDOW_QUERIES,
    **ADVANCED_JOIN_QUERIES,
}

# NOT merged into ALL_QUERIES: the driver verifies the FIRST 50 registry
# entries and ALL_QUERIES + k01..k03 is exactly that frozen window.
# Round-5 additions register after k03 in __spark_entry__.queries()
# (positions 51+) and carry the same oracle discipline via the in-repo
# sweep (tests/test_oracle_parity.py extends its case list with them).
from .curation import CURATION_QUERIES, SPLIT_QUERIES, WEIGHTED_SAMPLE_QUERIES
from .joins_advanced import J05_SQL, j05_approx_percentile
from .pq import S04_SQL, S05_SQL, s04_ivfpq_search, s05_ivfpq_residual_search
from .quality import QUALITY_QUERIES
from .scd import SCD_QUERIES
from .sketch import (
    BLOOM_QUERIES,
    SKETCH_QUERIES,
    T09_SQL,
    T10_SQL,
    T11_SQL,
    t09_hll_mergeable,
    t10_theta_setops,
    t11_kll_quantiles,
)
from .graph import BASKET_QUERIES, GRAPH_QUERIES
from .relational import RFM_QUERIES
from .search import SEARCH_QUERIES
from .sequences import ATTRIBUTION_QUERIES, SEQUENCE_QUERIES
from .profiling import PROFILE_QUERIES
from .subword import SUBWORD_QUERIES, UNIGRAM_LOSS_QUERIES, UNIGRAM_QUERIES
from .temporal import RESAMPLE_QUERIES, ROLLING_QUERIES, TEMPORAL_QUERIES
from .ann_index import (
    ANN_FILTER_QUERIES,
    ANN_INDEX_QUERIES,
    ANN_SAMPLED_QUERIES,
)
from .versioning import (
    IN_SKIPPING_QUERIES,
    REBUCKET_QUERIES,
    SCHEMA_EVOLUTION_QUERIES,
    SKIPPING_QUERIES,
    TIME_TRAVEL_QUERIES,
    UPSERT_QUERIES,
    VERSIONING_QUERIES,
)

EXTRA_QUERIES = {
    **CLEANING_QUERIES,
    "j05_approx_percentile": (j05_approx_percentile, J05_SQL),
    **CURATION_QUERIES,
    "s04_ivfpq_search": (s04_ivfpq_search, S04_SQL),
    **SKETCH_QUERIES,
    "s05_ivfpq_residual_search": (s05_ivfpq_residual_search, S05_SQL),
    **TEMPORAL_QUERIES,
    "t09_hll_mergeable": (t09_hll_mergeable, T09_SQL),
    **SCD_QUERIES,
    **SPLIT_QUERIES,
    "t10_theta_setops": (t10_theta_setops, T10_SQL),
    "t11_kll_quantiles": (t11_kll_quantiles, T11_SQL),
    **QUALITY_QUERIES,
    **RESAMPLE_QUERIES,
    **GRAPH_QUERIES,
    **ROLLING_QUERIES,
    **SEQUENCE_QUERIES,
    **BASKET_QUERIES,
    **RFM_QUERIES,
    **SEARCH_QUERIES,
    **ATTRIBUTION_QUERIES,
    **WEIGHTED_SAMPLE_QUERIES,
    **VERSIONING_QUERIES,
    **BLOOM_QUERIES,
    **PROFILE_QUERIES,
    **SUBWORD_QUERIES,
    **TIME_TRAVEL_QUERIES,
    **PNG_QUERIES,
    **WAV_QUERIES,
    **AVI_QUERIES,
    **UPSERT_QUERIES,
    **JPEG_QUERIES,
    **REBUCKET_QUERIES,
    **MJPEG_QUERIES,
    **ANN_INDEX_QUERIES,
    **SKIPPING_QUERIES,
    **PROG_JPEG_QUERIES,
    **ANN_FILTER_QUERIES,
    **UNIGRAM_QUERIES,
    **IN_SKIPPING_QUERIES,
    **ANN_SAMPLED_QUERIES,
    **SCHEMA_EVOLUTION_QUERIES,
    **UNIGRAM_LOSS_QUERIES,
}

__all__ = [
    "ALL_QUERIES",
    "CLEANING_QUERIES",
    "CURATION_QUERIES",
    "EXTRA_QUERIES",
    "ADVANCED_JOIN_QUERIES",
    "DEDUP_QUERIES",
    "MULTIMODAL_QUERIES",
    "RELATIONAL_QUERIES",
    "SIMILARITY_QUERIES",
    "TEXT_QUERIES",
    "WINDOW_QUERIES",
]

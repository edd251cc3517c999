from .scheduler import MigrationScheduler, MigrationPolicy, IndexRebalancer, IndexCleaner
from .backup import BackupManager
from .health import HealthMonitor, HealthThresholds, HealthReport
from .search_integration import (
    parallel_search,
    ResultMerger,
    RelevanceScorer,
    QueryOptimizer,
    QueryExpander,
    CachedHybridIndex,
)

__all__ = [
    "MigrationScheduler",
    "MigrationPolicy",
    "IndexRebalancer",
    "IndexCleaner",
    "BackupManager",
    "HealthMonitor",
    "HealthThresholds",
    "HealthReport",
    "parallel_search",
    "ResultMerger",
    "RelevanceScorer",
    "QueryOptimizer",
    "QueryExpander",
    "CachedHybridIndex",
]

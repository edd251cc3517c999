from .session import (
    VectorDBSession,
    VectorDBConfig,
    SearchOptions,
    LoadOptions,
    SessionStats,
    DeleteResult,
    VacuumStats,
    VectorDBError,
)

__all__ = [
    "VectorDBSession",
    "VectorDBConfig",
    "SearchOptions",
    "LoadOptions",
    "SessionStats",
    "DeleteResult",
    "VacuumStats",
    "VectorDBError",
]

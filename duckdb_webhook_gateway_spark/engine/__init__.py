"""Engine core: the machinery inventory of SURVEY.md §2A re-expressed on Spark."""

from .results import shape_result
from .executors import execute_transform, apply_filter, payload_to_df
from .store import TableStore
from .catalog import WebhookCatalog, WebhookConfig, normalize_path, validate_transform
from .audit import AuditLog
from .reference_tables import ReferenceTableManager, sanitize_table_name
from .udfs import UdfManager, map_return_type
from .pipeline import Gateway, ProcessOutcome
from .query_gateway import run_adhoc_query, ReadOnlyViolation
from .replay import replay_events

__all__ = [
    "shape_result",
    "execute_transform",
    "apply_filter",
    "payload_to_df",
    "TableStore",
    "WebhookCatalog",
    "WebhookConfig",
    "normalize_path",
    "validate_transform",
    "AuditLog",
    "ReferenceTableManager",
    "sanitize_table_name",
    "UdfManager",
    "map_return_type",
    "Gateway",
    "ProcessOutcome",
    "run_adhoc_query",
    "replay_events",
    "ReadOnlyViolation",
]

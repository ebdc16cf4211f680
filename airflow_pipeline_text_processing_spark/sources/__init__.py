"""Sources and stateful tables (text directories, parquet tables, tracking)."""

from .text_dir import read_text_dir, documents_table
from .tracking import TrackingTable

__all__ = ["read_text_dir", "documents_table", "TrackingTable"]

"""Source readers: listing-based ranged binary scan, plus thin wrappers
over Spark's built-in parquet/csv/json/binaryFile sources."""

from .binary import list_binary_objects, read_binary  # noqa: F401
from .tables import load_table, register_star_schema  # noqa: F401

"""Corpus aggregator: importing this module registers every query family.

Driver contract (``__spark_entry__.py``) pulls ``get_queries()`` /
``get_oracles()`` from here.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .base import QUERIES, Query

# side-effect imports: each module registers its queries
from . import relational  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import scalar  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import udfs  # noqa: F401,E402
from . import training  # noqa: F401,E402


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark_fn for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle}


def headline_queries() -> dict[str, Query]:
    return {name: q for name, q in QUERIES.items() if q.headline}

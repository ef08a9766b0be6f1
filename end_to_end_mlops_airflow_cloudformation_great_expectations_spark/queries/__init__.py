"""Named query registry — the driver-checkable surface (SURVEY.md §2).

Importing this package imports every query module, which registers its
queries via :mod:`.registry`. ``/root/repo/__spark_entry__.py`` exposes
the registry to the driver.
"""

from __future__ import annotations

from . import (  # noqa: F401  (imports run the @query registrations)
    llm,
    reference,
    relational,
    streaming_batch,
    tpch_extra,
)
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]

"""Identifier safety — reserved words / odd characters in column and table
names (reference safe_column_name, /root/reference/pipelinewise/utils.py:8-24;
exercised by fixtures like ``order``, ``group``, ``table_with_space and
UPPERCase``).

Spark quoting uses backticks; parquet/delta field names additionally forbid
``,;{}()\\n\\t=`` and leading/trailing spaces, so persisted names are
sanitized with ``_`` while display names keep the original via metadata.
"""

from __future__ import annotations

import re

_SAFE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
_BAD_PARQUET = re.compile(r"[ ,;{}()\n\t=]")


def quote_identifier(name: str) -> str:
    """Backtick-quote a name for Spark SQL unless it is already safe."""
    if _SAFE.match(name):
        return name
    return "`" + name.replace("`", "``") + "`"


def safe_column_name(name: str) -> str:
    """Sanitized physical column name for parquet storage."""
    return _BAD_PARQUET.sub("_", name.strip())

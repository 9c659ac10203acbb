from .model import Column, ForeignKey, Index, Schema, SourceObjects, Table
from .identifiers import pg_ident, pg_literal, to_snake_case, truncate_identifier

__all__ = [
    "Column",
    "ForeignKey",
    "Index",
    "Schema",
    "SourceObjects",
    "Table",
    "pg_ident",
    "pg_literal",
    "to_snake_case",
    "truncate_identifier",
]

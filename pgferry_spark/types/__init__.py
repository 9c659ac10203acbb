from .config import TypeMappingConfig
from .mysql import map_mysql_default, map_mysql_type
from .sqlite import map_sqlite_default, map_sqlite_type
from .mssql import map_mssql_default, map_mssql_type
from .parquet import map_parquet_default, map_parquet_type

__all__ = [
    "map_parquet_type",
    "map_parquet_default",
    "TypeMappingConfig",
    "map_mysql_type",
    "map_mysql_default",
    "map_sqlite_type",
    "map_sqlite_default",
    "map_mssql_type",
    "map_mssql_default",
]

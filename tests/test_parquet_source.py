"""ParquetSource: parquet-lake -> pipeline migration (the fully distributed
source path — no driver-side rows, chunk predicates pushed to row-group
pruning)."""

import pytest
from pyspark.sql import functions as F

from pgferry_spark.backends import ParquetSource, SpoolTarget
from pgferry_spark.config import MigrationConfig
from pgferry_spark.pipeline import MigrationPipeline
from pgferry_spark.types import map_parquet_default, map_parquet_type
from pgferry_spark.types.config import TypeMappingConfig

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def source(spark):
    return ParquetSource(
        spark, SF,
        tables=("region", "orders", "embeddings"),
        pks={"region": "r_regionkey", "orders": "o_orderkey"},
    )


def test_introspect_types_and_pk(source):
    schema = source.introspect()
    tables = {t.source_name: t for t in schema.tables}
    assert tables["orders"].primary_key.columns == ["o_orderkey"]
    assert tables["region"].primary_key.is_primary
    cols = {c.source_name: c for c in tables["orders"].columns}
    assert cols["o_orderkey"].data_type == "bigint"
    assert cols["o_totalprice"].data_type == "double"
    # array<float> column maps to a PG array type
    emb = {c.source_name: c for c in tables["embeddings"].columns}
    pg, _ = map_parquet_type(emb["embedding"], TypeMappingConfig())
    assert pg == "real[]"


def test_chunk_predicate_read_equals_full(spark, source):
    schema = source.introspect()
    orders = next(t for t in schema.tables if t.source_name == "orders")
    full = source.read_table(spark, orders, None)
    n = full.count()
    mid = full.agg(F.expr("percentile_approx(o_orderkey, 0.5)")).first()[0]
    preds = [f"o_orderkey < {mid}", f"o_orderkey >= {mid}"]
    chunked = source.read_table(spark, orders, preds)
    assert chunked.count() == n


def test_pipeline_end_to_end(spark, source, tmp_path):
    cfg = MigrationConfig(
        source_type="parquet", source_dsn=SF,
        target_dsn="spool://x", target_schema="tpch",
    )
    target = SpoolTarget(spark, str(tmp_path / "out"))
    result = MigrationPipeline(
        spark, cfg, source, target, map_parquet_type, map_parquet_default,
    ).run()
    assert result.ok
    assert target.count("orders") == source.count(
        next(t for t in source.introspect().tables if t.source_name == "orders")
    )
    create = next(s for s in target.ddl if '"orders"' in s)
    assert '"o_orderkey" bigint' in create
    assert any("PRIMARY KEY" in s for s in target.ddl)

"""Golden-value transform tests (mirror of reference transform_test.go:103-797
and fixture F5 in FIXTURES.md)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from pgferry_spark.functions import transforms as X


def one(spark, expr, **cols):
    df = spark.createDataFrame([Row(**cols)])
    return df.select(expr.alias("out")).first()["out"]


class TestUUID:
    def test_binary16_plain(self, spark):
        payload = bytes(range(16))  # 000102...0f
        got = one(spark, X.binary16_to_uuid(F.col("b")), b=payload)
        assert got == "00010203-0405-0607-0809-0a0b0c0d0e0f"

    def test_binary16_swap(self, spark):
        # stored = time_hi ‖ time_mid ‖ time_low ‖ rest (UUID_TO_BIN(u,1))
        payload = bytes.fromhex("11112222333344445555666677778888")
        got = one(spark, X.binary16_to_uuid(F.col("b"), swap=True), b=payload)
        assert got == "33334444-2222-1111-5555-666677778888"

    def test_null_passthrough(self, spark):
        df = spark.createDataFrame([(None,)], "b: binary")
        assert df.select(X.binary16_to_uuid(F.col("b")).alias("o")).first()["o"] is None

    def test_validate_uuid_lowercases(self, spark):
        got = one(
            spark,
            X.validate_uuid_string(F.col("s")),
            s="ABCDEF01-2345-6789-ABCD-EF0123456789",
        )
        assert got == "abcdef01-2345-6789-abcd-ef0123456789"

    def test_validate_uuid_strict_raises(self, spark):
        df = spark.createDataFrame([("not-a-uuid",)], "s: string")
        with pytest.raises(Exception, match="invalid UUID"):
            df.select(X.validate_uuid_string(F.col("s")).alias("o")).collect()

    def test_validate_uuid_lenient_nulls(self, spark):
        got = one(spark, X.validate_uuid_string(F.col("s"), strict=False), s="garbage")
        assert got is None

    def test_mssql_endian_fix(self, spark):
        payload = bytes.fromhex("00112233445566778899AABBCCDDEEFF")
        got = one(spark, X.mssql_uniqueidentifier_to_uuid(F.col("b")), b=payload)
        assert got == "33221100-5544-7766-8899-aabbccddeeff"


class TestScalars:
    def test_strip_null_bytes(self, spark):
        assert one(spark, X.strip_null_bytes(F.col("s")), s="a\x00b\x00") == "ab"

    def test_tinyint1_strict(self, spark):
        assert one(spark, X.tinyint1_to_boolean(F.col("v")), v=0) is False
        assert one(spark, X.tinyint1_to_boolean(F.col("v")), v=1) is True
        df = spark.createDataFrame([(2,)], "v: int")
        with pytest.raises(Exception, match="tinyint"):
            df.select(X.tinyint1_to_boolean(F.col("v")).alias("o")).collect()

    def test_tinyint1_loose(self, spark):
        assert one(spark, X.tinyint1_to_boolean(F.col("v"), strict=False), v=2) is True

    def test_set_to_array(self, spark):
        assert one(spark, X.set_to_array(F.col("s")), s="a,c") == ["a", "c"]
        assert one(spark, X.set_to_array(F.col("s")), s="") == []
        assert one(spark, X.set_to_array(F.col("s")), s="a\x00,b") == ["a", "b"]

    def test_bit_to_bitstring(self, spark):
        # 0b10101 = 21 -> one byte 0x15, width 5
        assert one(spark, X.bit_to_bitstring(F.col("b"), 5), b=bytes([0x15])) == "10101"
        # width narrower than the stored byte keeps the RIGHTMOST bits
        assert one(spark, X.bit_to_bitstring(F.col("b"), 3), b=bytes([0xFF])) == "111"
        # multi-byte, width 12: 0x0ABC -> 101010111100
        assert one(spark, X.bit_to_bitstring(F.col("b"), 12), b=bytes([0x0A, 0xBC])) == "101010111100"

    def test_year_to_int(self, spark):
        assert one(spark, X.year_to_int(F.col("y")), y="2006") == 2006

    def test_time_to_interval_literal(self, spark):
        assert (
            one(spark, X.mysql_time_to_interval_literal(F.col("t")), t="838:59:59")
            == "838 hours 59 mins 59 secs"
        )
        assert (
            one(spark, X.mysql_time_to_interval_literal(F.col("t")), t="-12:30:00")
            == "-12 hours -30 mins -0 secs"
        )
        assert one(spark, X.mysql_time_to_interval_literal(F.col("t")), t="bogus") is None

    def test_zero_date(self, spark):
        assert one(spark, X.zero_date_to_null(F.col("d")), d="0000-00-00 00:00:00") is None
        assert one(spark, X.zero_date_to_null(F.col("d")), d="2020-01-02") == "2020-01-02"
        df = spark.createDataFrame([("0000-00-00",)], "d: string")
        with pytest.raises(Exception, match="zero date"):
            df.select(X.zero_date_to_null(F.col("d"), strict=True).alias("o")).collect()

    def test_money_to_decimal(self, spark):
        from decimal import Decimal

        got = one(spark, X.mssql_money_to_decimal(F.col("m")), m=12.3456)
        assert got == Decimal("12.3456")


class TestSpatial:
    # MySQL internal format: 4-byte LE SRID ‖ WKB
    POINT_WKB = bytes.fromhex("0101000000000000000000f03f0000000000000040")  # POINT(1 2) LE

    def test_srid_zero_strips_prefix(self, spark):
        payload = bytes(4) + self.POINT_WKB
        got = one(spark, X.mysql_spatial_to_ewkb(F.col("g")), g=payload)
        assert got == self.POINT_WKB

    def test_srid_4326_splices_ewkb(self, spark):
        srid = (4326).to_bytes(4, "little")  # e6100000
        payload = srid + self.POINT_WKB
        got = one(spark, X.mysql_spatial_to_ewkb(F.col("g")), g=payload)
        # EWKB: order ‖ (type | 0x20000000) LE ‖ SRID LE ‖ coords
        expected = bytes.fromhex("0101000020e6100000000000000000f03f0000000000000040")
        assert got == expected

    def test_srid_big_endian_geometry(self, spark):
        # big-endian WKB: order=00, type word 00000001, coords big-endian
        be_wkb = bytes.fromhex("00000000013ff00000000000004000000000000000")
        payload = (4326).to_bytes(4, "little") + be_wkb
        got = one(spark, X.mysql_spatial_to_ewkb(F.col("g")), g=payload)
        # EWKB: flag 0x20 in the FIRST type byte; SRID spliced BIG-endian
        expected = bytes.fromhex("0020000001000010e63ff00000000000004000000000000000")
        assert got == expected

    def test_bad_byte_order_errors(self, spark):
        payload = bytes(4) + b"\x07" + self.POINT_WKB[1:]
        df = spark.createDataFrame([(payload,)], "g: binary")
        with pytest.raises(Exception, match="byte-order"):
            df.select(X.mysql_spatial_to_ewkb(F.col("g")).alias("o")).collect()

    def test_null_passthrough(self, spark):
        df = spark.createDataFrame([(None,)], "g: binary")
        assert df.select(X.mysql_spatial_to_ewkb(F.col("g")).alias("o")).first()["o"] is None

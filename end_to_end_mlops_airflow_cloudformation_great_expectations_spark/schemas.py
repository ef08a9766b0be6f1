"""Explicit StructTypes for every canonical table (SURVEY.md §1.4).

Schemas are declared, not inferred, on production paths — the reference's
"schema is a function of data" failure mode (SURVEY.md §1.3: its one-hot
column *set* depends on observed zone values) is exactly what explicit
schemas prevent. Transcribed from FIXTURES.md §A (driver-verified
against /root/testdata/sf0.001/*.parquet).
"""

from __future__ import annotations

from pyspark.sql import types as T

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType(), False),
        T.StructField("r_name", T.StringType(), False),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType(), False),
        T.StructField("n_name", T.StringType(), False),
        T.StructField("n_regionkey", T.IntegerType(), False),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType(), False),
        T.StructField("c_name", T.StringType(), False),
        T.StructField("c_nationkey", T.IntegerType(), False),
        T.StructField("c_acctbal", T.DoubleType(), False),
        T.StructField("c_mktsegment", T.StringType(), False),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType(), False),
        T.StructField("s_name", T.StringType(), False),
        T.StructField("s_nationkey", T.IntegerType(), False),
        T.StructField("s_acctbal", T.DoubleType(), False),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType(), False),
        T.StructField("p_name", T.StringType(), False),
        T.StructField("p_brand", T.StringType(), False),
        T.StructField("p_type", T.StringType(), False),
        T.StructField("p_size", T.IntegerType(), False),
        T.StructField("p_retailprice", T.DoubleType(), False),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_custkey", T.LongType(), False),
        T.StructField("o_orderstatus", T.StringType(), False),
        T.StructField("o_totalprice", T.DoubleType(), False),
        T.StructField("o_orderdate", T.TimestampType(), False),
        T.StructField("o_orderpriority", T.StringType(), False),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType(), False),
        T.StructField("l_partkey", T.LongType(), False),
        T.StructField("l_suppkey", T.LongType(), False),
        T.StructField("l_linenumber", T.IntegerType(), False),
        T.StructField("l_quantity", T.DoubleType(), False),
        T.StructField("l_extendedprice", T.DoubleType(), False),
        T.StructField("l_discount", T.DoubleType(), False),
        T.StructField("l_tax", T.DoubleType(), False),
        T.StructField("l_returnflag", T.StringType(), False),
        T.StructField("l_linestatus", T.StringType(), False),
        T.StructField("l_shipdate", T.TimestampType(), False),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("n_chars", T.LongType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), False),
    ]
)

#: Reference-derived trips natural form (FIXTURES.md §B1) — the
#: normalized input the reference's pandas pipeline consumed before
#: one-hot encoding (SURVEY.md §3.3 reconstruction).
TRIPS_RAW = T.StructType(
    [
        T.StructField("trip_id", T.LongType(), False),
        T.StructField("vendor", T.StringType(), False),
        T.StructField("pickup_ts", T.TimestampType(), False),
        T.StructField("pickup_zone", T.StringType(), True),
        T.StructField("dropoff_zone", T.StringType(), True),
        T.StructField("pickup_lat", T.DoubleType(), False),
        T.StructField("pickup_lon", T.DoubleType(), False),
        T.StructField("dropoff_lat", T.DoubleType(), False),
        T.StructField("dropoff_lon", T.DoubleType(), False),
        T.StructField("passenger_count", T.LongType(), False),
        T.StructField("trip_duration", T.DoubleType(), False),
    ]
)

TABLES: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

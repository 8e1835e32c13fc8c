"""Explicit StructType schemas for the ten fixture tables.

The reference data model is implicit (each MapReduce job parses delimited text
ad hoc — SURVEY.md §1.1); here every table has a declared, checked schema.
Column types mirror the driver-generated Parquet (FIXTURES.md, measured from
/root/testdata). At 100 TB these act as the contract for the scan layer:
reads request exactly these columns/types, enabling Parquet column pruning
and vectorized decoding.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        _f("r_regionkey", T.IntegerType()),
        _f("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        _f("n_nationkey", T.IntegerType()),
        _f("n_name", T.StringType()),
        _f("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        _f("c_custkey", T.LongType()),
        _f("c_name", T.StringType()),
        _f("c_nationkey", T.IntegerType()),
        _f("c_acctbal", T.DoubleType()),
        _f("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        _f("s_suppkey", T.LongType()),
        _f("s_name", T.StringType()),
        _f("s_nationkey", T.IntegerType()),
        _f("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        _f("p_partkey", T.LongType()),
        _f("p_name", T.StringType()),
        _f("p_brand", T.StringType()),
        _f("p_type", T.StringType()),
        _f("p_size", T.IntegerType()),
        _f("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        _f("o_orderkey", T.LongType()),
        _f("o_custkey", T.LongType()),
        _f("o_orderstatus", T.StringType()),
        _f("o_totalprice", T.DoubleType()),
        _f("o_orderdate", T.TimestampType()),
        _f("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        _f("l_orderkey", T.LongType()),
        _f("l_partkey", T.LongType()),
        _f("l_suppkey", T.LongType()),
        _f("l_linenumber", T.IntegerType()),
        _f("l_quantity", T.DoubleType()),
        _f("l_extendedprice", T.DoubleType()),
        _f("l_discount", T.DoubleType()),
        _f("l_tax", T.DoubleType()),
        _f("l_returnflag", T.StringType()),
        _f("l_linestatus", T.StringType()),
        _f("l_shipdate", T.TimestampType()),
    ]),
    "events": T.StructType([
        _f("event_id", T.LongType()),
        _f("ts", T.TimestampType()),
        _f("user_id", T.LongType()),
        _f("event_type", T.StringType()),
        _f("value", T.DoubleType()),
        _f("props", T.StringType()),
    ]),
    "documents": T.StructType([
        _f("doc_id", T.LongType()),
        _f("text", T.StringType()),
        _f("lang", T.StringType()),
        _f("source", T.StringType()),
        _f("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        _f("vec_id", T.LongType()),
        _f("embedding", T.ArrayType(T.FloatType())),
        _f("label", T.IntegerType()),
    ]),
}

EMBEDDING_DIM = 64

"""Dtype names for the expression layer.

The reference's dtype lattice (vendor/ibis/expr/datatypes/core.py) maps
onto Spark SQL types per SURVEY §1.3; types Spark lacks are widened:
unsigned ints -> next signed size (uint64 -> decimal(20,0)), float16 ->
float, time -> string. We accept both ibis-style names ("int64",
"float32", "array<int64>") and Spark DDL ("bigint", "array<bigint>")
and canonicalize to Spark DDL strings, which `StructType.fromDDL`
understands natively.
"""

from __future__ import annotations

import re

from pyspark.sql.types import DataType, StructField, StructType

_SIMPLE = {
    "null": "void",
    "bool": "boolean",
    "boolean": "boolean",
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "tinyint": "tinyint",
    "smallint": "smallint",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "long": "bigint",
    # unsigned: widen to the next signed size (SURVEY §1.3)
    "uint8": "smallint",
    "uint16": "int",
    "uint32": "bigint",
    "uint64": "decimal(20,0)",
    "float16": "float",
    "float32": "float",
    "float64": "double",
    "float": "float",
    "double": "double",
    "string": "string",
    "str": "string",
    "largestring": "string",
    "binary": "binary",
    "bytes": "binary",
    "date": "date",
    "time": "string",  # no Spark TimeType
    "timestamp": "timestamp_ntz",
    "json": "string",
    "uuid": "string",
    "macaddr": "string",
    "inet": "string",
}

_TZ_TS = re.compile(r"^timestamp\((['\"]?)UTC\1.*\)$|^timestamp\s*\(.*tz.*\)$", re.I)


def to_spark_ddl(name: str) -> str:
    """Canonicalize a dtype name (ibis-style or Spark DDL) to Spark DDL."""
    s = name.strip()
    low = s.lower()
    if low in _SIMPLE:
        return _SIMPLE[low]
    if low.startswith("timestamp("):  # timestamp('UTC') etc -> zoned
        return "timestamp" if _TZ_TS.match(low) else "timestamp_ntz"
    m = re.match(r"^(array|list)<(.+)>$", low)
    if m:
        return f"array<{to_spark_ddl(m.group(2))}>"
    m = re.match(r"^map<([^,]+),(.+)>$", low)
    if m:
        return f"map<{to_spark_ddl(m.group(1))},{to_spark_ddl(m.group(2))}>"
    m = re.match(r"^struct<(.+)>$", low)
    if m:
        parts, depth, cur = [], 0, ""
        for ch in m.group(1):
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            if ch == "," and depth == 0:
                parts.append(cur)
                cur = ""
            else:
                cur += ch
        parts.append(cur)
        fields = []
        for p in parts:
            fname, _, ftype = p.partition(":")
            fields.append(f"{fname.strip()}:{to_spark_ddl(ftype)}")
        return "struct<" + ",".join(fields) + ">"
    # decimal(p,s), interval, char/varchar, and any valid DDL pass through
    return s


def schema_to_struct(schema) -> StructType:
    """{name: dtype-string} mapping / DDL string / StructType -> StructType."""
    if isinstance(schema, StructType):
        return schema
    if isinstance(schema, str):
        return StructType.fromDDL(schema)
    fields = []
    for name, dtype in dict(schema).items():
        if isinstance(dtype, DataType):
            fields.append(StructField(name, dtype))
        else:
            fields.append(
                StructField(name, StructType.fromDDL(f"x {to_spark_ddl(dtype)}")[0].dataType)
            )
    return StructType(fields)

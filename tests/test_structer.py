"""Structer: struct<->feature-matrix packing (reference:
expr/ml/structer.py — from_names_typ:394, from_n_typ_prefix:401,
convert_array:383, maybe_unpack:288)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from xorq_spark.ml import Structer


def test_constructors():
    st = Structer.from_names_typ(["a", "b"], "float64")
    assert st.names == ("a", "b") and st.typ == "double"
    st2 = Structer.from_n_typ_prefix(3)
    assert st2.names == ("transformed_0", "transformed_1", "transformed_2")
    assert st2.dtype.startswith("struct<")


def test_matrix_roundtrip():
    st = Structer.from_names_typ(["x", "y"])
    m = Structer.to_matrix(pd.Series([1, 2]), pd.Series([3.5, 4.5]))
    assert m.shape == (2, 2) and m.dtype == float
    back = st.from_matrix(m)
    assert list(back.columns) == ["x", "y"]
    assert back["y"].tolist() == [3.5, 4.5]
    with pytest.raises(ValueError):
        st.from_matrix(np.zeros((2, 3)))


def test_to_matrix_dataframe_input():
    m = Structer.to_matrix(pd.DataFrame({"a": [1, 2], "b": [3, 4]}))
    assert m.shape == (2, 2)


def test_pack_unpack_spark(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    st = Structer.from_names_typ(["o_totalprice", "o_orderkey"])
    packed = st.pack(df, "features")
    assert dict(packed.dtypes)["features"].startswith("struct<")
    unpacked = st.unpack(packed.select("o_custkey", "features"), "features")
    assert set(unpacked.columns) == {"o_custkey", "o_totalprice", "o_orderkey"}
    row = unpacked.first()
    assert row["o_totalprice"] is not None


def test_infer_width():
    class FakePCA:
        n_components_ = 2

    st = Structer.infer(FakePCA(), ["a", "b", "c"])
    assert len(st) == 2


def test_fit_transform_through_structer(spark, sf_dir):
    """deferred_fit_transform now emits ONE struct UDF then unpacks —
    result columns and values must match the pre-Structer shape."""
    import xorq_spark as xo
    from xorq_spark.ml import SimpleStandardScaler, deferred_fit_transform

    e = xo.deferred_read_parquet(f"{sf_dir}/orders.parquet").limit(200)
    fitted, transformed = deferred_fit_transform(
        e, ["o_totalprice"], SimpleStandardScaler
    )
    df = transformed.to_spark(spark)
    assert "o_totalprice_t" in df.columns
    pdf = df.select("o_totalprice_t").toPandas()
    assert abs(pdf["o_totalprice_t"].mean()) < 1e-6  # standardized

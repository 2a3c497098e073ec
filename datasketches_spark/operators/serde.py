"""Sketch (de)serialization as Spark columns: KMV sketch columns
(entries + theta) ⇄ SerVer-3 ordered-compact binary images
(/root/reference/Theta/PreambleUtil.cs layout via kernels.kmv), so
checkpointed signature tables interoperate with any DataSketches-family
reader. Arrow-batched pandas UDFs — serialization is pure NumPy byte
packing."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from datasketches_spark.config import DEFAULT_SEED
from datasketches_spark.kernels import kmv


def kmv_serialize_udf(seed: int = DEFAULT_SEED):
    @pandas_udf(T.BinaryType())
    def ser(entries: pd.Series, theta: pd.Series) -> pd.Series:
        out = []
        for e, t in zip(entries, theta):
            arr = np.asarray(e, dtype=np.int64).view(np.uint64)
            sk = kmv.ThetaSketch(int(t), arr,
                                 empty=(arr.size == 0 and int(t) == kmv.MAX_THETA_LONG),
                                 seed=seed)
            out.append(kmv.serialize_compact(sk))
        return pd.Series(out)

    return ser


def kmv_deserialize_udf(seed: int = DEFAULT_SEED):
    schema = T.StructType([
        T.StructField("kmv_entries", T.ArrayType(T.LongType(), False), False),
        T.StructField("kmv_theta", T.LongType(), False),
        T.StructField("estimate", T.DoubleType(), False),
    ])

    @pandas_udf(schema)
    def deser(img: pd.Series) -> pd.DataFrame:
        rows = []
        for b in img:
            sk = kmv.deserialize_compact(bytes(b), seed=seed)
            rows.append((sk.entries.view(np.int64), np.int64(sk.theta), sk.estimate()))
        return pd.DataFrame(rows, columns=["kmv_entries", "kmv_theta", "estimate"])

    return deser


def with_serialized_kmv(sig: DataFrame, seed: int = DEFAULT_SEED,
                        out_col: str = "kmv_image") -> DataFrame:
    return sig.withColumn(out_col, kmv_serialize_udf(seed)(F.col("kmv_entries"), F.col("kmv_theta")))

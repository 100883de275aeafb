"""Vector (embedding) column builders — array<double> arithmetic via
higher-order functions, fully JVM-side.

At test scale (500×64-d) these run brute-force; at 100 TB the same
expressions run inside codegen over billions of rows, and the LSH/IVF
operators in operators/similarity.py bound the candidate set first.

Embeddings arrive as array<float>; cast to array<double> BEFORE any
arithmetic so products are computed in double precision — this is what
makes results reproducible against the oracle (and across clusters).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))

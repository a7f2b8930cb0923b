"""Scalar / higher-order function library shared across operators.

The reference's only scalar surface is the user index-emission functions
(`library/GraphDB/Model.hs:36-39`) plus value hashing
(`library/GraphDB/Macros/Templates.hs:92-96`); our engine generalizes that
into a reusable expression library. Everything here is built-in-expression
only (JVM-side, whole-stage-codegen-eligible) — no Python UDFs — and every
hash is md5-based so the DuckDB oracle reproduces results bit-for-bit.
"""

from graph_db_spark.functions.text import char_ngrams, shingle_array, ws_tokens
from graph_db_spark.functions.vector import dot, hyperplane_signature, norm, with_norm

__all__ = [
    "char_ngrams",
    "dot",
    "hyperplane_signature",
    "norm",
    "shingle_array",
    "with_norm",
    "ws_tokens",
]
